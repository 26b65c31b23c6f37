#!/usr/bin/env python
"""At-scale wall-clock + recall record for the round-9 vector-query
family: range/threshold search (corpus scan vs persisted-IVF probe),
grouped top-k, recommend-by-examples, and the IVF-SQ8 catalog probe vs
raw-IVF probe vs exact brute force.

The questions this answers per round, on the clustered replicas:
- does range_search stay scan-bound (it has no shuffle) as the corpus
  grows, and where does the indexed range probe start winning?
- what recall does the SQ8 probe pay vs the raw-IVF probe at the same
  nprobe (quantization error on top of cell pruning)?
- does grouped_topk's double-WindowGroupLimit shape stay within a
  small factor of plain top-k?

Usage: python tools/bench_vectorquery.py [SF_DIR] [K] [N_REPS]
Defaults: /tmp/sf1 (regenerate with tools/make_replica.py, never
hand-edit), k=10, n=3.

Prints ONE JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from vector_io_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_probe_range,
        ivf_index_probe_topk,
        write_ivf_index,
    )
    from vector_io_spark.operators.sq8 import (
        sq8_index_probe_topk,
        write_sq8_index,
    )
    from vector_io_spark.operators.vectorquery import (
        grouped_topk,
        range_search,
        recommend_topk,
    )
    from vector_io_spark.queries import _t
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="bench_vectorquery")
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    n_vecs = emb.count()  # warm footers/page cache
    q = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    num_cells = 64
    base = tempfile.mkdtemp(prefix="bench_vq_")
    t0 = time.perf_counter()
    write_ivf_index(
        emb, f"{base}/ivf", num_cells=num_cells, metadata_cols=("label",)
    )
    ivf_build_s = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    write_sq8_index(
        emb, f"{base}/sq8", num_cells=num_cells, metadata_cols=("label",)
    )
    sq8_build_s = round(time.perf_counter() - t0, 2)

    def timed(fn):
        runs = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        return {"seconds_median": round(statistics.median(runs), 3),
                "runs": runs}

    def id_sets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    def recall(approx, exact):
        num = sum(len(approx.get(qq, set()) & w) for qq, w in exact.items())
        den = sum(len(w) for w in exact.values())
        return round(num / den, 4) if den else 0.0

    out: dict = {
        "sf_dir": sf_dir, "vectors": n_vecs, "k": k, "n": n_reps,
        "num_cells": num_cells,
        "ivf_build_s": ivf_build_s, "sq8_build_s": sq8_build_s,
    }

    out["exact_topk"] = timed(lambda: brute_force_topk(emb, q, k=k))
    truth = id_sets(brute_force_topk(emb, q, k=k))

    for nprobe in (4, 8):
        ivf = timed(lambda: ivf_index_probe_topk(
            spark, f"{base}/ivf", q, k=k, nprobe=nprobe))
        ivf["recall_at_k"] = recall(id_sets(ivf_index_probe_topk(
            spark, f"{base}/ivf", q, k=k, nprobe=nprobe)), truth)
        out[f"ivf_probe_np{nprobe}"] = ivf
        sq8 = timed(lambda: sq8_index_probe_topk(
            spark, f"{base}/sq8", q, k=k, nprobe=nprobe))
        sq8["recall_at_k"] = recall(id_sets(sq8_index_probe_topk(
            spark, f"{base}/sq8", q, k=k, nprobe=nprobe)), truth)
        out[f"sq8_probe_np{nprobe}"] = sq8
    # wall of the SAME threshold served by scan vs by index probe
    out["range_scan"] = timed(
        lambda: range_search(emb, q, min_score=0.2))
    out["range_scan_hits"] = range_search(emb, q, min_score=0.2).count()
    out["range_probe_np8"] = timed(lambda: ivf_index_probe_range(
        spark, f"{base}/ivf", q, min_score=0.2, nprobe=8))
    out["grouped_topk"] = timed(lambda: grouped_topk(
        emb, q, k=k, group_col="label", group_size=2))
    out["recommend"] = timed(lambda: recommend_topk(
        emb, positive_ids=[0, 1, 2], negative_ids=[3, 4], k=k))

    shutil.rmtree(base, ignore_errors=True)
    out["loadavg"] = list(os.getloadavg())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
