#!/usr/bin/env python
"""Pruned-vs-exact late-interaction (maxsim) wall-clock + recall record.

Round 9: VERDICT r8 required the "stage-2 cost is independent of corpus
size" claim to be re-measured honestly after the plan fix (candidate
doc_id now rides the probe out via return_cols — no full-cells re-read —
and the bounded candidate doc-id list pushes into the stage-2 doc-token
scan as a literal In predicate). This tool makes that measurement a
reproducible per-round record instead of a one-off:

- builds the doc-token IVF index ONCE (untimed, the amortized cost),
- times the EXACT maxsim batch (scans every doc token per batch) and
  the PRUNED path at two settings, n reps each, reports medians,
- reports recall@k of each pruned setting against the exact truth.

Usage: python tools/bench_maxsim.py [SF_DIR] [K] [N_REPS]
Defaults: /tmp/sf1 (clustered replica — regenerate with
tools/make_replica.py, never hand-edit), k=10, n=3.

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

    from vector_io_spark.operators.multivector import (
        maxsim_topk,
        maxsim_topk_pruned,
        write_token_index,
    )
    from vector_io_spark.queries import _t
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="bench_maxsim")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb.count()  # warm footers/page cache

    def tok(df, id_alias):
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("qpos"),
            "embedding",
        ).select(
            id_alias, "qpos",
            F.expr("slice(embedding, qpos*16+1, 16)").alias("vec"),
        )

    dt = tok(emb, "doc_id").select("doc_id", "vec")
    qt = tok(emb.where(F.col("vec_id") < 32), "query_id")
    n_docs = emb.count()

    base = tempfile.mkdtemp(prefix="bench_maxsim_")
    idx = f"{base}/idx"
    t0 = time.perf_counter()
    write_token_index(dt, idx, num_cells=64, max_train_rows=50_000)
    build_s = round(time.perf_counter() - t0, 2)

    def doc_sets(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["doc_id"])
        return out

    def recall(approx, exact):
        num = sum(len(approx.get(q, set()) & w) for q, w in exact.items())
        den = sum(len(w) for w in exact.values())
        return round(num / den, 4) if den else 0.0

    def timed(fn):
        runs = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        return round(statistics.median(runs), 3), runs

    exact_s, exact_runs = timed(lambda: maxsim_topk(dt, qt, k=k, metric="dot"))
    truth = doc_sets(maxsim_topk(dt, qt, k=k, metric="dot"))

    settings = ((64, 8), (128, 16))
    pruned: dict = {}
    for c, np_ in settings:
        med, runs = timed(lambda: maxsim_topk_pruned(
            spark, idx, dt, qt, k=k, metric="dot",
            candidates_per_token=c, nprobe=np_,
        ))
        rec = recall(doc_sets(maxsim_topk_pruned(
            spark, idx, dt, qt, k=k, metric="dot",
            candidates_per_token=c, nprobe=np_,
        )), truth)
        pruned[f"c={c},nprobe={np_}"] = {
            "seconds_median": med, "runs": runs, "recall_at_k": rec,
        }
    shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({
        "sf_dir": sf_dir, "docs": n_docs, "k": k, "n": n_reps,
        "index_build_s": build_s,
        "exact_s_median": exact_s, "exact_runs": exact_runs,
        "pruned": pruned,
        "loadavg": list(os.getloadavg()),
    }))


if __name__ == "__main__":
    main()
