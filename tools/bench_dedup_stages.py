#!/usr/bin/env python
"""Per-stage wall timings for the dedup_quality_survivors chain
(VERDICT r10 Next #4: the sf10 median drifted 36.0 s (r6) → 45.0 s
(r10) while siblings got faster — isolate which stage moved).

Stages, with materialization barriers between them so each wall number
covers exactly one stage's jobs:

  1. corpus     — documents scan + truncated/doubled variant injection
                  (persist + count)
  2. lsh_pairs  — minhash signatures (pandas-UDF) + banding self-join
                  (persist + count; exact banding, no bucket cap — the
                  query's oracle carve-out)
  3. components — pointer-jumping connected components over the pairs
                  (count)
  4. survivors  — membership join + per-component argmax window (noop
                  write of the final frame)

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 python tools/bench_dedup_stages.py [N] [algorithm]
Prints one JSON line with per-stage medians over N reps (default 3).
``algorithm`` is forwarded to connected_components (pointer_jump |
two_phase) — the r12 CC A/B (VERDICT r11 Next #3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf10")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    algorithm = sys.argv[2] if len(sys.argv) > 2 else "pointer_jump"
    from vector_io_spark.operators.dedup import (
        connected_components,
        minhash_lsh_dup_pairs,
    )
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="bench_dedup_stages")
    # warm: footers + UDF worker pool (the bench.py protocol)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 32).select(warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    samples: dict[str, list[float]] = {
        "corpus": [], "lsh_pairs": [], "components": [], "survivors": [],
        "total": [],
    }
    rows: dict[str, int] = {}
    for _ in range(n_runs):
        t_all = time.perf_counter()

        t0 = time.perf_counter()
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        mutated = d.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.expr(
                    "substring(text, 1, greatest((length(text) * 4) div 5, 8))"
                ),
            )
            .otherwise(F.concat("text", F.lit(" "), "text"))
            .alias("text"),
        )
        corpus = d.unionByName(mutated).persist()
        rows["corpus"] = corpus.count()
        samples["corpus"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        pairs = minhash_lsh_dup_pairs(
            corpus, "doc_id", "text", num_hashes=16, shingle_k=3,
            bands=8, threshold=0.5, max_bucket_size=None,
        ).select("id_a", "id_b").persist()
        rows["lsh_pairs"] = pairs.count()
        samples["lsh_pairs"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        comp = connected_components(pairs, algorithm=algorithm).persist()
        rows["components"] = comp.count()
        samples["components"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        memb = comp.join(
            corpus.select(
                F.col("doc_id").alias("id"),
                F.length("text").alias("n_chars"),
            ),
            "id",
        )
        w = Window.partitionBy("component").orderBy(
            F.col("n_chars").desc(), F.col("id").asc()
        )
        out = (
            memb.select(
                "component", "id", "n_chars",
                F.row_number().over(w).alias("rn"),
                F.count("*").over(
                    Window.partitionBy("component")
                ).alias("nm"),
            )
            .where(F.col("rn") == 1)
            .select("component", "nm", "id", "n_chars")
        )
        out.write.format("noop").mode("overwrite").save()
        samples["survivors"].append(time.perf_counter() - t0)

        samples["total"].append(time.perf_counter() - t_all)
        comp.unpersist()
        pairs.unpersist()
        corpus.unpersist()

    med = {k: round(statistics.median(v), 2) for k, v in samples.items()}
    spread = {
        k: [round(min(v), 2), round(max(v), 2)] for k, v in samples.items()
    }
    print(json.dumps({
        "sf_dir": SF_DIR,
        "algorithm": algorithm,
        "n": n_runs,
        "stage_medians_sec": med,
        "spread": spread,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
