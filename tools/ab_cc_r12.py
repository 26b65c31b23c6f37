#!/usr/bin/env python
"""Interleaved A/B of the distributed CC kernels above the driver cap
(VERDICT r11 Next #3).

The r12 driver fast path answers every graph up to
$SPARK_GRAFT_CC_COLLECT_MAX (2M pairs) without a distributed round, so
the pointer_jump vs two_phase question only matters ABOVE the cap. This
script builds a synthetic above-cap pair graph of the realistic
near-dup shape — millions of tiny components (re-upload pairs) plus one
long chain (overlapping shard exports, the diameter stressor) — with
pure-JVM `spark.range` arithmetic (no Python rows), then times the two
kernels interleaved (steal hits both arms equally; see
OPTIMIZATION_r12.md "Measurement strategy").

Usage: python tools/ab_cc_r12.py [reps] [n_small_components]
Prints one JSON line: medians, samples, steal bracket, label equality.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_steal() -> float:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    chain = 300

    from pyspark.sql import functions as F

    from vector_io_spark.operators.dedup import connected_components
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="ab_cc_r12")
    sc = spark.sparkContext

    # 2 pairs per small component (star of 3 nodes): (3k, 3k+1), (3k, 3k+2)
    base = spark.range(0, n_small)
    small = base.select(
        (F.col("id") * 3).alias("id_a"), (F.col("id") * 3 + 1).alias("id_b")
    ).unionByName(
        base.select(
            (F.col("id") * 3).alias("id_a"),
            (F.col("id") * 3 + 2).alias("id_b"),
        )
    )
    off = 3 * n_small
    chain_df = spark.range(0, chain).select(
        (F.col("id") + off).alias("id_a"), (F.col("id") + off + 1).alias("id_b")
    )
    pairs = small.unionByName(chain_df).persist()
    n_pairs = pairs.count()

    arms = ("pointer_jump", "two_phase")
    samples = {a: [] for a in arms}
    s0 = read_steal()
    for _ in range(reps):
        for algo in arms:
            sc.setJobDescription(f"cc:{algo}")
            t0 = time.perf_counter()
            connected_components(
                pairs, algorithm=algo, collect_max=0
            ).write.format("noop").mode("overwrite").save()
            samples[algo].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    s1 = read_steal()

    # label equality on the full graph (checked once, untimed)
    a = connected_components(pairs, algorithm="pointer_jump", collect_max=0)
    b = connected_components(pairs, algorithm="two_phase", collect_max=0)
    diff = (
        a.withColumnRenamed("component", "ca")
        .join(b.withColumnRenamed("component", "cb"), "id", "full")
        .where(
            F.col("ca").isNull()
            | F.col("cb").isNull()
            | (F.col("ca") != F.col("cb"))
        )
        .count()
    )

    print(json.dumps({
        "n_pairs": n_pairs,
        "chain_len": chain,
        "reps": reps,
        "steal_s": round(s1 - s0, 1),
        "medians": {a_: round(statistics.median(v), 3)
                    for a_, v in samples.items()},
        "samples": samples,
        "label_mismatches": diff,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
