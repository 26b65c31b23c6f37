#!/usr/bin/env python
"""Interleaved same-session A/B for the r12 pq_train / pagerank kernels.

The sandbox hypervisor steals CPU in irregular bursts (hundreds of
steal-seconds per 10-min window on a bad day), so sequential
before/after bench runs are incomparable. This script times the OLD and
NEW formulations alternately in ONE session (old, new, old, new, ...):
ambient steal hits both arms equally in expectation and the median
ratio is meaningful even when absolute numbers are inflated.

The old pq formulation is reconstructed from the in-module helpers
(_seed_centroids/_assign/_update — kept as the SQL oracle's documented
shape); the old pagerank round is reconstructed inline (the left-join
zero-fill the r12 union replaced).

Prints one JSON line: medians, per-rep samples, steal bracket.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_steal() -> float:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import math

    from pyspark.sql import functions as F

    from vector_io_spark.operators.graph import SCALE, pagerank
    from vector_io_spark.operators.pq_exact import (
        _assign,
        _seed_centroids,
        _update,
        pq_train,
        quantized_subvectors,
    )
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="ab_pq_pagerank_r12")
    sc = spark.sparkContext
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb.count()  # footer/page-cache warm
    # pandas-UDF worker pool warm
    from pyspark.sql.functions import pandas_udf

    warm = pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 32).select(warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    def pq_old(m: int, k: int, iters: int, dim: int):
        sub_dim = dim // m
        sub = quantized_subvectors(emb, "vec_id", "embedding", sub_dim).persist()
        cent = _seed_centroids(sub, "vec_id", k)
        for _ in range(iters):
            cent = _update(sub, _assign(sub, cent, "vec_id"), cent, "vec_id")
        cent = cent.localCheckpoint(eager=True)
        codes = _assign(sub, cent, "vec_id").withColumnRenamed("c", "code")
        codes = codes.localCheckpoint(eager=True)
        sub.unpersist()
        return codes

    def pq_new(m: int, k: int, iters: int, dim: int):
        codes, _ = pq_train(
            emb, "vec_id", "embedding", num_subspaces=m, codebook_size=k,
            iters=iters, dim=dim,
        )
        return codes

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o.count(); li.count()

    def pr_edges():
        return o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )

    def pagerank_old(iters: int = 5, damping: float = 0.85):
        # pre-r12 loop body: shares agg + nodes LEFT JOIN zero-fill
        e = pr_edges().distinct().persist()
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()
        deg = e.groupBy("src").agg(F.count("*").cast("long").alias("d"))
        ej = (
            e.join(deg, "src")
            .select("src", "dst", "d")
            .repartition(F.col("src"))
            .persist()
        )
        ej.count()
        r0q = int(math.floor(SCALE / n + 0.5))
        baseq = int(math.floor((1.0 - damping) * SCALE / n + 0.5))
        ranks = nodes.select("node", F.lit(r0q).cast("long").alias("rq"))
        for _ in range(iters):
            shares = (
                ej.join(ranks, ej["src"] == ranks["node"])
                .select(
                    "dst",
                    F.floor(F.col("rq") / F.col("d")).cast("long").alias("sh"),
                )
                .groupBy("dst")
                .agg(F.sum("sh").alias("s"))
            )
            ranks = nodes.join(
                shares, nodes["node"] == shares["dst"], "left"
            ).select(
                "node",
                (
                    F.lit(baseq)
                    + F.round(
                        F.lit(damping) * F.coalesce(F.col("s"), F.lit(0))
                    ).cast("long")
                ).alias("rq"),
            )
            ranks = ranks.localCheckpoint(eager=True)
        out = ranks.select(
            "node", "rq",
            F.round(F.col("rq") / F.lit(float(SCALE)), 9).alias("rank"),
        )
        out = out.localCheckpoint(eager=True)
        e.unpersist(); ej.unpersist(); nodes.unpersist()
        return out

    def pagerank_new(iters: int = 5):
        return pagerank(pr_edges(), iters=iters)

    arms = {
        "pq8x8_old": lambda: pq_old(8, 8, 2, 64),
        "pq8x8_new": lambda: pq_new(8, 8, 2, 64),
        "ivf1x8_old": lambda: pq_old(1, 8, 2, 64),
        "ivf1x8_new": lambda: pq_new(1, 8, 2, 64),
        "pagerank_old": pagerank_old,
        "pagerank_new": pagerank_new,
    }
    samples: dict[str, list[float]] = {a: [] for a in arms}
    s0 = read_steal()
    for _ in range(reps):
        for name, fn in arms.items():
            sc.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    s1 = read_steal()

    import statistics

    med = {a: round(statistics.median(v), 3) for a, v in samples.items()}
    print(json.dumps({
        "reps": reps,
        "steal_s": round(s1 - s0, 1),
        "medians": med,
        "ratios": {
            base: round(med[f"{base}_old"] / med[f"{base}_new"], 2)
            for base in ("pq8x8", "ivf1x8", "pagerank")
        },
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
