#!/usr/bin/env python
"""Interleaved two-decade serving-path bench (steal-robust ratios).

Usage: python tools/bench_decades.py <dirA> <dirB> <query> [query ...]

Times each query against BOTH replica dirs back-to-back inside ONE
Spark session, rep by rep, so hypervisor CPU steal (which inflated this
round's solo sweeps up to 5x and is invisible to loadavg) hits both
decades equally in expectation: the per-query dirB/dirA RATIO stays
meaningful even when absolute seconds are inflated. This is the same
interleaved-A/B protocol as tools/ab_pq_pagerank_r12.py, applied across
scale decades instead of kernels.

Methodology matches bench.py: noop sink per rep, per-process memoized
catalog builds primed OUTSIDE the timed loop (here: per dir — bench.py's
_extra_queries memoization is per process, which would alias the two
dirs' catalogs), page-cache/footer warm for both dirs, median of
$SPARK_GRAFT_BENCH_N (default 3) reps, /proc/stat steal bracketed per
rep pair. Prints one JSON line:
{"dirs": [...], "queries": {name: {"a": med, "b": med, "ratio": b/a,
 "samples_a": [...], "samples_b": [...]}}, "steal_per_rep": [...]}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_steal() -> float:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def _probe_registry():
    """Per-dir variants of bench.py's memoized *_probe entries."""
    from vector_io_spark.queries import _scratch_dir, _t

    built: dict[tuple[str, str], str] = {}

    def pq_exact_catalog_probe(spark, sf_dir):
        from vector_io_spark.operators.pq_exact import (
            pq_adc_topk_from_index,
            write_pq_exact_index,
        )

        key = ("pq_exact", sf_dir)
        path = built.get(key)
        if path is None:
            path = _scratch_dir("vios_dec_pq_probe", sf_dir)
            write_pq_exact_index(_t(spark, sf_dir, "embeddings"), path)
            built[key] = path
        return pq_adc_topk_from_index(spark, path, _queries16(spark, sf_dir))

    def ivfpq_index_probe(spark, sf_dir):
        from vector_io_spark.operators.similarity import (
            ivfpq_index_probe_topk,
            write_ivfpq_index,
        )

        key = ("ivfpq", sf_dir)
        path = built.get(key)
        if path is None:
            path = _scratch_dir("vios_dec_ivfpq_probe", sf_dir)
            write_ivfpq_index(
                _t(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
                path,
                num_cells=16, num_subspaces=16, codebook_size=64,
                max_train_rows=20_000,
            )
            built[key] = path
        return ivfpq_index_probe_topk(
            spark, path, _queries16(spark, sf_dir), k=10, nprobe=4
        )

    def _queries16(spark, sf_dir):
        from pyspark.sql import functions as F

        emb = _t(spark, sf_dir, "embeddings")
        return emb.where(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

    return {
        "pq_exact_catalog_probe": pq_exact_catalog_probe,
        "ivfpq_index_probe": ivfpq_index_probe,
    }


def main() -> None:
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from vector_io_spark.queries import QUERIES
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="vector_io_spark_bench_decades")
    registry = dict(QUERIES)
    registry.update(_probe_registry())
    unknown = [q for q in names if q not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # footer + page-cache warm for both dirs; UDF worker-pool warm
    for d in (dir_a, dir_b):
        for t in ("documents", "embeddings"):
            p = f"{d}/{t}.parquet"
            if os.path.exists(p):
                spark.read.parquet(p).count()
    warm_udf = pandas_udf(lambda s: s, "long")
    spark.range(0, 10_000, 1, 32).select(warm_udf(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    # prime memoized catalog builds outside the timed loop, per dir
    for name in names:
        if name.endswith("_probe"):
            for d in (dir_a, dir_b):
                registry[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    samples: dict[str, dict[str, list[float]]] = {
        q: {"a": [], "b": []} for q in names
    }
    steal_per_rep: list[float] = []
    for rep in range(n_runs):
        s0 = read_steal()
        for name in names:
            fn = registry[name]
            for tag, d in (("a", dir_a), ("b", dir_b)):
                spark.sparkContext.setJobDescription(
                    f"decades:{name}:{tag}:rep{rep}"
                )
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                samples[name][tag].append(
                    round(time.perf_counter() - t0, 3)
                )
        steal_per_rep.append(round(read_steal() - s0, 1))

    out = {"dirs": [dir_a, dir_b], "n": n_runs,
           "steal_per_rep": steal_per_rep, "queries": {}}
    for q in names:
        a = statistics.median(samples[q]["a"])
        b = statistics.median(samples[q]["b"])
        out["queries"][q] = {
            "a": round(a, 3), "b": round(b, 3),
            "ratio": round(b / a, 2) if a else None,
            "samples_a": samples[q]["a"], "samples_b": samples[q]["b"],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
