#!/usr/bin/env python
"""Measure the sparse-catalog batch probe against N single-query
probes — the scale argument for sparse_index_probe_topk_batch
(VERDICT r9 Next #2): N queries should cost ~one probe job, not N.

Usage: python tools/bench_sparse_batch.py [SF_DIR] [N_QUERIES]
Prints one JSON line with medians (n=3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N_REPS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from vector_io_spark.operators.ranking import bm25_sparse_vectors
    from vector_io_spark.operators.sparse_index import (
        sparse_index_probe_topk,
        sparse_index_probe_topk_batch,
        write_sparse_index,
    )
    from vector_io_spark.queries import _scratch_dir, _t
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name="bench_sparse_batch")
    path = _scratch_dir("vios_sparse_batch_bench", SF_DIR)
    if not os.path.exists(os.path.join(path, "meta")):
        d = _t(spark, SF_DIR, "documents").select("doc_id", "text")
        docs = bm25_sparse_vectors(d, "doc_id", "text", vocab_buckets=4096)
        write_sparse_index(docs, path, num_shards=64)

    # N deterministic 3-term queries over populated buckets (the
    # synthetic corpus has a ~31-word vocabulary, so cycle through the
    # populated buckets with coprime strides instead of assuming 3N
    # distinct ones exist)
    pop = [
        r["bucket"]
        for r in spark.read.parquet(f"{path}/postings")
        .groupBy("bucket").count()
        .orderBy(F.col("count").desc(), F.col("bucket").asc())
        .limit(N_QUERIES * 3)
        .collect()
    ]
    m = len(pop)
    batch = [
        (
            f"q{i}",
            [
                (b, 1.0)
                for b in sorted(
                    {pop[i % m], pop[(i * 7 + 1) % m], pop[(i * 13 + 2) % m]}
                )
            ],
        )
        for i in range(N_QUERIES)
    ]

    def run_batch() -> float:
        t0 = time.perf_counter()
        sparse_index_probe_topk_batch(spark, path, batch, k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    def run_loop() -> float:
        t0 = time.perf_counter()
        for qid, entries in batch:
            sparse_index_probe_topk(
                spark, path, entries, k=10, query_id=qid
            ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both paths once
    run_batch(); run_loop()
    b = [round(run_batch(), 3) for _ in range(N_REPS)]
    s = [round(run_loop(), 3) for _ in range(N_REPS)]
    print(json.dumps({
        "metric": "sparse_batch_vs_loop",
        "sf_dir": SF_DIR,
        "n_queries": N_QUERIES,
        "batch_median_s": statistics.median(b),
        "loop_median_s": statistics.median(s),
        "speedup": round(statistics.median(s) / statistics.median(b), 2),
        "batch_runs": b,
        "loop_runs": s,
        "loadavg": list(os.getloadavg()),
    }))


if __name__ == "__main__":
    main()
