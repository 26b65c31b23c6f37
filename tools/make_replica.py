#!/usr/bin/env python
"""Self-replicate the sf0.1 testdata by an integer factor N to produce
sf≈1 (N=10) / sf≈10 (N=100) datasets for the at-scale bench, without
touching /root/testdata (read-only).

Usage: python tools/make_replica.py N OUT_DIR

Replication scheme (designed so every pipeline's work actually scales
instead of degenerating):

- Fact tables (lineitem, orders, events, documents, embeddings) are
  replicated N× with id columns offset by copy × stride (stride = the
  table's id span), so distinct-id counts, id ranges and join fan-outs
  scale linearly — the shape a real sf-N dataset has.
- Dimension tables (region, nation, customer, supplier, part) are copied
  as-is: scaling facts against fixed dims is how TPC-H-ish data grows,
  and it keeps star joins broadcastable, which is the 100 TB-realistic
  layout.
- `documents.text` is re-tokenized per copy (each word is replaced by an
  md5-derived pseudo-word of the same length, keyed by the copy index;
  copy 0 keeps the original text). Without this, every doc would have
  N-1 exact duplicates and the dedup benchmarks would measure an
  artificial O(N²) duplicate explosion instead of N× more data.
- `embeddings.embedding` gets a deterministic per-copy perturbation for
  the same reason (otherwise each vector has N-1 cosine-1.0 twins).

Everything is deterministic — no RNG — so replicas are reproducible.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

SRC = os.environ.get("SPARK_GRAFT_SRC_SF_DIR", "/root/testdata/sf0.1")

DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]
# fact table -> id columns to offset by copy * stride (stride from the
# FIRST listed column's span so orders/lineitem share the orderkey stride)
FACT_IDS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate_fact(spark: SparkSession, name: str, n: int) -> DataFrame:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    id_cols = FACT_IDS[name]
    spans = df.select(
        *[F.max(c).alias(f"max_{c}") for c in id_cols],
        *[F.min(c).alias(f"min_{c}") for c in id_cols],
    ).first()
    copies = spark.range(n).withColumnRenamed("id", "__copy")
    out = df.crossJoin(copies)
    for c in id_cols:
        stride = spans[f"max_{c}"] - spans[f"min_{c}"] + 1
        out = out.withColumn(c, F.col(c) + F.col("__copy") * F.lit(stride))
    if name == "documents":
        # per-copy re-tokenization: same-length md5 pseudo-words keep the
        # token/char statistics, destroy cross-copy shingle overlap.
        # The pseudo-word alphabet must be LETTERS ONLY: raw md5 hex
        # contains digits, and the engine's [a-z]+ tokenizers would split
        # each pseudo-word at every digit into short a-f fragments — a
        # collapsed shared vocabulary across all copies that produced
        # artificial quadratic minhash-bucket collisions in the first
        # round-3 sf1 bench (9.4M candidate pairs, max bucket 2004).
        out = out.withColumn(
            "text",
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.substring(
                            F.translate(
                                F.md5(
                                    F.concat(w, F.col("__copy").cast("string"))
                                ),
                                "0123456789",
                                "ghijklmnop",
                            ),
                            1,
                            F.length(w),
                        ),
                    ),
                    " ",
                )
            ),
        )
    if name == "embeddings":
        # Per-copy perturbation must DECORRELATE copies, not just nudge
        # them — and it must vary PER ROW: a per-(copy, dim)-only offset
        # adds the same vector to every row of a copy, which (at unit
        # embedding norms) makes whole copies nearly parallel and
        # collapses each copy into one quadratic LSH mega-bucket
        # (measured: max bucket 2102, 40M candidate pairs). The phase
        # term mixes vec_id so every row gets its own offset direction;
        # amplitude 0.1/dim on unit-norm vectors puts sibling cosine at
        # ~0.87 — far from near-dup thresholds — while copy 0 stays
        # pristine.
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x
                    + F.sin(
                        (j + 1) * (F.col("__copy") * 7 + 3)
                        + F.col("vec_id") * 0.618
                    )
                    * F.lit(0.1)
                    * F.when(F.col("__copy") == 0, 0.0).otherwise(1.0)
                ).cast("float"),
            ),
        )
    return out.drop("__copy")


def main() -> None:
    n = int(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name=f"make_replica_x{n}")
    for name in DIM_TABLES:
        spark.read.parquet(f"{SRC}/{name}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
    for name in FACT_IDS:
        # realistic layout: a real sf-N fact table is many files/row
        # groups; without this the replica collapses to one file with
        # ONE row group, and every scan downstream "splits" into empty
        # partitions (single-core pandas-UDF stages, measured 8× at
        # sf10 — see dedup._rebalance_for_cpu, which now also defends
        # against such tables at runtime)
        parts = max(32, spark.sparkContext.defaultParallelism)
        replicate_fact(spark, name, n).repartition(parts).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
    for name in DIM_TABLES + list(FACT_IDS):
        cnt = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {cnt} rows")


if __name__ == "__main__":
    main()
