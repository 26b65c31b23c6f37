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
- `documents.text` is re-synthesized per copy with a VOCABULARY
  SYNTHESIZER (r11, VERDICT r10 Next #1): the driver's source corpus
  has only ~31 distinct tokens, so every sparse/BM25/hybrid claim was
  exercised with ≤31 active buckets of 4096 and near-zero bucket
  collisions. Each word occurrence now maps to a Zipf-ish VARIANT of
  its base word — variant index v = floor(u^-2) (pmf ∝ v^-1.5: head
  variants shared across documents like a real term distribution, a
  long tail of rare types) with u drawn deterministically from
  md5(word, position, md5(original doc text), copy). Content-keyed:
  EXACT duplicate documents map identically (dedup structure
  preserved); copy-keyed: copies of one document diverge (no
  artificial cross-copy near-dups); the variant→token map excludes the
  copy so the Zipf HEAD is shared across copies (realistic df
  distribution, sub-linear vocabulary growth per Heaps' law). Measured
  vocabulary: ~10^5 types at sf1, ~4·10^5 at sf10 — posting lists,
  per-query shard fan-out and 4096-bucket collisions are finally real.
  Copy 0 keeps the original text. Without per-copy divergence, every
  doc would have N-1 exact duplicates and the dedup benchmarks would
  measure an artificial O(N²) duplicate explosion instead of N× more
  data.
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


def vocab_enriched_text(text, copy, variant_cap: int = 1_000_000):
    """The deterministic vocabulary synthesizer (module docstring):
    rewrite each word occurrence of ``text`` to a Zipf-ish variant of
    itself, keyed by (word, position, md5-of-original-text, copy).

    - u ∈ (0, 1] from the first 8 hex chars of the occurrence hash;
      v = min(floor(u^-2), cap) gives P(v=k) ∝ ~k^-1.5 — variant 1
      covers ~29% of a word's occurrences, variant 2 ~11%, a long
      rare tail. The variant→token map hashes (word, v) WITHOUT the
      copy, so head variants are shared corpus-wide and vocabulary
      grows sub-linearly with data (Heaps-like), while the per-copy u
      draw makes word SEQUENCES diverge across copies (no cross-copy
      shingle overlap).
    - The token alphabet is LETTERS ONLY (md5 hex digits translated to
      g-p): [a-z]+ tokenizers must see one token per pseudo-word, not
      a-f fragments (the round-3 lesson — digit splits collapsed the
      vocabulary and produced artificial quadratic minhash buckets).
    - Token length = max(len(word), 4): same-length preserves char
      statistics for longer words; the floor of 4 keeps 1-2 char
      words from truncating the variant space to 16-256 types.

    Pure Column expression — codegen'd, no UDF, no RNG, reproducible.
    Exact duplicate documents map identically (the doc key is the
    md5 of the ORIGINAL text), so exact-dedup structure survives
    enrichment."""
    doc_key = F.md5(text)
    return F.array_join(
        F.transform(
            F.split(text, " "),
            lambda w, i: F.substring(
                F.translate(
                    F.md5(
                        F.concat_ws(
                            "@",
                            w,
                            F.least(
                                F.floor(
                                    F.pow(
                                        (
                                            F.conv(
                                                F.substring(
                                                    F.md5(
                                                        F.concat_ws(
                                                            "#",
                                                            w,
                                                            i.cast("string"),
                                                            doc_key,
                                                            copy.cast(
                                                                "string"
                                                            ),
                                                        )
                                                    ),
                                                    1,
                                                    8,
                                                ),
                                                16,
                                                10,
                                            ).cast("double")
                                            + F.lit(1.0)
                                        )
                                        / F.lit(4294967296.0),
                                        F.lit(-2.0),
                                    )
                                ).cast("long"),
                                F.lit(int(variant_cap)),
                            ).cast("string"),
                        )
                    ),
                    "0123456789",
                    "ghijklmnop",
                ),
                1,
                F.greatest(F.length(w), F.lit(4)),
            ),
        ),
        " ",
    )


def replicate_fact(spark: SparkSession, name: str, n: int) -> DataFrame:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    id_cols = FACT_IDS[name]
    spans = df.select(
        *[F.max(c).alias(f"max_{c}") for c in id_cols],
        *[F.min(c).alias(f"min_{c}") for c in id_cols],
    ).first()
    copies = spark.range(n).withColumnRenamed("id", "__copy")
    # Repartition BEFORE the enrichment expressions: the source parquet
    # is 1-2 partitions, and the downstream per-occurrence md5 chains
    # otherwise execute at that parallelism (measured: the x1000
    # documents stage ran ~1-2 cores for 20+ min). Round-robin here is
    # value-safe — every synthesized column is a deterministic function
    # of (row, __copy), never of partitioning. The final writer
    # repartition then sizes the output files.
    parts = max(32, spark.sparkContext.defaultParallelism)
    out = df.crossJoin(copies).repartition(parts)
    for c in id_cols:
        stride = spans[f"max_{c}"] - spans[f"min_{c}"] + 1
        out = out.withColumn(c, F.col(c) + F.col("__copy") * F.lit(stride))
    if name == "documents":
        out = out.withColumn(
            "text",
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                vocab_enriched_text(F.col("text"), F.col("__copy"))
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
    # Optional 3rd arg: --tables=documents,embeddings — replicate only
    # the listed FACT tables (dims are always copied; they are KB-sized).
    # Motivation (r12, VERDICT r11 Next #4): the sf100 serving-path
    # evidence needs documents+embeddings at ×1000 but not the 600M-row
    # lineitem; a partial replica generates in minutes instead of hours.
    # The replica dir then holds a PARTIAL sf-N — callers must say so in
    # any committed table.
    facts = list(FACT_IDS)
    if len(sys.argv) > 3 and sys.argv[3].startswith("--tables="):
        wanted = [t for t in sys.argv[3].split("=", 1)[1].split(",") if t]
        unknown = [t for t in wanted if t not in FACT_IDS]
        if unknown:
            raise SystemExit(f"unknown fact tables: {unknown}")
        facts = wanted
    os.makedirs(out_dir, exist_ok=True)
    from vector_io_spark.session import get_spark

    spark = get_spark(app_name=f"make_replica_x{n}")
    for name in DIM_TABLES:
        spark.read.parquet(f"{SRC}/{name}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
    for name in facts:
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
    for name in DIM_TABLES + facts:
        cnt = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {cnt} rows")


if __name__ == "__main__":
    main()
