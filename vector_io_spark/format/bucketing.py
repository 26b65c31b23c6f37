"""Bucketed tables — pre-shuffled storage for co-located joins.

The 100 TB join problem: two huge tables joined repeatedly on the same
key (vectors ⟗ metadata by id, lineitem ⟗ orders by orderkey) pay a full
shuffle of both sides on EVERY query. Bucketing pays that shuffle ONCE at
write time: rows are hash-partitioned into a fixed number of buckets on
the join key and each bucket is sorted, so a join between two tables
bucketed the same way (same key, same bucket count) runs as a sort-merge
join with ZERO exchange — Spark's scan reports the bucketing as an
existing hash distribution and Catalyst drops both shuffles.

This is the Spark-native replacement for the reference's "export shards
are already partitioned by id" invariant (its readers exploit file-level
id ranges; a bucketed table is the same idea made visible to the
optimizer).

Requires a metastore-backed table (``saveAsTable``); plain
``.parquet(path)`` writes cannot record bucketing metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 16,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) parquet table.

    ``num_buckets`` must match between tables that will join — pick it
    from the big side's target partition size (e.g. total_bytes / 256 MB)
    and reuse it for every table in the join family.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the scan carries the bucket distribution —
    joins/aggregations on the bucket key skip their exchange)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on ``key`` — shuffle-free by
    construction (verified by the plan gate in test_plan_quality)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
