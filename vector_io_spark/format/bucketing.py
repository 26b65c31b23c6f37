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


def zorder_value(
    cols: list,
    mins: list,
    maxs: list,
    bits: int = 16,
):
    """Z-order (Morton) key: normalize each column into ``[0, 2^bits)``
    using caller-supplied domain bounds, then bit-interleave — points
    close in EVERY dimension get close z-values, so range-partitioning +
    sorting files by z clusters multi-dimensional locality into file/
    row-group min–max ranges that parquet scans can prune on for
    predicates over ANY of the interleaved columns (a single-column sort
    only prunes its own column).

    Pure Catalyst bit arithmetic (statically unrolled shifts/ORs —
    whole-stage-codegen'd, no UDF), deterministic and engine-portable;
    the bounds come from stats the caller already has (profile_columns).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        # the top interleaved bit would land in the long's sign bit:
        # negative z-values sort before all positive ones and break
        # range-partition locality (e.g. 4 cols at the default bits=16)
        raise ValueError(
            f"bits * len(cols) = {bits * n} > 63 overflows the signed-long "
            f"z-value; lower bits to <= {63 // n} for {n} columns"
        )
    scaled = []
    top = (1 << bits) - 1
    for c, lo, hi in zip(cols, mins, maxs):
        c = F.col(c) if isinstance(c, str) else c
        span = float(hi - lo) if hi > lo else 1.0
        q = F.floor(
            (c.cast("double") - float(lo)) / span * top + 0.5
        ).cast("long")
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), q)))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    mins: list,
    maxs: list,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write parquet laid out by z-order: range-partition on the Morton
    key (balanced files via sampled range bounds) and sort within each
    file, so both interleaved columns have tight per-file min–max stats.
    Readers need no special support — predicate pushdown on either
    column skips whole files/row groups via standard parquet statistics."""
    z = zorder_value(cols, mins, maxs, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
