"""Parquet dataset utilities (reference scripts: count_rows.py,
get_id_list.py, consolidate_parquet.py — SURVEY.md §2.5/§2.7)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def get_parquet_files(path: str) -> list[str]:
    """Recursive parquet discovery; accepts a single file or a directory
    (get_parquet_files, util.py:289-354). Driver-side listing only —
    Spark's own FileIndex handles the distributed case; this exists for
    catalog bookkeeping (file_structure)."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def count_rows_dataset(spark: SparkSession, path: str) -> int:
    """Total rows under a dataset dir (count_rows.py:43-49 sums parquet
    footer counts; Spark's unfiltered parquet count() is footer-only too)."""
    return spark.read.parquet(*get_parquet_files(path)).count()


def get_id_list(
    spark: SparkSession, path: str, id_column: str = "id"
) -> DataFrame:
    """Sorted distinct ids (get_id_list.py:12-37). Distributed distinct —
    the reference unions python sets on the driver."""
    return (
        spark.read.parquet(*get_parquet_files(path))
        .select(id_column)
        .distinct()
        .orderBy(id_column)
    )


def missing_ids(
    spark: SparkSession, path: str, id_column: str = "id"
) -> DataFrame:
    """Gaps in an integer id space: range(min, max) minus present ids
    (get_id_list.py:40-46). The range frame is generated distributedly
    (spark.range), the anti-join shuffles ids only."""
    df = spark.read.parquet(*get_parquet_files(path)).select(
        F.col(id_column).cast("long").alias("id")
    )
    lo_hi = df.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect()[0]
    if lo_hi["lo"] is None:
        return spark.range(0).select(F.col("id"))
    universe = spark.range(lo_hi["lo"], lo_hi["hi"] + 1).select("id")
    return universe.join(df.distinct(), "id", "left_anti").orderBy("id")
