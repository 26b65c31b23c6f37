"""Aggregate operators (reference SURVEY.md §2.5).

All distributive/algebraic — partial aggregation happens map-side, so at
100 TB the shuffle carries one partial per (key, partition), not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_rows(df: DataFrame) -> int:
    """COUNT(*) (count_rows.py:43-49 sums parquet footer counts; Spark's
    parquet count also answers from footers when no filter is present)."""
    return df.count()


def distinct_id_count(df: DataFrame, id_col: str = "id", approx: bool = False) -> int:
    """COUNT DISTINCT ids (get_id_list.py:12-35 uses a driver-side set
    union — O(n) driver memory; here it's a distributed aggregate, and
    ``approx=True`` switches to HyperLogLog for the 100 TB case where the
    exact answer costs a full shuffle of ids)."""
    agg = (
        F.approx_count_distinct(id_col) if approx else F.countDistinct(id_col)
    ).alias("n")
    return df.agg(agg).collect()[0]["n"]


def vector_range_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Element-wise MIN/MAX over all vectors (update_range,
    pinecone_export.py:609-638 folds np.minimum/np.maximum one vector at a
    time on the driver).

    ``posexplode`` -> groupBy(dim) with map-side partial min/max: the
    shuffle carries ``dims × partitions`` partials regardless of row count
    — scale-proof. Returns (dim, dim_min, dim_max), dim 1-based.
    """
    return (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy((F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(
            F.round(F.min("val"), 6).alias("dim_min"),
            F.round(F.max("val"), 6).alias("dim_max"),
        )
    )
