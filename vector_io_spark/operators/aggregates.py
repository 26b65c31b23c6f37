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


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Column profiling for numeric columns: one row per column with
    (n_rows, n_nonnull, n_distinct, min/max, mean, exact median) — the
    data-quality summary a pipeline runs before/after every transform.

    One aggregation pass over the table; every stat except the exact
    median and exact distinct-count is distributive (map-side partials).
    ``approx=True`` is the 100 TB path: ``approx_count_distinct`` (HLL)
    and ``approx_percentile`` (t-digest) are plain fixed-size aggregate
    buffers at ~1e-2 relative error — exact mode is for oracle parity
    and small/medium tables (the multi-column exact-distinct rewrite
    inserts an Expand that multiplies pre-aggregation row flow by the
    number of distinct columns, and exact percentile buffers per-column
    value multisets). Both modes are a single scan of the table.

    Output long-form: (column, n_rows, n_nonnull, n_distinct, min_val,
    max_val, mean_val, p50).
    """
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        p50 = (
            F.percentile_approx(c, 0.5)
            if approx
            else F.percentile(F.col(c), F.lit(0.5))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__mx_{c}"),
            F.round(F.avg(F.col(c)), 4).alias(f"__avg_{c}"),
            F.round(p50, 4).alias(f"__p50_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_val"),
                F.col(f"__mx_{c}").alias("max_val"),
                F.col(f"__avg_{c}").alias("mean_val"),
                F.col(f"__p50_{c}").alias("p50"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("s")).select("s.*")


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
