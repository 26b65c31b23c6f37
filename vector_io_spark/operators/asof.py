"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left-side event, attach the most recent right-side event at or
before it (per key). The classic implementations are a sort-merge zipper
(pandas merge_asof) or a union + last-non-null window; we use the window
form because it is pure DataFrame API, needs exactly ONE shuffle on the
key (both sides together), and the per-key sort is what any as-of
algorithm pays anyway.

Scale note: the union approach keeps the big side un-replicated (no
per-row range probing); skewed keys fall under AQE skew handling. For
huge right sides with tiny lookup windows, a range-bucketed equi-join
(bucket by time window + equi-join on (key, bucket)) is the alternative —
same library, different trade-off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str,
    strictly_before: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each ``left`` row, the latest ``right`` row with the same
    ``key`` and (ts, tiebreak) strictly before (or at, when
    ``strictly_before=False``) the left row's (ts, tiebreak).

    Returns all of ``left``'s columns plus ``<col><suffix>`` for each of
    ``value_cols``. Deterministic under timestamp ties via ``tiebreak``.
    """
    lhs = left.withColumn("__side", F.lit(1))
    rhs_cols = [key, ts, tiebreak] + [c for c in value_cols if c not in (key, ts, tiebreak)]
    rhs = right.select(*rhs_cols).withColumn("__side", F.lit(0))
    combined = lhs.unionByName(rhs, allowMissingColumns=True)
    # order right rows before left rows at identical (ts, tiebreak) unless
    # strictly_before — then left first so equal-ts rights are excluded
    side_order = F.col("__side").asc() if not strictly_before else F.col("__side").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(tiebreak).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # carry ONE struct of all value columns: per-column
    # last(ignorenulls) would (a) skip a genuinely-NULL value on the
    # latest prior row in favor of an older one, and (b) stitch
    # different value_cols from DIFFERENT right rows — a row that never
    # existed. The struct is non-null for every right row, so
    # last(ignorenulls) selects exactly the latest prior ROW and its
    # fields come out together, NULLs included (matching the correlated
    # ORDER BY ... LIMIT 1 oracle semantics).
    carried = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in value_cols])
    )
    out = combined.withColumn(
        "__asof", F.last(carried, ignorenulls=True).over(w)
    )
    for c in value_cols:
        out = out.withColumn(c + suffix, F.col("__asof")[c])
    return (
        out.where(F.col("__side") == 1)
        .drop("__side", "__asof", *[c for c in value_cols if c not in left.columns])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Temporal range join: pairs with the same ``key`` and
    ``right_ts - left_ts`` in ``[lower, upper]`` seconds.

    A naive inequality join degenerates to a per-key cross product; the
    scale-correct plan is the bucketed equi-join: both sides get a time
    bucket of width >= the window span, the join runs on
    (key, bucket) for the buckets a match could live in (the left side
    probes each candidate bucket), and the exact range predicate filters.
    Join fan-out per row is ceil(span/width)+1 buckets — constant — and
    the join is a plain equi-join AQE can lay out and skew-split.

    Column name collisions: right-side columns keep their names; callers
    should alias beforehand. Timestamps are compared at second precision
    (epoch seconds) for engine portability.
    """
    span = upper - lower
    width = bucket_width or max(span, 1)
    n_buckets = span // width + 2  # buckets a match can fall into

    l_sec = F.unix_timestamp(F.col(left_ts))
    r_sec = F.unix_timestamp(F.col(right_ts))
    lhs = left.withColumn("__lsec", l_sec).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((l_sec + lower) / width).cast("long"),
                F.floor((l_sec + lower) / width).cast("long") + n_buckets - 1,
            )
        ),
    )
    rhs = right.withColumn("__rsec", r_sec).withColumn(
        "__bucket", F.floor(r_sec / width).cast("long")
    )
    dt = F.col("__rsec") - F.col("__lsec")
    return (
        lhs.join(rhs, [key, "__bucket"])
        .where((dt >= lower) & (dt <= upper))
        .drop("__bucket", "__lsec", "__rsec")
    )
