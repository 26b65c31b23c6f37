"""Event-sequence analytics over the events table: ordered funnels and
cohort retention — the clickstream/product-analytics companions to
``operators/sessions.py``.

Reference scope: the reference engine has no event analytics; these extend
the events-table coverage the same way sessionization does (SURVEY.md
"LLM-data-pipeline operators" extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion counts: a user converts step i iff they
    have a ``steps[i]`` event STRICTLY AFTER their step-(i−1) conversion
    time (conversion time = earliest such event). Returns one row per
    step: (step, event_type, n_users).

    Plan shape for 100 TB: the scan is filtered to the funnel's event
    types (predicate pushdown — other types never leave parquet), then
    each step is a per-user min-aggregation joined to the previous step's
    (user, time) table. Every aggregation and join keys on ``user_col``,
    so the exchange established by step 1 is reused down the chain, and
    step tables shrink monotonically (step i+1 ⊆ step i users). Nothing
    is collected or broadcast-unbounded; per-user event lists are never
    materialized (no collect_list — bot users with millions of events
    cost nothing beyond their aggregated rows).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = df.where(F.col(type_col).isin(list(steps))).select(
        user_col, type_col, ts_col
    )
    prior: DataFrame | None = None
    out: DataFrame | None = None
    for i, s in enumerate(steps):
        ev = base.where(F.col(type_col) == s)
        if prior is not None:
            ev = ev.join(prior, user_col).where(F.col(ts_col) > F.col("__t"))
        prior = ev.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        row = prior.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).cast("bigint").alias("step"),
            F.lit(s).alias("event_type"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of the
    user's first event; every (cohort_week, week_offset) cell counts the
    distinct cohort users active that week. Returns
    (cohort_week DATE, week_offset, n_users).

    Plan shape: one per-user min-aggregation (the cohort table, ≤ one row
    per user), joined back on the user key — same exchange — then a
    distinct-count keyed by the (cohort, offset) grid, whose cardinality
    is weeks², not rows. The week offset is computed as day-difference
    of the two Monday truncations integer-divided by 7 — identical
    semantics in Spark and DuckDB (both truncate weeks to Monday), so the
    result is engine-exact.
    """
    first = df.groupBy(user_col).agg(
        F.to_date(F.date_trunc("week", F.min(ts_col))).alias("cohort_week")
    )
    act = df.join(first, user_col).select(
        user_col,
        "cohort_week",
        (
            F.datediff(
                F.to_date(F.date_trunc("week", F.col(ts_col))),
                F.col("cohort_week"),
            )
            / 7
        )
        .cast("bigint")
        .alias("week_offset"),
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct(F.col(user_col)).alias("n_users")
    )


def rfm_segments(
    events: DataFrame,
    as_of: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    buckets: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) user segmentation.

    Per user: days since last activity relative to ``as_of``, event
    count, and monetary total (summed as exact integer cents so the
    result is independent of aggregation order). Each metric is then
    quartile-bucketed with ntile — 1 = best (most recent / most
    frequent / highest spend), ties broken on user id — and the three
    digits concatenate into the segment label ('111' = champions).

    Scale shape: the events table collapses to one row per user in a
    single hash aggregate (the only data-proportional shuffle). Each
    quartile score then comes from a DISTRIBUTED exact global rank
    (operators/ranks.py: range-partition → per-partition counts →
    broadcast offsets → arithmetic ntile) — never an unpartitioned
    ntile window, which would sort every user on one task. Three range
    shuffles of the per-user aggregate replace three single-partition
    sorts; results are bit-identical (total order via the user-id
    tie-break).
    """
    from vector_io_spark.operators.ranks import attach_global_rank, exact_ntile

    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    per_user = events.groupBy(user_col).agg(
        F.datediff(F.to_date(F.lit(as_of)), F.to_date(F.max(ts_col)))
        .cast("bigint")
        .alias("recency_days"),
        F.count("*").alias("frequency"),
        (F.sum(cents) / 100.0).alias("monetary"),
    )
    uid = F.col(user_col).asc()
    scored = per_user
    for name, order in (
        ("r_score", [F.col("recency_days").asc(), uid]),
        ("f_score", [F.col("frequency").desc(), uid]),
        ("m_score", [F.col("monetary").desc(), uid]),
    ):
        scored = attach_global_rank(
            scored, order, rank_col="_rk", total_col="_tot"
        )
        scored = scored.withColumn(
            name, exact_ntile(buckets, "_rk", "_tot")
        ).drop("_rk", "_tot")
    return scored.select(
        user_col,
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment"),
    )


def attribute_conversions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    touch_types: tuple = ("click", "view"),
    conversion_type: str = "purchase",
) -> DataFrame:
    """First-touch / last-touch attribution: for every conversion event,
    the earliest and the most recent preceding touch event of the same
    user, plus the seconds elapsed since the last touch.

    ONE window pass over (user, ts): running first/last of the touch
    id via ``first/last(..., ignorenulls=True)`` with a rows-preceding
    frame — no self-join of the event stream against itself (an events⨝
    events join would shuffle the fact twice and explode on active
    users). Conversions with no preceding touch surface with NULL
    attribution rather than disappearing — the unattributed-rate is a
    metric in itself.

    Deterministic tie-break: same-timestamp events order by id.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_id = F.when(
        F.col(type_col).isin(*touch_types), F.col(id_col)
    )
    touch_ts = F.when(
        F.col(type_col).isin(*touch_types), F.col(ts_col)
    )
    out = (
        df.select(id_col, user_col, ts_col, type_col)
        .withColumn("first_touch_id", F.first(touch_id, ignorenulls=True).over(w))
        .withColumn("last_touch_id", F.last(touch_id, ignorenulls=True).over(w))
        .withColumn("last_touch_ts", F.last(touch_ts, ignorenulls=True).over(w))
    )
    gap = (
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("last_touch_ts")))
        / F.lit(1000000)
    ).cast("long")
    return (
        out.where(F.col(type_col) == conversion_type)
        .select(
            id_col,
            user_col,
            ts_col,
            "first_touch_id",
            "last_touch_id",
            gap.alias("seconds_since_touch"),
        )
    )
