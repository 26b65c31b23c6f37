"""Sessionization — gap-based event sessions, a core training-data /
clickstream operator Spark has only for streaming (``session_window``);
this is the batch form, plus per-session rollups.

Reference scope: the reference engine has no sessionization; this extends
the events-table analytics the same way the dedup family extends §2.7
(SURVEY.md "LLM-data-pipeline operators").

Plan shape (the 100 TB-correct one): ONE shuffle on the user key; the
lag-gap flag and the running session counter are two window functions
over the SAME (key, ordered-by-ts) partitioning, so Catalyst computes
them in a single Window node on a single sort — no second exchange. The
per-session rollup then groups by (key, session_id), which is a prefix
of the existing distribution, and AQE coalesces it without a full
reshuffle. Nothing is collected, nothing is broadcast; skewed users
(bots with millions of events) fall under AQE skew handling, and the
windows stream per key (no per-key materialization beyond the sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign each event a per-user ``session_col``: a new session starts
    at the user's first event and whenever the gap since the previous
    event exceeds ``gap_seconds``. Session ids are 1-based and contiguous
    per user, deterministic given (ts asc) ordering — ties broken by the
    timestamp equality itself (equal-ts events share a session by
    construction: their gap is 0).

    Works on sub-second timestamps exactly: gaps compare integer
    microseconds (``unix_micros``), no float epoch rounding.
    """
    gap_us = int(round(gap_seconds * 1_000_000))
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = (
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > F.lit(gap_us))
    ).cast("bigint")
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    value_col: str | None = None,
) -> DataFrame:
    """Per-session rollup: (user, session_id) -> first/last event time
    (integer unix micros — exact, engine-portable), event count, duration
    in microseconds, and optionally ``sum_value`` (2-decimal rounded sum
    of ``value_col``, accumulated in integer MICRO-UNITS — the repo's
    money-sum convention: a raw double sum is accumulation-order-
    dependent, so Spark's partial aggregation and a sequential replay
    can land on opposite sides of a .005 rounding boundary).

    One shuffle total: the groupBy key extends ``sessionize``'s window
    partitioning, so the aggregation reuses the distribution.
    """
    sess = sessionize(df, user_col, ts_col, gap_seconds)
    us = F.unix_micros(F.col(ts_col))
    aggs = [
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    ]
    if value_col is not None:
        micro = F.round(F.col(value_col) * 1e6).cast("long")
        aggs.append(
            F.round(F.sum(micro) / 1e6, 2).alias("sum_value")
        )
    return sess.groupBy(user_col, "session_id").agg(*aggs)
