"""Tests for funnel / cohort retention (operators/events.py)."""

from __future__ import annotations

import datetime as dt

from vector_io_spark.operators.events import cohort_retention, funnel


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_requires_strict_order(spark):
    # u1 converts all 3 steps in order; u2 has purchase BEFORE click
    # (order violation -> counts only through step 2); u3 signup only.
    rows = [
        (1, "signup", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        (2, "signup", _ts(1)), (2, "purchase", _ts(2)), (2, "click", _ts(3)),
        (3, "signup", _ts(5)),
        (4, "click", _ts(1)), (4, "purchase", _ts(2)),  # never signed up
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel(df, ["signup", "click", "purchase"]).collect()
    }
    assert got == {1: ("signup", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_same_timestamp_not_counted(spark):
    # strict 'after': a click at exactly the signup instant doesn't convert
    rows = [(1, "signup", _ts(1)), (1, "click", _ts(1))]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {r["step"]: r["n_users"] for r in funnel(df, ["signup", "click"]).collect()}
    assert got == {1: 1, 2: 0}


def test_cohort_retention_offsets(spark):
    # u1 first active week of Mon Jan 1: weeks 0 and 2; u2 first active
    # week of Mon Jan 8: week 0 only.
    rows = [
        (1, _ts(3)), (1, _ts(17)),   # Jan 3 (wk of Jan 1), Jan 17 (wk of Jan 15)
        (2, _ts(10)),                # Jan 10 (wk of Jan 8)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }
