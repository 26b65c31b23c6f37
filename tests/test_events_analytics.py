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


def test_rfm_bucket_sizes_and_segment_concat(spark, sf_dir):
    from vector_io_spark.operators.events import rfm_segments
    from vector_io_spark.queries import _t

    ev = _t(spark, sf_dir, "events")  # nanos->timestamp conversion
    rows = rfm_segments(ev, as_of="2024-02-01").collect()
    n = len(rows)
    assert n == ev.select("user_id").distinct().count()
    # ntile(4): bucket sizes differ by at most 1, remainder to low buckets
    for col in ("r_score", "f_score", "m_score"):
        from collections import Counter

        sizes = Counter(r[col] for r in rows)
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1
        big = n // 4 + (1 if n % 4 else 0)
        assert all(sizes[b] == big for b in range(1, n % 4 + 1))
    for r in rows:
        assert r["segment"] == f"{r['r_score']}{r['f_score']}{r['m_score']}"
        assert r["monetary"] == round(r["monetary"], 2)
