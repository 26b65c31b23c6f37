"""Tests for funnel / cohort retention (operators/events.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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


def test_attribution_window_semantics(spark):
    """First/last touch: only preceding touch events count, NULLs when a
    purchase has no prior touch, deterministic same-ts ordering by id."""
    import datetime as dt

    from vector_io_spark.operators.events import attribute_conversions

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # user 1: view(1) click(2) purchase(3) purchase(4)
        (1, 1, ts(0), "view"),
        (2, 1, ts(10), "click"),
        (3, 1, ts(25), "purchase"),
        (4, 1, ts(100), "purchase"),
        # user 2: purchase with NO prior touch (error precedes)
        (5, 2, ts(0), "error"),
        (6, 2, ts(5), "purchase"),
        # user 3: same-timestamp touch+purchase -> touch counts only if
        # ordered before by id
        (7, 3, ts(0), "click"),
        (8, 3, ts(0), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r["event_id"]: r for r in attribute_conversions(df).collect()}
    assert got[3]["first_touch_id"] == 1 and got[3]["last_touch_id"] == 2
    assert got[3]["seconds_since_touch"] == 15
    # second purchase still attributes to the same touches (no new touch)
    assert got[4]["last_touch_id"] == 2 and got[4]["seconds_since_touch"] == 90
    assert got[6]["first_touch_id"] is None
    assert got[6]["last_touch_id"] is None
    assert got[6]["seconds_since_touch"] is None
    assert got[8]["last_touch_id"] == 7 and got[8]["seconds_since_touch"] == 0


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """After write_zordered on (x, y), per-file min-max ranges are tight
    on BOTH columns: a selective predicate on either dimension can skip
    most files — the single-column-sort counterfactual only prunes one."""
    import os

    import pyarrow.parquet as pq

    from vector_io_spark.format.bucketing import write_zordered

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        (F.col("id") / 128).cast("long").alias("y"),
    )
    out = str(tmp_path / "zorder")
    write_zordered(
        df, out, ["x", "y"], mins=[0, 0], maxs=[127, 127], bits=7, num_files=16
    )
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) >= 8
    ranges = {"x": [], "y": []}
    for f in files:
        md = pq.read_metadata(f)
        names = md.schema.names
        for col in ("x", "y"):
            i = names.index(col)
            lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
            ranges[col].append((lo, hi))
    # pruning property: a 1/8-of-domain predicate on EITHER dimension
    # overlaps a minority of files (files whose min-max misses [0, 15]
    # are skipped by parquet stats). A single-column sort would leave one
    # dimension at ~every-file-overlaps; z-order bounds both. (A strict
    # per-file span bound is NOT guaranteed — files straddling high-order
    # curve boundaries legitimately span the full domain.)
    for col in ("x", "y"):
        touched = sum(1 for lo, hi in ranges[col] if lo <= 15 and hi >= 0)
        assert touched <= len(files) // 2, (col, ranges[col])
    # round-trip: data survives the layout unchanged
    back = spark.read.parquet(out)
    assert back.count() == n


def test_pagerank_toy_graph_ordering_and_mass(spark):
    """Star graph: the hub everyone links to must out-rank the spokes;
    total rank mass stays <= 1 (dangling leak) and every node gets at
    least the teleport base."""
    from vector_io_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
        "src string, dst string",
    )
    got = {r["node"]: r["rq"] for r in pagerank(edges, iters=10).collect()}
    # hub and a trade mass along the 2-cycle (finite-iteration parity
    # decides which leads), but both must dominate the pure spokes,
    # which are symmetric and sit at the teleport base
    assert min(got["hub"], got["a"]) > got["b"] == got["c"]
    total = sum(got.values())
    # no dangling nodes here -> mass conserves up to one rounding unit
    # per node; leak could only shrink it
    assert total <= 1_000_000_000_000 + 4
    base = (1 - 0.85) / 4
    assert all(v >= base * 1e12 * 0.99 for v in got.values())


def test_logreg_learns_separable_data_and_is_deterministic(spark):
    """On linearly separable data the hard-sigmoid GD must actually
    learn (>95% train accuracy, correct weight sign); training twice
    must produce bit-identical weights (the determinism the oracle
    replay depends on). The synthetic benchmark tables have labels
    independent of features by construction, so learnability is pinned
    here instead."""
    from pyspark.sql import functions as F

    from vector_io_spark.operators.classifier import Q, logreg_train

    df = spark.range(0, 400).select(
        F.col("id"),
        ((F.col("id") % 100) * Q / 100).cast("long").alias("x"),
        ((F.col("id") % 100) >= 50).cast("long").alias("y"),
    )
    feats = {"bias": F.lit(Q).cast("long"), "x": F.col("x")}
    w1, scored = logreg_train(df, feats, F.col("y"), iters=15, lr=4.0)
    acc = scored.select(
        F.avg((F.col("pred") == F.col("y")).cast("double"))
    ).first()[0]
    assert acc > 0.95, (w1, acc)
    assert w1[1] > 0 > w1[0]  # positive slope, negative bias
    w2, _ = logreg_train(df, feats, F.col("y"), iters=15, lr=4.0)
    assert w1 == w2
