"""Cross-batch stateful streaming dedup (applyInPandasWithState)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.streaming.stateful import streaming_dedup_by_key


def _run_batch(spark, landing, checkpoint, out_dir, schema):
    stream = spark.readStream.schema(schema).parquet(landing)
    deduped = streaming_dedup_by_key(stream, "doc_id", order_col="seq")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_dedup_first_seen_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    b1 = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "a-dup"), (2, 20, "b"), (3, 30, "c")],
        "doc_id long, seq long, text string",
    )
    b1.coalesce(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema
    _run_batch(spark, landing, checkpoint, out_dir, schema)

    got1 = {
        r["doc_id"]: (r["seq"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # within-batch: smallest seq per key wins
    assert got1 == {1: (10, "a"), 2: (20, "b"), 3: (30, "c")}

    # second micro-batch: keys 2,3 are dups (state remembers them even
    # with smaller seq — first batch won), key 4 is new
    b2 = spark.createDataFrame(
        [(2, 5, "b-late"), (3, 31, "c-dup"), (4, 40, "d")],
        "doc_id long, seq long, text string",
    )
    b2.coalesce(1).write.mode("append").parquet(landing)
    _run_batch(spark, landing, checkpoint, out_dir, schema)

    got2 = {
        r["doc_id"]: (r["seq"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2 == {1: (10, "a"), 2: (20, "b"), 3: (30, "c"), 4: (40, "d")}


def test_streaming_dedup_fingerprint_key_on_documents(spark, sf_dir, tmp_path):
    """Content-level dedup over a document stream: key = md5 fingerprint
    (16 bytes of state per distinct content, never the text)."""
    from vector_io_spark.functions.text import doc_fingerprint

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn("fp", doc_fingerprint("text"))
        .withColumn("seq", F.col("doc_id"))
    )
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000).withColumn(
        "seq", F.col("seq") + 1_000_000
    )
    landing = str(tmp_path / "docs_landing")
    docs.unionByName(dup).coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema

    stream = spark.readStream.schema(schema).parquet(landing)
    deduped = streaming_dedup_by_key(stream, "fp", order_col="seq")
    out_dir = str(tmp_path / "docs_out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "docs_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    out = spark.read.parquet(out_dir)
    n_distinct_fp = docs.select("fp").distinct().count()
    assert out.count() == n_distinct_fp
    # first-writer-wins: every surviving doc_id is from the original set
    assert out.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_streaming_sessionize_gap_and_watermark_close(spark, tmp_path):
    """Sessions close on (a) a later in-gap event arriving -> emitted in
    that batch; (b) event-time watermark passing last+gap -> state
    timeout. Counts/sums/time bounds are exact."""
    import datetime as dt

    from vector_io_spark.streaming.stateful import streaming_sessionize

    landing = str(tmp_path / "s_landing")
    out_dir = str(tmp_path / "s_out")
    ckpt = str(tmp_path / "s_ckpt")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    def run():
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        sess = streaming_sessionize(
            stream, gap_seconds=60, watermark="0 seconds"
        )
        q = (
            sess.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1: user 1 has two sessions separated by > gap, the second
    # still open; user 2 one open session
    b1 = spark.createDataFrame(
        [
            (1, ts(0), 1.0),
            (1, ts(30), 2.0),
            (1, ts(200), 4.0),  # > 60s after previous -> new session
            (2, ts(10), 8.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    b1.coalesce(1).write.mode("append").parquet(landing)
    run()
    got1 = [
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .orderBy("user_id", "session_start_us")
        .collect()
    ]
    us = lambda s: int(ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    # user 1's FIRST session closed by the 200s event; user 2's closed by
    # state timeout in the same run (watermark delay 0 -> the batch's max
    # event time, 200s, already passed last+gap = 70s)
    assert got1 == [(1, us(0), us(30), 2, 3.0), (2, us(10), us(10), 1, 8.0)]

    # batch 2: much later events advance the watermark far past every
    # open session's last+gap -> timeout flushes user 1's second session;
    # the new event opens a fresh (still-open) session
    b2 = spark.createDataFrame(
        [(3, ts(100000), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    b2.coalesce(1).write.mode("append").parquet(landing)
    run()
    got2 = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"], r["n_events"], r["value_sum"]
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got2[(1, us(0))] == (us(30), 2, 3.0)
    assert got2[(1, us(200))] == (us(200), 1, 4.0)
    assert got2[(2, us(10))] == (us(10), 1, 8.0)
    assert (3, us(100000)) not in got2  # still open


def test_stream_static_enrichment_join(spark, sf_dir, tmp_path):
    """Stream-static join: a micro-batched event stream enriches against
    a static dimension (per-user segment) — the standard streaming
    pattern for joining a 100 TB-scale stream against reference data;
    the static side re-resolves per micro-batch (picks up dim updates)
    and the join needs no watermark (static side never grows state)."""
    from tests.conftest import load

    landing = str(tmp_path / "e_landing")
    out_dir = str(tmp_path / "e_out")
    ckpt = str(tmp_path / "e_ckpt")

    events = load(spark, sf_dir, "events").limit(200)
    events.coalesce(1).write.parquet(landing)
    schema = spark.read.parquet(landing).schema

    dim = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn(
            "segment",
            F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"),
        )
    )
    stream = spark.readStream.schema(schema).parquet(landing)
    enriched = stream.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "segment"
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out_dir)
    assert got.count() == 200  # inner join loses nothing: dim covers all users
    bad = got.where(
        ((F.col("user_id") % 2 == 0) & (F.col("segment") != "even"))
        | ((F.col("user_id") % 2 != 0) & (F.col("segment") != "odd"))
    )
    assert bad.count() == 0


def test_streaming_sessionize_out_of_order_within_watermark(spark, tmp_path):
    """Stragglers arriving in a LATER micro-batch but within the
    watermark must (a) never regress the open session's end/timeout,
    (b) merge via min/max when inside [start-gap, last+gap], and
    (c) close as their own earlier session when more than gap older
    than the open session's start — not pollute the current one."""
    import datetime as dt

    from vector_io_spark.streaming.stateful import streaming_sessionize

    landing = str(tmp_path / "o_landing")
    out_dir = str(tmp_path / "o_out")
    ckpt = str(tmp_path / "o_ckpt")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    def run():
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        sess = streaming_sessionize(stream, gap_seconds=60, watermark="1 hour")
        q = (
            sess.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    us = lambda s: int(ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)

    # batch 1: open session [1000, 1030]
    spark.createDataFrame(
        [(7, ts(1000), 1.0), (7, ts(1030), 2.0)],
        "user_id long, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(landing)
    run()
    assert spark.read.parquet(out_dir).count() == 0  # nothing closed yet

    # batch 2, all older than the open session's end, all within the
    # 1 h watermark: 900 is gap-older than start (1000-900 > 60) ->
    # its own earlier session; 980 extends start (1000-980 <= 60);
    # 1010 falls inside the session body
    spark.createDataFrame(
        [(7, ts(900), 4.0), (7, ts(980), 8.0), (7, ts(1010), 16.0)],
        "user_id long, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(landing)
    run()
    got2 = [
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .orderBy("session_start_us")
        .collect()
    ]
    assert got2 == [(7, us(900), us(900), 1, 4.0)]

    # batch 3: a far-future event closes the merged open session —
    # boundaries are min/max of all five events in [980, 1030]
    spark.createDataFrame(
        [(7, ts(5000), 32.0)],
        "user_id long, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(landing)
    run()
    got3 = [
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .orderBy("session_start_us")
        .collect()
    ]
    assert got3 == [
        (7, us(900), us(900), 1, 4.0),
        (7, us(980), us(1030), 4, 27.0),
    ]


def test_streaming_hll_registers_and_estimate(spark, tmp_path):
    """Streamed register maintenance + batch estimate: per-hour
    approximate distinct users within the HLL error bound of truth, and
    registers appended across separate micro-batch runs merge losslessly
    (bucket-wise max on read)."""
    import datetime as dt

    from vector_io_spark.streaming.incremental import (
        hll_estimate_from_registers,
        streaming_hll_registers,
    )

    landing = str(tmp_path / "h_landing")
    out_dir = str(tmp_path / "h_out")
    ckpt = str(tmp_path / "h_ckpt")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)

    def run():
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        regs = streaming_hll_registers(
            stream, "user_id", window="1 hour", watermark="0 seconds"
        )
        q = (
            regs.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # hour 1: users 0..199; hour 2: users 100..349 (overlap on purpose)
    rows1 = [(u, t0 + dt.timedelta(minutes=u % 50)) for u in range(200)]
    rows2 = [
        (u, t0 + dt.timedelta(hours=1, minutes=u % 50)) for u in range(100, 350)
    ]
    spark.createDataFrame(rows1 + rows2, "user_id long, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(landing)
    # a far-future row in a second batch closes both windows
    run()
    spark.createDataFrame(
        [(999999, t0 + dt.timedelta(days=2))], "user_id long, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(landing)
    run()

    regs = spark.read.parquet(out_dir)
    est = {
        str(r["window_start"]): r["estimate"]
        for r in hll_estimate_from_registers(regs).collect()
    }
    exacts = {"2025-06-01 12:00:00": 200, "2025-06-01 13:00:00": 250}
    for k, exact in exacts.items():
        assert k in est, est
        assert abs(est[k] - exact) / exact < 0.25, (k, est[k], exact)


def test_stream_stream_interval_attribution(spark, tmp_path):
    """Stream-stream join with bounded event-time range: conversions
    match only same-user touches within the hour before them; an
    out-of-range touch never matches; results arrive across micro-batch
    runs as watermarks close."""
    import datetime as dt

    from vector_io_spark.streaming.incremental import stream_stream_attribution

    t_land = str(tmp_path / "t_land")
    c_land = str(tmp_path / "c_land")
    out_dir = str(tmp_path / "ss_out")
    ckpt = str(tmp_path / "ss_ckpt")
    t0 = dt.datetime(2025, 6, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    touches = [
        (1, ts(0), "click"),     # 30 min before conv -> match
        (1, ts(25), "view"),     # 5 min before -> match
        (1, ts(35), "click"),    # AFTER the conversion -> no match
        (2, ts(0), "click"),     # conv at +90 -> outside 1h -> no match
    ]
    convs = [(1, ts(30), "purchase"), (2, ts(90), "purchase")]
    spark.createDataFrame(
        touches, "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("append").parquet(t_land)
    spark.createDataFrame(
        convs, "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("append").parquet(c_land)

    def run():
        ts_schema = spark.read.parquet(t_land).schema
        t_stream = spark.readStream.schema(ts_schema).parquet(t_land)
        c_stream = spark.readStream.schema(ts_schema).parquet(c_land)
        out = stream_stream_attribution(
            t_stream, c_stream, max_gap="1 hour", watermark="0 seconds"
        )
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    # advance both watermarks far past everything to flush pending state
    far = [(99, t0 + dt.timedelta(days=1), "click")]
    spark.createDataFrame(
        far, "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("append").parquet(t_land)
    spark.createDataFrame(
        far, "user_id long, ts timestamp, event_type string"
    ).coalesce(1).write.mode("append").parquet(c_land)
    run()

    got = {
        (r["user_id"], r["touch_type"], r["gap_seconds"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(1, "click", 1800), (1, "view", 300)}


def test_streaming_cdc_apply_maintains_snapshot(spark, tmp_path):
    """CDC changelog stream -> materialized snapshot: upserts and
    deletes merge per micro-batch with last-write-wins by seq; a second
    batch composes on the first batch's snapshot."""
    from vector_io_spark.streaming.incremental import (
        init_cdc_snapshot,
        read_cdc_snapshot,
        streaming_cdc_apply,
    )

    snap = str(tmp_path / "snapshot")
    landing = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")

    init_cdc_snapshot(
        spark.createDataFrame(
            [(1, "a", 100.0), (2, "b", 200.0), (3, "c", 300.0)],
            "id long, name string, bal double",
        ),
        snap,
    )

    def _run(batch_rows):
        spark.createDataFrame(
            batch_rows, "id long, name string, bal double, op string, seq long"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_cdc_apply(stream, snap, ckpt, "id", seq_col="seq")
        q.awaitTermination(180)
        q.stop()

    # batch 1: update id 1 twice (seq 2 wins), delete id 2, insert id 4
    _run(
        [
            (1, "a1", 110.0, "upsert", 1),
            (1, "a2", 120.0, "upsert", 2),
            (2, None, None, "delete", 1),
            (4, "d", 400.0, "upsert", 1),
        ]
    )
    got1 = {r["id"]: (r["name"], r["bal"]) for r in read_cdc_snapshot(spark, snap).collect()}
    assert got1 == {1: ("a2", 120.0), 3: ("c", 300.0), 4: ("d", 400.0)}

    # batch 2: re-insert id 2, delete id 4 — composes on batch 1's state
    _run([(2, "b2", 250.0, "upsert", 3), (4, None, None, "delete", 2)])
    got2 = {r["id"]: (r["name"], r["bal"]) for r in read_cdc_snapshot(spark, snap).collect()}
    assert got2 == {1: ("a2", 120.0), 2: ("b2", 250.0), 3: ("c", 300.0)}

    # crash-safety shape: the previous version is retained (keep_versions=2)
    # and a torn version dir without _SUCCESS is invisible to readers
    import os

    versions = sorted(d for d in os.listdir(snap) if d.startswith("v-"))
    assert len(versions) == 2, versions
    torn = os.path.join(snap, "v-" + "9" * 20)
    os.makedirs(torn)
    with open(os.path.join(torn, "part-000.parquet"), "wb") as f:
        f.write(b"garbage")  # no _SUCCESS marker
    got3 = {r["id"]: (r["name"], r["bal"]) for r in read_cdc_snapshot(spark, snap).collect()}
    assert got3 == got2


def test_streaming_cdc_apply_recovers_from_crash_replay(spark, tmp_path):
    """Crash-replay recovery: a batch that crashed MID-WRITE leaves a
    torn target dir (no _SUCCESS) for the next batch id — on replay the
    merge must clear it and write fresh instead of wedging on
    'path already exists'. A batch that crashed AFTER commit but before
    the checkpoint recorded it leaves a COMPLETE target dir — on replay
    the merge must skip (already applied) and let the checkpoint
    advance."""
    import os
    import shutil

    from vector_io_spark.streaming.incremental import (
        init_cdc_snapshot,
        read_cdc_snapshot,
        streaming_cdc_apply,
    )

    snap = str(tmp_path / "snapshot")
    landing = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    init_cdc_snapshot(
        spark.createDataFrame(
            [(1, "a", 100.0)], "id long, name string, bal double"
        ),
        snap,
    )

    def _run(batch_rows):
        spark.createDataFrame(
            batch_rows, "id long, name string, bal double, op string, seq long"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_cdc_apply(stream, snap, ckpt, "id", seq_col="seq")
        q.awaitTermination(180)
        q.stop()

    # Simulate a crash mid-write of batch 0: its target v-1 exists,
    # torn (no _SUCCESS). The replayed batch must recover.
    torn = os.path.join(snap, f"v-{1:020d}")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-000.parquet"), "wb") as f:
        f.write(b"garbage")
    _run([(2, "b", 200.0, "upsert", 1)])
    got = {r["id"]: r["name"] for r in read_cdc_snapshot(spark, snap).collect()}
    assert got == {1: "a", 2: "b"}
    assert os.path.exists(os.path.join(torn, "_SUCCESS"))

    # Simulate commit-then-crash of batch 1: its target v-2 already
    # exists COMPLETE (copy of v-1 with _SUCCESS), carrying THIS
    # stream's commit marker for batch id 1 (what a genuine
    # commit-then-crash leaves behind). The replayed batch must skip
    # the merge (idempotent) and not error.
    committed = os.path.join(snap, f"v-{2:020d}")
    shutil.copytree(torn, committed)
    for fn in os.listdir(committed):
        if fn.startswith("_COMMIT-"):
            prefix = fn.rsplit("-", 1)[0]  # _COMMIT-<stream id>
            os.rename(
                os.path.join(committed, fn),
                os.path.join(committed, f"{prefix}-1"),
            )
    _run([(3, "c", 300.0, "upsert", 1)])
    got2 = {r["id"]: r["name"] for r in read_cdc_snapshot(spark, snap).collect()}
    # v-2 was pre-committed as a copy of v-1's state: the skip path
    # means id 3 is NOT merged into v-2 (its merge "already happened"),
    # and the next batch composes on it.
    assert got2 == {1: "a", 2: "b"}
    _run([(4, "d", 400.0, "upsert", 1)])
    got3 = {r["id"]: r["name"] for r in read_cdc_snapshot(spark, snap).collect()}
    assert got3 == {1: "a", 2: "b", 4: "d"}


def test_streaming_cdc_apply_detects_checkpoint_reset(spark, tmp_path):
    """Round-5 contract: a RESET checkpoint (new/deleted checkpoint dir
    pointed at an existing snapshot root) restarts batch ids at 0 — the
    replay guard must FAIL LOUDLY (commit marker carries the stream id,
    which dies with the checkpoint) instead of silently treating the
    early batches as already-applied and dropping their data."""
    import shutil

    from vector_io_spark.streaming.incremental import (
        init_cdc_snapshot,
        read_cdc_snapshot,
        streaming_cdc_apply,
    )

    snap = str(tmp_path / "snapshot")
    landing = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    init_cdc_snapshot(
        spark.createDataFrame(
            [(1, "a", 100.0)], "id long, name string, bal double"
        ),
        snap,
    )

    def _run(batch_rows, checkpoint):
        from pyspark.errors.exceptions.captured import StreamingQueryException

        spark.createDataFrame(
            batch_rows, "id long, name string, bal double, op string, seq long"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_cdc_apply(stream, snap, checkpoint, "id", seq_col="seq")
        try:
            q.awaitTermination(180)
            exc = q.exception()
        except StreamingQueryException as e:
            exc = e
        finally:
            q.stop()
        return exc

    assert _run([(2, "b", 200.0, "upsert", 1)], ckpt) is None
    got = {r["id"]: r["name"] for r in read_cdc_snapshot(spark, snap).collect()}
    assert got == {1: "a", 2: "b"}

    # checkpoint reset: delete it; batch ids restart at 0 and v-1
    # already exists complete — the stream must error descriptively,
    # not drop the new batch
    shutil.rmtree(ckpt)
    exc = _run([(3, "c", 300.0, "upsert", 1)], ckpt)
    assert exc is not None and "out of sync" in str(exc)
    # and the snapshot is unchanged — nothing was silently skipped or
    # overwritten
    got2 = {r["id"]: r["name"] for r in read_cdc_snapshot(spark, snap).collect()}
    assert got2 == {1: "a", 2: "b"}


def test_streaming_neardup_ingest_probes_and_grows_index(spark, tmp_path):
    """Round-5: continuous near-dup detection — each micro-batch probes
    the persisted signature index (new-vs-resident AND new-vs-new), and
    its own signatures become resident for LATER batches: batch 2's
    duplicate of a batch-1 doc must pair even though neither is in the
    seed corpus. Replay-safe by construction (batch-partition overwrite
    of deterministic content)."""
    from vector_io_spark.streaming.incremental import (
        seed_neardup_index,
        streaming_neardup_ingest,
    )

    def doc(i, text):
        return (i, text)

    seed = spark.createDataFrame(
        [
            doc(1, "the quick brown fox jumps over the lazy dog today"),
            doc(2, "pack my box with five dozen liquor jugs right now"),
            doc(3, "sphinx of black quartz judge my vow said the king"),
        ],
        "doc_id long, text string",
    )
    index_root = str(tmp_path / "sig_index")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_neardup_index(seed, index_root, "doc_id", "text")

    def run(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_neardup_ingest(
            stream, index_root, pairs_root, ckpt, "doc_id", "text",
            threshold=0.9,
        )
        q.awaitTermination(180)
        q.stop()

    # batch 1: one dup of seed doc 1, one novel doc
    run([
        doc(101, "the quick brown fox jumps over the lazy dog today"),
        doc(102, "a completely different document about spark engines"),
    ])
    # batch 2: one dup of the BATCH-1 novel doc (not in the seed!), one
    # dup of seed doc 2, one novel
    run([
        doc(201, "a completely different document about spark engines"),
        doc(202, "pack my box with five dozen liquor jugs right now"),
        doc(203, "nothing like any other text in this tiny corpus here"),
    ])

    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs_root).collect()
    }
    assert (1, 101) in got          # batch1 vs seed
    assert (102, 201) in got        # batch2 vs batch1 — the index grew
    assert (2, 202) in got          # batch2 vs seed
    # no old×old pair ever (both sides resident before their batch)
    assert all(b >= 101 for a, b in got), got
    # the index now holds seed + both batches' signatures
    idx = spark.read.parquet(index_root)
    assert idx.count() == 8
    assert {r["ingest_batch"] for r in idx.select("ingest_batch").distinct().collect()} == {-1, 0, 1}


def test_compact_neardup_index_preserves_probes_and_collapses_files(
    spark, tmp_path
):
    """Round-6: folding batch partitions into the resident partition
    must not change what a later batch's probe sees (content is
    deterministic, dedup on id makes refolding idempotent), while the
    partition count collapses; keep_latest leaves the newest batch
    unfolded (the only possibly-uncommitted one under a live
    checkpoint)."""
    from vector_io_spark.operators.dedup import (
        minhash_lsh_incremental_pairs,
    )
    from vector_io_spark.streaming.incremental import (
        compact_neardup_index,
        seed_neardup_index,
        streaming_neardup_ingest,
    )

    def doc(i, text):
        return (i, text)

    seed = spark.createDataFrame(
        [
            doc(1, "the quick brown fox jumps over the lazy dog today"),
            doc(2, "pack my box with five dozen liquor jugs right now"),
        ],
        "doc_id long, text string",
    )
    index_root = str(tmp_path / "sig_index")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_neardup_index(seed, index_root, "doc_id", "text")

    def run(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_neardup_ingest(
            stream, index_root, pairs_root, ckpt, "doc_id", "text",
            threshold=0.9,
        )
        q.awaitTermination(180)
        q.stop()

    run([doc(101, "the quick brown fox jumps over the lazy dog today"),
         doc(102, "a completely different document about spark engines")])
    run([doc(201, "pack my box with five dozen liquor jugs right now"),
         doc(202, "nothing like any other text in this tiny corpus here")])
    run([doc(301, "a completely different document about spark engines")])

    def probe(new_rows):
        new = spark.createDataFrame(new_rows, "doc_id long, text string")
        from pyspark.sql import functions as F

        sigs = spark.read.parquet(index_root).drop("ingest_batch")
        return sorted(
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_incremental_pairs(
                None, new, "doc_id", "text", threshold=0.9, old_sigs=sigs
            ).collect()
        )

    next_batch = [
        doc(401, "the quick brown fox jumps over the lazy dog today"),
        doc(402, "a completely different document about spark engines"),
    ]
    before = probe(next_batch)
    assert (1, 401) in before and (102, 402) in before

    stats = compact_neardup_index(spark, index_root, "doc_id")
    # batches 0 and 1 folded; batch 2 (latest) kept for replay safety
    assert stats["folded_batches"] == 2
    assert stats["partitions_after"] == 2  # -1 and the latest batch
    parts = {
        r["ingest_batch"]
        for r in spark.read.parquet(index_root)
        .select("ingest_batch").distinct().collect()
    }
    assert parts == {-1, 2}
    assert probe(next_batch) == before

    # idempotent + keep_latest=False folds everything after shutdown;
    # a replayed already-folded batch partition dedups away on doc_id
    spark.createDataFrame(
        [doc(201, "pack my box with five dozen liquor jugs right now"),
         doc(202, "nothing like any other text in this tiny corpus here")],
        "doc_id long, text string",
    )
    from vector_io_spark.operators.dedup import minhash_signatures

    minhash_signatures(
        spark.createDataFrame(
            [doc(201, "pack my box with five dozen liquor jugs right now"),
             doc(202, "nothing like any other text in this tiny corpus here")],
            "doc_id long, text string",
        ),
        "doc_id", "text", 16, 3,
    ).write.mode("overwrite").parquet(f"{index_root}/ingest_batch=1")
    stats2 = compact_neardup_index(
        spark, index_root, "doc_id", keep_latest=False
    )
    assert stats2["partitions_after"] == 1
    idx = spark.read.parquet(index_root)
    # 2 seed + 2 + 2 + 1 ingested docs, replayed partition deduped away
    assert idx.count() == idx.select("doc_id").distinct().count() == 7
    assert probe(next_batch) == before

    # nothing left to fold: a rerun is a no-op
    stats3 = compact_neardup_index(spark, index_root, "doc_id")
    assert stats3["folded_batches"] == 0


def test_streaming_embedding_neardup_ingest_probes_and_grows(spark, tmp_path):
    """Round-6: the vector-side continuous ingest — each micro-batch
    probes the persisted hyperplane signature index and id-joins the
    persisted vectors for exact cosine verification; its own signatures
    AND vectors become resident for LATER batches (batch 2's duplicate
    of a batch-1 vector pairs without either being in the seed)."""
    from vector_io_spark.streaming.incremental import (
        seed_embedding_neardup_index,
        streaming_embedding_neardup_ingest,
    )

    def v(i, vec):
        return (i, [float(x) for x in vec])

    seed = spark.createDataFrame(
        [
            v(1, [1.0, 0.2, 0.0, 0.1]),
            v(2, [0.0, 1.0, 0.3, 0.0]),
            v(3, [0.1, 0.0, 1.0, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    index_root = str(tmp_path / "sig_index")
    vectors_root = str(tmp_path / "vec_store")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_embedding_neardup_index(
        seed, index_root, vectors_root, "vec_id", "embedding"
    )

    def run(rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_embedding_neardup_ingest(
            stream, index_root, vectors_root, pairs_root, ckpt,
            "vec_id", "embedding", threshold=0.98,
        )
        q.awaitTermination(180)
        q.stop()

    # batch 1: a copy of seed vec 1 + a novel direction
    run([v(101, [1.0, 0.2, 0.0, 0.1]), v(102, [0.5, 0.5, 0.5, 0.5])])
    # batch 2: a copy of the BATCH-1 novel vector + a copy of seed 2
    run([v(201, [0.5, 0.5, 0.5, 0.5]), v(202, [0.0, 1.0, 0.3, 0.0])])

    rows = spark.read.parquet(pairs_root).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (1, 101) in got          # batch1 vs seed
    assert (102, 201) in got        # batch2 vs batch1 — the index grew
    assert (2, 202) in got          # batch2 vs seed
    assert all(b >= 101 for a, b in got), got  # never old×old
    assert all(r["cos_sim"] >= 0.98 for r in rows)
    # both stores grew one partition per batch on top of the seed
    for root in (index_root, vectors_root):
        parts = {
            r["ingest_batch"]
            for r in spark.read.parquet(root)
            .select("ingest_batch").distinct().collect()
        }
        assert parts == {-1, 0, 1}, root
    assert spark.read.parquet(vectors_root).count() == 7


def test_compact_embedding_stores_preserves_probes(spark, tmp_path):
    """compact_neardup_index is generic over any id-deduplicable
    partitioned store: folding BOTH embedding-side roots (signatures +
    vectors) must leave the next batch's probe pairs unchanged."""
    from pyspark.sql import functions as F

    from vector_io_spark.operators.dedup import (
        embedding_cosine_incremental_pairs,
    )
    from vector_io_spark.streaming.incremental import (
        compact_neardup_index,
        seed_embedding_neardup_index,
        streaming_embedding_neardup_ingest,
    )

    def v(i, vec):
        return (i, [float(x) for x in vec])

    seed = spark.createDataFrame(
        [v(1, [1.0, 0.2, 0.0, 0.1]), v(2, [0.0, 1.0, 0.3, 0.0])],
        "vec_id long, embedding array<double>",
    )
    index_root = str(tmp_path / "sig")
    vectors_root = str(tmp_path / "vec")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_embedding_neardup_index(
        seed, index_root, vectors_root, "vec_id", "embedding"
    )

    def run(rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_embedding_neardup_ingest(
            stream, index_root, vectors_root, pairs_root, ckpt,
            "vec_id", "embedding", threshold=0.98,
        )
        q.awaitTermination(180)
        q.stop()

    run([v(101, [1.0, 0.2, 0.0, 0.1]), v(102, [0.5, 0.5, 0.5, 0.5])])
    run([v(201, [0.5, 0.5, 0.5, 0.5])])

    def probe(rows):
        new = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        sigs = spark.read.parquet(index_root).drop("ingest_batch")
        vecs = spark.read.parquet(vectors_root).drop("ingest_batch")
        return sorted(
            (r["id_a"], r["id_b"], r["cos_sim"])
            for r in embedding_cosine_incremental_pairs(
                vecs, new, "vec_id", "embedding",
                threshold=0.98, old_sigs=sigs,
            ).collect()
        )

    nxt = [v(301, [0.5, 0.5, 0.5, 0.5]), v(302, [0.0, 1.0, 0.3, 0.0])]
    before = probe(nxt)
    assert {(a, b) for a, b, _ in before} >= {(102, 301), (201, 301), (2, 302)}
    for root in (index_root, vectors_root):
        stats = compact_neardup_index(
            spark, root, "vec_id", keep_latest=False
        )
        assert stats["partitions_after"] == 1, root
    assert probe(nxt) == before
    assert spark.read.parquet(vectors_root).count() == 5


def test_streaming_ivfpq_ingest_probe_visible_and_compactable(spark, tmp_path):
    """Continuous IVF+PQ maintenance: seed trains once; each micro-batch
    encodes against the STORED artifacts into
    cells/ingest_batch=<id>/cell=<i>; probes see resident + streamed
    rows uniformly with cell partition pruning intact; compaction with
    partition_by=("cell",) folds the batch level while preserving both
    probe results and the pruned layout."""
    from pyspark.sql import functions as F

    from vector_io_spark.operators.similarity import ivfpq_index_probe_topk
    from vector_io_spark.streaming.incremental import (
        compact_neardup_index,
        seed_ivfpq_stream_index,
        streaming_ivfpq_ingest,
    )

    def v(i, pattern):
        base = [0.05 * ((i + j) % 7) for j in range(8)]
        base[pattern % 8] += 3.0
        return (i, [float(x) for x in base])

    seed_rows = [v(i, i) for i in range(10)]
    seed = spark.createDataFrame(
        seed_rows, "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "ivfpq_stream")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_ivfpq_stream_index(
        seed, root, num_cells=4, num_subspaces=4, codebook_size=4, seed=3
    )

    def run(rows):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_ivfpq_ingest(stream, root, ckpt)
        q.awaitTermination(180)
        q.stop()

    run([v(101, 1), v(102, 5)])
    run([v(201, 2)])

    cells = spark.read.parquet(f"{root}/cells")
    assert set(
        r["ingest_batch"] for r in cells.select("ingest_batch").distinct().collect()
    ) == {-1, 0, 1}
    assert cells.count() == 13

    queries = spark.createDataFrame(
        [v(101, 1), v(201, 2)], "vec_id long, embedding array<double>"
    ).selectExpr("vec_id as query_id", "embedding")
    got = ivfpq_index_probe_topk(spark, root, queries, k=3, nprobe=2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan
    before = sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
        for r in got.collect()
    )
    # streamed ids self-match (their cell is always probed; own code is
    # the LUT argmin so nothing beats distance-to-self)
    assert {(q, q) for q in (101, 201)} <= {(a, b) for a, b, _, _ in before}

    stats = compact_neardup_index(
        spark, f"{root}/cells", "vec_id", keep_latest=False,
        partition_by=("cell",),
    )
    assert stats["partitions_after"] == 1 and stats["resident_rows"] == 13
    got2 = ivfpq_index_probe_topk(spark, root, queries, k=3, nprobe=2)
    plan2 = got2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan2 and "cell" in plan2, plan2
    assert sorted(
        (r["query_id"], r["vec_id"], r["adc_dist"], r["rank"])
        for r in got2.collect()
    ) == before


def test_streaming_cdc_apply_recovers_marker_orphan(spark, tmp_path):
    """Round-6 ADVICE fix: a crash in the window between the merge's
    _SUCCESS and the commit-marker write leaves the NEWEST complete
    version with no marker from ANY stream. That exact state must
    auto-recover (delete the orphan, rewrite — the merge is
    deterministic and idempotent), NOT raise the out-of-sync error
    reserved for marker-present / non-newest mismatches."""
    import os
    import shutil

    from vector_io_spark.streaming.incremental import (
        init_cdc_snapshot,
        read_cdc_snapshot,
        streaming_cdc_apply,
    )

    snap = str(tmp_path / "snapshot")
    landing = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    init_cdc_snapshot(
        spark.createDataFrame(
            [(1, "a", 100.0)], "id long, name string, bal double"
        ),
        snap,
    )

    def _run(batch_rows):
        spark.createDataFrame(
            batch_rows, "id long, name string, bal double, op string, seq long"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_cdc_apply(stream, snap, ckpt, "id", seq_col="seq")
        q.awaitTermination(180)
        q.stop()

    _run([(2, "b", 200.0, "upsert", 1)])
    v1 = os.path.join(snap, f"v-{1:020d}")
    assert os.path.exists(os.path.join(v1, "_SUCCESS"))

    # forge the batch-1 crash orphan: v-2 complete (_SUCCESS present)
    # but stripped of every commit marker — exactly what dying between
    # the two filesystem calls leaves behind
    v2 = os.path.join(snap, f"v-{2:020d}")
    shutil.copytree(v1, v2)
    for fn in os.listdir(v2):
        if fn.startswith("_COMMIT-") or fn.startswith("._COMMIT-"):
            os.remove(os.path.join(v2, fn))

    _run([(3, "c", 300.0, "upsert", 1)])  # must NOT raise
    got = {r["id"]: r["name"] for r in read_cdc_snapshot(spark, snap).collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    # the rewritten v-2 now carries this stream's marker
    assert any(
        fn.startswith("_COMMIT-") for fn in os.listdir(v2)
    ), os.listdir(v2)


def test_streaming_neardup_ingest_detects_checkpoint_reset(spark, tmp_path):
    """Round-6 review fix: a reset/foreign checkpoint restarts batch ids
    at 0 against a store that already holds higher ingest_batch
    partitions — the ingest must FAIL LOUDLY (the `< batch_id` probe
    filter would otherwise silently hide resident partitions and each
    batch would clobber committed history id-by-id)."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from vector_io_spark.streaming.incremental import (
        compact_neardup_index,
        seed_neardup_index,
        streaming_neardup_ingest,
    )

    seed = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    index_root = str(tmp_path / "sig")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_neardup_index(seed, index_root, "doc_id", "text")

    def _run(rows, checkpoint):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_neardup_ingest(
            stream, index_root, pairs_root, checkpoint, "doc_id", "text"
        )
        try:
            q.awaitTermination(180)
            exc = q.exception()
        except StreamingQueryException as e:
            exc = e
        finally:
            q.stop()
        return exc

    assert _run(
        [(101, "a completely different sentence about shipping crates")],
        ckpt,
    ) is None
    assert _run(
        [(102, "yet another unrelated document mentioning blue whales")],
        ckpt,
    ) is None

    import shutil

    shutil.rmtree(ckpt)
    exc = _run(
        [(103, "post reset content that must not clobber history")],
        ckpt,
    )
    assert exc is not None and "out of sync" in str(exc), exc
    # committed partitions survived untouched
    batches = {
        r["ingest_batch"]
        for r in spark.read.parquet(index_root)
        .select("ingest_batch").distinct().collect()
    }
    assert {0, 1} <= batches, batches

    # the documented recovery: fold everything after a clean shutdown,
    # then a fresh checkpoint is legitimate (nothing to hide or clobber)
    compact_neardup_index(spark, index_root, "doc_id", keep_latest=False)
    compact_neardup_index(
        spark, pairs_root, ["id_a", "id_b"], keep_latest=False
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    assert _run(
        [(104, "fresh checkpoint over a fully folded store is fine")],
        ckpt,
    ) is None


def test_compact_neardup_index_finishes_interrupted_delete(spark, tmp_path):
    """Round-6 review fix: a crash between the resident swap and the
    batch-dir deletes leaves folded rows duplicated. The _FOLDED-<b>
    markers written into the new resident let the next invocation
    finish the deletes — and probe-visible row counts return to
    single."""
    import os
    import shutil

    from vector_io_spark.streaming.incremental import (
        compact_neardup_index,
        seed_neardup_index,
        streaming_neardup_ingest,
    )

    seed = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    index_root = str(tmp_path / "sig")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_neardup_index(seed, index_root, "doc_id", "text")

    def _run(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_neardup_ingest(
            stream, index_root, pairs_root, ckpt, "doc_id", "text"
        )
        q.awaitTermination(180)
        q.stop()

    _run([(101, "a completely different sentence about shipping crates")])
    _run([(102, "yet another unrelated document mentioning blue whales")])
    n_ids = spark.read.parquet(index_root).count()

    # emulate the crash window: batch 0 was folded into the resident
    # (marker present) but its dir delete never ran — copy it back and
    # recreate the marker
    b0 = os.path.join(index_root, "ingest_batch=0")
    stash = str(tmp_path / "stash_b0")
    shutil.copytree(b0, stash)
    compact_neardup_index(spark, index_root, "doc_id", keep_latest=False)
    assert spark.read.parquet(index_root).count() == n_ids
    shutil.copytree(stash, b0)  # stale duplicate partition reappears
    open(os.path.join(index_root, "ingest_batch=-1", "_FOLDED-0"), "w").close()
    # duplicated until repaired
    assert spark.read.parquet(index_root).count() == n_ids + 1

    stats = compact_neardup_index(
        spark, index_root, "doc_id", keep_latest=False
    )
    assert stats["partitions_after"] == 1
    assert not os.path.exists(b0)
    assert spark.read.parquet(index_root).count() == n_ids


def test_streaming_dedup_ttl_expires_state(spark, tmp_path):
    """Round-6 review fix: ProcessingTimeTimeout must actually ARM a
    timer (it previously fell through to keep-state-forever). With a
    1-second TTL: a key re-sent after an idle batch that fires its
    timeout is treated as first-seen again; an unknown timeout string
    raises instead of silently meaning NoTimeout."""
    import time

    import pytest

    from vector_io_spark.streaming.stateful import streaming_dedup_by_key

    landing = str(tmp_path / "landing")
    checkpoint = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    with pytest.raises(ValueError, match="unknown state_timeout"):
        streaming_dedup_by_key(
            spark.createDataFrame([(1, 1)], "doc_id long, seq long"),
            "doc_id", state_timeout="ProcessingTimeTimeut",
        )

    def run(rows, expect_total):
        spark.createDataFrame(rows, "doc_id long, seq long").coalesce(
            1
        ).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = (
            streaming_dedup_by_key(
                stream, "doc_id", order_col="seq",
                state_timeout="ProcessingTimeTimeout", ttl_seconds=1,
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # a timeout-armed availableNow query lingers for a timer-firing
        # trigger after the data batch, so it never self-terminates
        # inside any reasonable wait (r13: three blind 90 s waits made
        # this the single slowest test in the suite at 288 s). The
        # sink's _spark_metadata log makes batch reads see exactly the
        # COMMITTED rows, so poll the sink for the data batch's commit
        # and stop as soon as it lands; 90 s stays as the failure cap.
        deadline = time.time() + 90
        while time.time() < deadline:
            if q.awaitTermination(1):
                break
            try:
                if spark.read.parquet(out_dir).count() >= expect_total:
                    break
            except Exception:
                pass  # sink dir not committed yet
        q.stop()
        q.awaitTermination(30)

    run([(1, 10), (2, 20)], expect_total=2)
    assert spark.read.parquet(out_dir).count() == 2
    # let the timers expire, then process a batch NOT containing the
    # keys (timed-out state is released during the next micro-batch)
    time.sleep(3)
    run([(3, 30)], expect_total=3)
    # expired keys are first-seen again — the re-emit is the proof the
    # timer was ARMED and the state removed (pre-fix this run emitted
    # nothing: no setTimeoutDuration ever ran, state lived forever).
    # Within-TTL suppression itself is covered by the NoTimeout tests;
    # it cannot be pinned here because each availableNow query start
    # costs multiple seconds, so any test-viable TTL has already
    # expired by the next run.
    run([(1, 12), (2, 21)], expect_total=5)
    rows = sorted(
        (r["doc_id"], r["seq"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert rows == [(1, 10), (1, 12), (2, 20), (2, 21), (3, 30)], rows


def test_compaction_lease_guard_blocks_live_stream_and_clears_stale(
    spark, tmp_path
):
    """Round-7 (VERDICT r6 Next #6): the compaction/ingest race is a
    loud error now, not a docstring caveat. (a) compaction RAISES while
    a fresh _LIVE-<sid> lease sits in the store root (a micro-batch is
    mid-write), (b) a lease older than lease_timeout_s is a crashed
    stream's — cleared, compaction proceeds, (c) after a clean stream
    stop the last batch released its lease so compaction just works,
    and (d) a micro-batch refuses to START while a compaction
    resident-swap (.compact-aside) is in flight."""
    import os
    import time

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from vector_io_spark.streaming.incremental import (
        compact_neardup_index,
        seed_neardup_index,
        streaming_neardup_ingest,
    )

    def doc(i, text):
        return (i, text)

    seed = spark.createDataFrame(
        [doc(1, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    index_root = str(tmp_path / "sig_index")
    pairs_root = str(tmp_path / "pairs")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_neardup_index(seed, index_root, "doc_id", "text")

    def run(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_neardup_ingest(
            stream, index_root, pairs_root, ckpt, "doc_id", "text",
            threshold=0.9,
        )
        q.awaitTermination(180)
        q.stop()

    run([doc(101, "a completely different document about spark engines"),
         doc(102, "nothing like any other text in this tiny corpus here")])

    # (c) clean stop released the leases: no _LIVE-* anywhere
    assert not [f for f in os.listdir(index_root) if f.startswith("_LIVE-")]
    assert not [f for f in os.listdir(pairs_root) if f.startswith("_LIVE-")]

    # (a) a fresh lease (mid-batch stream) blocks compaction loudly
    lease = os.path.join(index_root, "_LIVE-someotherstream")
    with open(lease, "w"):
        pass
    with pytest.raises(RuntimeError, match="live ingest lease"):
        compact_neardup_index(spark, index_root, "doc_id")

    # (b) aged past the timeout = crashed stream: cleared + compaction runs
    old = time.time() - 3600
    os.utime(lease, (old, old))
    stats = compact_neardup_index(
        spark, index_root, "doc_id", keep_latest=False, lease_timeout_s=600
    )
    assert stats["folded_batches"] == 1
    assert not os.path.exists(lease)

    # probes unchanged by the guarded fold: resident holds seed + batch
    idx = spark.read.parquet(index_root)
    assert idx.count() == 3
    assert {
        r["ingest_batch"]
        for r in idx.select("ingest_batch").distinct().collect()
    } == {-1}

    # (d) a mid-swap marker refuses the next micro-batch loudly...
    aside = os.path.join(index_root, ".compact-aside")
    os.makedirs(aside)
    with pytest.raises(StreamingQueryException, match="compact-aside"):
        run([doc(201, "yet another novel document appears in the stream")])
    # ...and once the swap window is gone the replay converges
    os.rmdir(aside)
    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    q = streaming_neardup_ingest(
        stream, index_root, pairs_root, ckpt, "doc_id", "text",
        threshold=0.9,
    )
    q.awaitTermination(180)
    q.stop()
    assert spark.read.parquet(index_root).where(
        "doc_id = 201"
    ).count() == 1


def test_reseed_streaming_ivfpq_if_drifted(spark, tmp_path):
    """Round-7: the streaming store's rebuild-on-drift composition.
    (a) lease guard blocks a reseed while a batch is mid-write; (b) an
    iid batch stays under budget -> keep, store untouched; (c) a
    shifted pile-up trips the budget -> retrain from the supplied
    corpus, imbalance back under budget, batch partitions + lineage
    markers gone, counts == corpus; (d) a FRESH checkpoint lineage can
    adopt the reseeded store and keep ingesting."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from vector_io_spark.streaming.incremental import (
        reseed_ivfpq_stream_index_if_drifted,
        seed_ivfpq_stream_index,
        streaming_ivfpq_ingest,
    )

    def v(i, pattern):
        base = [0.05 * ((i + j) % 7) for j in range(8)]
        base[pattern % 8] += 3.0
        return (i, [float(x) for x in base])

    def shifted(i):
        # far from every seed pattern: all-dims offset -> one hot cell
        return (i, [9.0 + 0.01 * ((i + j) % 5) for j in range(8)])

    seed_rows = [v(i, i) for i in range(16)]
    seed = spark.createDataFrame(
        seed_rows, "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "ivfpq_stream")
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    seed_ivfpq_stream_index(
        seed, root, num_cells=4, num_subspaces=4, codebook_size=4, seed=3
    )

    def run(rows, checkpoint):
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(landing)
        schema = spark.read.parquet(landing).schema
        stream = spark.readStream.schema(schema).parquet(landing)
        q = streaming_ivfpq_ingest(stream, root, checkpoint)
        q.awaitTermination(180)
        q.stop()

    # (b) iid batch: same generator -> balanced, keep
    iid = [v(100 + i, i) for i in range(8)]
    run(iid, ckpt)
    corpus1 = spark.createDataFrame(
        seed_rows + iid, "vec_id long, embedding array<double>"
    )
    got = reseed_ivfpq_stream_index_if_drifted(
        spark, root, corpus1, imbalance_budget=3.0
    )
    assert got["rebuilt"] is False and got["nlist"] == 4
    cells = spark.read.parquet(f"{root}/cells")
    assert set(
        r["ingest_batch"]
        for r in cells.select("ingest_batch").distinct().collect()
    ) == {-1, 0}

    # (a) a fresh lease blocks the reseed loudly
    lease = os.path.join(root, "cells", "_LIVE-phantom")
    with open(lease, "w"):
        pass
    with pytest.raises(RuntimeError, match="live ingest lease"):
        reseed_ivfpq_stream_index_if_drifted(
            spark, root, corpus1, imbalance_budget=3.0
        )
    os.remove(lease)

    # (c) shifted pile-up (3x the resident count, one hot stale cell)
    drift = [shifted(1000 + i) for i in range(72)]
    run(drift, ckpt)
    corpus2 = spark.createDataFrame(
        seed_rows + iid + drift, "vec_id long, embedding array<double>"
    )
    got2 = reseed_ivfpq_stream_index_if_drifted(
        spark, root, corpus2, imbalance_budget=3.0
    )
    assert got2["rebuilt"] is True, got2
    assert got2["imbalance_before"] > 3.0, got2
    assert got2["imbalance_after"] <= 3.0, got2
    cells = spark.read.parquet(f"{root}/cells")
    assert set(
        r["ingest_batch"]
        for r in cells.select("ingest_batch").distinct().collect()
    ) == {-1}
    assert cells.count() == corpus2.count()
    assert not [
        f
        for f in os.listdir(os.path.join(root, "cells"))
        if f.startswith("_STREAM-")
    ]

    # (d) a fresh checkpoint lineage adopts the folded store cleanly
    ckpt2 = str(tmp_path / "ckpt2")
    run([v(5000, 3)], ckpt2)
    cells = spark.read.parquet(f"{root}/cells")
    assert cells.where("vec_id = 5000").count() == 1

    # (e) r7 review fix: a crashed reseed (marker present, batch
    # partitions already deleted) must FORCE the rewrite on re-run —
    # the remaining resident measures balanced, so an unforced re-run
    # would wrongly decide "keep" and serve the stale seed forever.
    # Simulate the crash state: marker + the batch partition dropped.
    import shutil

    corpus3 = spark.createDataFrame(
        seed_rows + iid + drift + [v(5000, 3)],
        "vec_id long, embedding array<double>",
    )
    marker = os.path.join(root, "cells", "_RESEED-PENDING")
    with open(marker, "w"):
        pass
    for d in os.listdir(os.path.join(root, "cells")):
        if d.startswith("ingest_batch=") and not d.endswith("=-1"):
            shutil.rmtree(os.path.join(root, "cells", d))
    # the marker also blocks new micro-batches until repaired
    with pytest.raises(Exception, match="RESEED-PENDING"):
        run([v(6000, 1)], ckpt2)
    got4 = reseed_ivfpq_stream_index_if_drifted(
        spark, root, corpus3, imbalance_budget=3.0
    )
    assert got4["rebuilt"] is True  # forced despite balanced remainder
    assert not os.path.exists(marker)
    cells = spark.read.parquet(f"{root}/cells")
    assert cells.count() == corpus3.count()
    assert set(
        r["ingest_batch"]
        for r in cells.select("ingest_batch").distinct().collect()
    ) == {-1}


def test_reseed_recheck_aborts_on_lease_taken_during_stats(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8 (medium): the reseed's entry lease-check runs BEFORE
    the imbalance-stats Spark job; a micro-batch starting during that
    scan (guard sees no marker yet, takes its lease) must be detected
    by a re-check AFTER _RESEED-PENDING is stamped — and the clean
    abort must un-stamp the marker so the store is neither forced nor
    blocked. Simulated by planting a fresh lease from inside the stats
    call. Also: a forced re-run on a crashed, row-EMPTY store (deletes
    done, overwrite not committed) must converge with
    imbalance_before=None instead of raising forever (ADVICE r8 low)."""
    import os
    import shutil

    import pytest

    from vector_io_spark.operators import similarity as sim
    from vector_io_spark.streaming.incremental import (
        reseed_ivfpq_stream_index_if_drifted,
        seed_ivfpq_stream_index,
    )

    def v(i, pattern):
        base = [0.05 * ((i + j) % 7) for j in range(8)]
        base[pattern % 8] += 3.0
        return (i, [float(x) for x in base])

    seed_rows = [v(i, i) for i in range(16)]
    corpus = spark.createDataFrame(
        seed_rows, "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "ivfpq_stream")
    seed_ivfpq_stream_index(
        corpus, root, num_cells=4, num_subspaces=4, codebook_size=4, seed=3
    )
    cells_dir = os.path.join(root, "cells")
    lease = os.path.join(cells_dir, "_LIVE-racer")
    pending = os.path.join(cells_dir, "_RESEED-PENDING")

    real_stats = sim.ivfpq_index_stats

    def stats_plants_lease(spark_, path_):
        # a micro-batch slips in while the stats scan runs
        if not os.path.exists(lease):
            with open(lease, "w"):
                pass
        return real_stats(spark_, path_)

    monkeypatch.setattr(sim, "ivfpq_index_stats", stats_plants_lease)
    # imbalance_budget=0 forces the rebuild branch on a balanced store
    with pytest.raises(RuntimeError, match="ingest lease"):
        reseed_ivfpq_stream_index_if_drifted(
            spark, root, corpus, imbalance_budget=0.0
        )
    assert not os.path.exists(pending), (
        "clean abort must un-stamp _RESEED-PENDING"
    )
    monkeypatch.setattr(sim, "ivfpq_index_stats", real_stats)
    os.remove(lease)
    # store unharmed: an unforced run still measures and keeps
    got = reseed_ivfpq_stream_index_if_drifted(
        spark, root, corpus, imbalance_budget=3.0
    )
    assert got["rebuilt"] is False

    # (g) forced recovery on a row-empty store: marker present, every
    # partition (including the resident) destroyed by the crash
    with open(pending, "w"):
        pass
    for d in os.listdir(cells_dir):
        full = os.path.join(cells_dir, d)
        if os.path.isdir(full):
            shutil.rmtree(full)
    got2 = reseed_ivfpq_stream_index_if_drifted(
        spark, root, corpus, imbalance_budget=3.0
    )
    assert got2["rebuilt"] is True
    assert got2["imbalance_before"] is None
    assert not os.path.exists(pending)
    assert spark.read.parquet(f"{root}/cells").count() == corpus.count()


def test_streaming_semantic_match_exactly_once_and_batch_twin(
    spark, sf_dir, tmp_path
):
    """Continuous threshold matching (r9): stream results must equal
    the batch range_search over the same rows (same deterministic
    kernel), replaying the checkpoint with no new input appends
    nothing (exactly-once per file), and newly landed files emit only
    their own matches. keep_cols payload rides the alert rows."""
    from vector_io_spark.operators.vectorquery import range_search
    from vector_io_spark.streaming.incremental import (
        streaming_semantic_match,
    )

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    landing = str(tmp_path / "landing")
    out_dir = str(tmp_path / "alerts")
    ck = str(tmp_path / "ck")

    first = emb.where(F.col("vec_id") < 300)
    first.coalesce(1).write.mode("append").parquet(landing)
    schema = spark.read.parquet(landing).schema

    def run():
        stream = spark.readStream.schema(schema).parquet(landing)
        matched = streaming_semantic_match(
            stream, q, min_score=0.1, keep_cols=("label",)
        )
        sq = (
            matched.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination(180)

    def rows():
        return {
            (r["query_id"], r["vec_id"], r["score"], r["label"])
            for r in spark.read.parquet(out_dir).collect()
        }

    with pytest.raises(ValueError, match="at least one"):
        streaming_semantic_match(
            spark.readStream.schema(schema).parquet(landing), q
        )

    run()
    got1 = rows()
    want1 = {
        (r["query_id"], r["vec_id"], r["score"], r["label"])
        for r in range_search(first, q, min_score=0.1)
        .join(first.select("vec_id", "label"), "vec_id")
        .collect()
    }
    assert got1 == want1 and got1

    # replay with no new files: nothing new lands
    run()
    assert rows() == got1

    # a second landed file emits exactly its own matches
    second = emb.where(F.col("vec_id") >= 300)
    second.coalesce(1).write.mode("append").parquet(landing)
    run()
    want2 = want1 | {
        (r["query_id"], r["vec_id"], r["score"], r["label"])
        for r in range_search(second, q, min_score=0.1)
        .join(second.select("vec_id", "label"), "vec_id")
        .collect()
    }
    assert rows() == want2 and len(want2) > len(want1)
