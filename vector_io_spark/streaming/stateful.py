"""Custom stateful streaming operators (``applyInPandasWithState``).

Spark's built-in ``dropDuplicates`` on a stream keeps ALL keys in state
forever (or needs a watermark column inside the key); this module's
dedup keeps one boolean per key and exposes the state-TTL knob directly,
the way a 100 TB ingest pipeline runs continuous exact dedup: state is
partitioned by key across executors (RocksDB/HDFS state store), each
micro-batch touches only the keys it contains, and emitted rows are the
first-seen row per key across ALL batches since the checkpoint began.

Scale notes: state size is O(distinct keys) * ~1 boolean — for content
dedup pass a 16-byte fingerprint as the key, never the document. The
grouping shuffles each micro-batch once on the key (unavoidable — that
IS the state partitioning); within a batch the Arrow transfer batches
rows per key group.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_by_key(
    stream: DataFrame,
    key_col: str,
    order_col: str | None = None,
    state_timeout: str = "NoTimeout",
    ttl_seconds: int = 3600,
) -> DataFrame:
    """Exact first-seen dedup across micro-batches.

    For each ``key_col`` value, emit one row — the first ever seen (with
    ``order_col``: the smallest by that column within the key's first
    batch; later batches never beat an existing winner, mirroring
    first-write-wins ingest). State per key is a single boolean.

    ``state_timeout``: ``"NoTimeout"`` for exact dedup over the stream's
    lifetime, or ``"ProcessingTimeTimeout"`` to let state expire after
    ``ttl_seconds`` of processing time (then dedup is exact only within
    the TTL window — the standard memory/exactness trade at web scale).
    The TTL is SLIDING: every sighting of a key re-arms its timer, so a
    hot duplicate stays suppressed while only cold keys age out. Any
    other string raises — a typo must not silently become
    keep-state-forever.
    """
    if state_timeout not in ("NoTimeout", "ProcessingTimeTimeout"):
        raise ValueError(
            f"streaming_dedup_by_key: unknown state_timeout "
            f"{state_timeout!r} (use 'NoTimeout' or "
            "'ProcessingTimeTimeout')"
        )
    out_schema = stream.schema
    use_ttl = state_timeout == "ProcessingTimeTimeout"
    ttl_ms = int(ttl_seconds) * 1000
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_ttl
        else GroupStateTimeout.NoTimeout
    )

    def first_seen(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            # TTL expiry: release the key's state so a later sighting
            # is treated as first-seen again (the documented window
            # semantics). Timed-out invocations carry no rows.
            for _ in pdfs:
                pass
            state.remove()
            return
        if state.exists:
            # Not an error swallow: applyInPandasWithState requires the
            # batch iterator to be fully consumed before returning, and
            # every row here IS a duplicate by the state check — drain
            # and emit nothing (re-arming the sliding TTL).
            for _ in pdfs:
                pass
            if use_ttl:
                state.setTimeoutDuration(ttl_ms)
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            if order_col:
                # positional argmin (first occurrence on ties — same row
                # a stable sort's head would pick) instead of an
                # O(n log n) sort of the whole chunk
                cand = pdf.iloc[[pdf[order_col].to_numpy().argmin()]]
            else:
                cand = pdf.iloc[[0]]
            if best is None:
                best = cand
            elif order_col is not None and (
                cand[order_col].iloc[0] < best[order_col].iloc[0]
            ):
                best = cand
        state.update((True,))
        if use_ttl:
            state.setTimeoutDuration(ttl_ms)
        if best is not None:
            yield best

    return stream.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Event-time sessionization across micro-batches: per user, events
    separated by more than ``gap_seconds`` split sessions; a session is
    emitted only once it CLOSES — either a later event opens the next
    session, or the event-time watermark passes (last_event + gap) and
    the state times out. This is the stateful-streaming twin of the
    batch ``operators/sessions.py::session_stats`` (same gap semantics).

    State per user is one open session: (start_us, last_us, n_events,
    value_sum) — constant bytes per active user, partitioned across
    executors by the state store; closed sessions leave state entirely.
    Late events older than the watermark are dropped by Spark before the
    operator runs (exactly the documented watermark contract).

    Out-of-order events WITHIN the watermark (arriving in a later
    micro-batch than newer events) are handled against the nearest
    session boundary: the batch is first sessionized on its own sorted
    timeline, then interval-merged with the open session — an event
    inside ``[start - gap, last + gap]`` extends via min/max (never
    regressing ``session_end_us`` or the timeout), and an event more
    than ``gap_seconds`` older than the open session's start closes as
    its own earlier session rather than polluting the current one.
    Best-effort caveat (state holds only ONE open session): such an
    earlier session is emitted at the end of the micro-batch, so a
    still-later straggler that would have merged into it starts a fresh
    session instead — the documented divergence from the batch twin,
    which sees the whole timeline at once.

    Output: (user, session_start_us, session_end_us, n_events,
    value_sum) per CLOSED session, append mode.
    """
    from pyspark.sql import functions as F

    wm = stream.withWatermark(ts_col, watermark)
    gap_us = gap_seconds * 1_000_000
    # the user column keeps ITS OWN type (string ids are common) — a
    # hardcoded long would fail mid-micro-batch at Arrow coercion
    user_type = stream.schema[user_col].dataType.simpleString()
    out_schema = (
        f"{user_col} {user_type}, session_start_us long, "
        "session_end_us long, n_events long, value_sum double"
    )

    def sessionize(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    user_col: [user],
                    "session_start_us": [start_us],
                    "session_end_us": [last_us],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values(ts_col, kind="stable")
        ts_us = (batch[ts_col].astype("int64")) // 1000  # ns -> us
        # NULL values contribute 0 (the batch twin's F.sum skips
        # NULLs; one None here would otherwise turn the running sum —
        # and every later merge — into NaN). Divergence: an all-NULL
        # session emits 0.0 where the batch twin emits NULL.
        vals = (
            batch[value_col].astype(float).fillna(0.0)
            if value_col is not None
            else pd.Series([0.0] * len(batch))
        )
        # 1. sessionize this batch on its own (sorted) timeline
        sessions: list[list] = []
        for t, v in zip(ts_us.to_numpy(), vals.to_numpy()):
            t = int(t)
            if not sessions or t - sessions[-1][1] > gap_us:
                sessions.append([t, t, 1, float(v)])
            else:
                s = sessions[-1]
                s[1] = t
                s[2] += 1
                s[3] += float(v)
        # 2. interval-merge with the open session from state: sessions
        # within gap of each other's nearest boundary coalesce with
        # min/max extents, so a straggler can never regress the open
        # session's end or land in the wrong session
        if state.exists:
            sessions.append(list(state.get))
            sessions.sort(key=lambda s: (s[0], s[1]))
            merged = [sessions[0]]
            for s in sessions[1:]:
                p = merged[-1]
                if s[0] - p[1] <= gap_us:
                    p[0] = min(p[0], s[0])
                    p[1] = max(p[1], s[1])
                    p[2] += s[2]
                    p[3] += s[3]
                else:
                    merged.append(s)
            sessions = merged
        closed = sessions[:-1]
        cur = sessions[-1]
        state.update(tuple(cur))
        # close the open session when the watermark passes last + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    user_col: [user] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "value_sum": [c[3] for c in closed],
                }
            )

    return wm.groupBy(user_col).applyInPandasWithState(
        sessionize,
        outputStructType=out_schema,
        stateStructType=(
            "start_us long, last_us long, n_events long, value_sum double"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
