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
) -> DataFrame:
    """Exact first-seen dedup across micro-batches.

    For each ``key_col`` value, emit one row — the first ever seen (with
    ``order_col``: the smallest by that column within the key's first
    batch; later batches never beat an existing winner, mirroring
    first-write-wins ingest). State per key is a single boolean.

    ``state_timeout``: ``"NoTimeout"`` for exact dedup over the stream's
    lifetime, or ``"ProcessingTimeTimeout"`` to let state expire (then
    dedup is exact only within the TTL window — the standard memory/
    exactness trade at web scale).
    """
    out_schema = stream.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout == "ProcessingTimeTimeout"
        else GroupStateTimeout.NoTimeout
    )

    def first_seen(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain — all rows for this key are dups
                pass
            return
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = (
                pdf.sort_values(order_col, kind="stable").iloc[[0]]
                if order_col
                else pdf.iloc[[0]]
            )
            if best is None:
                best = cand
            elif order_col is not None and (
                cand[order_col].iloc[0] < best[order_col].iloc[0]
            ):
                best = cand
        state.update((True,))
        if best is not None:
            yield best

    return stream.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
