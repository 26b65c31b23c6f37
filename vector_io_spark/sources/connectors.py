"""Generic connector machinery (reference SURVEY.md §2.1/§2.2/§4).

The reference hand-rolls, per connector: cursor-paginated scans, batched
upserts with batch-shrink-on-error (×2/3 with a floor), bounded retries
with exponential backoff, thread pools, and a global rate limit. Here each
is one reusable policy object, and the Spark integration is two functions:

- ``paginated_read``: N cursor partitions -> ``mapInPandas`` — each Spark
  task drives one cursor; the DataFrame is assembled distributedly (the
  reference buffers everything in one process's dicts).
- ``partitioned_upsert``: ``foreachPartition`` writer — Spark tasks replace
  the reference's ThreadPoolExecutor (qdrant_import.py:316-343); each task
  runs the same shrink/retry loop per batch.

Rate limiting under distribution: a global budget divided by the number of
partitions gives each task a local token bucket
(vertexai_vector_search_import.py:853-865's 6000/min becomes
6000/numPartitions per task) — no driver coordination needed, correct
within one task-wave, conservative across waves.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


@dataclass
class BatchShrinkPolicy:
    """Adaptive batch sizing: shrink on error, abort below
    initial/100. Two reference shapes, both expressible via
    ``shrink_factor``: ×2/3 (pinecone_import.py:267-276 and 5 other
    connectors; kdbai_import.py:225-231 gates it on the server's
    'smaller batches' message — pass ``should_shrink``) and −10%
    (astradb_export.py:249-251's ``fetch_size * 0.9`` — use
    ``shrink_factor=0.9`` with :meth:`shrunk` for read fetch sizes)."""

    initial: int = 1000
    shrink_factor: float = 2 / 3
    min_fraction: float = 0.01

    def shrunk(self, current: int) -> int:
        """One shrink step; raises once below the floor (initial ×
        min_fraction) so a persistent error can't loop forever."""
        floor = max(1, int(self.initial * self.min_fraction))
        new = int(current * self.shrink_factor)
        if new < floor or new >= current:
            raise RuntimeError(
                f"batch size {current} cannot shrink further "
                f"(floor {floor}, factor {self.shrink_factor})"
            )
        return new

    def run(
        self,
        items: list,
        send: Callable[[list], Any],
        should_shrink: Callable[[Exception], bool] | None = None,
    ) -> int:
        """Send ``items`` in adaptive batches; returns count sent.
        ``should_shrink``: only shrink on matching errors (others
        re-raise immediately — kdbai_import.py:225-231's distinction
        between 'smaller batches' and genuine failures)."""
        batch_size = self.initial
        sent = 0
        i = 0
        while i < len(items):
            batch = items[i : i + batch_size]
            try:
                send(batch)
                sent += len(batch)
                i += len(batch)
            except Exception as e:
                if should_shrink is not None and not should_shrink(e):
                    raise
                try:
                    batch_size = self.shrunk(batch_size)
                except RuntimeError as floor:
                    # surface the REAL send error (auth failure, missing
                    # collection, ...) instead of burying it under the
                    # floor message after a doomed shrink ladder
                    raise RuntimeError(
                        f"{floor} — caused by persistent send error: {e!r}"
                    ) from e
        return sent


@dataclass
class RetryPolicy:
    """Bounded exponential backoff (reembed.py:476-480: 5 attempts,
    max 10 s wait)."""

    max_attempts: int = 5
    base_wait: float = 0.5
    max_wait: float = 10.0

    def run(self, fn: Callable[[], Any]) -> Any:
        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 - connector errors are opaque
                last = e
                if attempt + 1 < self.max_attempts:
                    time.sleep(min(self.base_wait * 2**attempt, self.max_wait))
        assert last is not None
        raise last


@dataclass
class RateLimiter:
    """Token bucket: ``calls_per_minute`` budget, refilled continuously.
    Instantiate per executor task with the per-partition share of the
    global budget."""

    calls_per_minute: float
    _tokens: float = field(default=0.0, init=False)
    _last: float = field(default_factory=time.monotonic, init=False)

    def acquire(self, n: int = 1) -> None:
        rate = self.calls_per_minute / 60.0
        while True:
            now = time.monotonic()
            self._tokens = min(
                self.calls_per_minute, self._tokens + (now - self._last) * rate
            )
            self._last = now
            if self._tokens >= n:
                self._tokens -= n
                return
            time.sleep(max((n - self._tokens) / rate, 0.001))


class VectorDBConnector:
    """Connector contract (mirrors ExportVDB/ImportVDB, SURVEY.md §3).

    Subclasses implement the five primitives; the engine provides the
    distributed read/write drivers below. All methods run on executors
    except the catalog ops (driver-side DDL, §2.11).
    """

    DB_NAME_SLUG = "abstract"

    # --- catalog (driver-side) ---
    def list_collections(self) -> list[str]:
        raise NotImplementedError

    def create_collection(
        self, name: str, dimensions: int, metric: str, index_config: dict | None = None
    ) -> None:
        raise NotImplementedError

    def count(self, collection: str) -> int:
        raise NotImplementedError

    # --- scan (executor-side) ---
    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        """Split the scan into cursor descriptors (id ranges, shard ids,
        page-state seeds...). One Spark task per descriptor."""
        raise NotImplementedError

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        """Yield record batches for one cursor (scroll/pageState loop)."""
        raise NotImplementedError

    # --- upsert (executor-side) ---
    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        raise NotImplementedError


def paginated_read(
    spark: SparkSession,
    connector_factory: Callable[[], VectorDBConnector],
    collection: str,
    schema,
    parallelism: int = 32,
) -> DataFrame:
    """Distributed paginated scan: cursor descriptors -> one Spark task
    each -> ``mapInPandas`` drives the connector's scroll loop.

    ``connector_factory`` (not an instance) so each executor builds its own
    client — clients hold sockets and are not picklable. At 100 TB the
    parallelism is the number of id-range/shard cursors the DB can serve
    concurrently, not the row count.
    """
    planner = connector_factory()
    cursors = planner.plan_cursors(collection, parallelism)
    cur_df = spark.createDataFrame(
        [(i, repr(c)) for i, c in enumerate(cursors)], "cursor_id int, cursor string"
    ).repartition(max(len(cursors), 1))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import ast

        conn = connector_factory()
        for pdf in batches:
            for cur_repr in pdf["cursor"]:
                yield from conn.read_cursor(collection, ast.literal_eval(cur_repr))

    return cur_df.mapInPandas(scan, schema=schema)


def partitioned_upsert(
    df: DataFrame,
    connector_factory: Callable[[], VectorDBConnector],
    collection: str,
    batch_size: int = 1000,
    shrink: BatchShrinkPolicy | None = None,
    retry: RetryPolicy | None = None,
    rate_limit_per_minute: float | None = None,
    num_partitions: int | None = None,
    should_shrink: Callable[[Exception], bool] | None = None,
) -> int:
    """Distributed batched upsert with the reference's resilience loops.

    Returns rows written (via a Spark accumulator — the reference's running
    totals, §2.5). One connector client per partition; per-batch
    retry(shrink(send)); rate budget divided across partitions.
    ``should_shrink`` gates the shrink ladder on size-related errors
    (kdbai_import.py:225-231's 'smaller batches' distinction) — without
    it every error shrinks (the pinecone shape), which composed with
    retry means a PERSISTENT non-size error (auth, missing collection)
    pays the full retry ladder at every shrink step before surfacing;
    pass a gate when the target distinguishes size errors.

    Delivery semantics are AT-LEAST-ONCE: Spark re-runs failed/speculated
    tasks, and accumulator updates inside actions are not exactly-once
    under retries, so (a) a retried partition re-upserts its rows — safe
    iff the target's upsert is idempotent by id, which every supported DB's
    upsert-by-id is; and (b) the returned count can OVERCOUNT on retries.
    Treat the count as a diagnostic running total (that is all the
    reference's progress counters are); use ``df.count()`` when an exact
    row count is required.
    """
    shrink = shrink or BatchShrinkPolicy(initial=batch_size)
    retry = retry or RetryPolicy()
    if num_partitions:
        df = df.repartition(num_partitions)
    n_parts = df.rdd.getNumPartitions()
    acc = df.sparkSession.sparkContext.accumulator(0)
    per_task_rate = (
        rate_limit_per_minute / max(n_parts, 1) if rate_limit_per_minute else None
    )
    columns = df.columns

    def write_partition(rows: Iterator) -> None:
        conn = connector_factory()
        limiter = RateLimiter(per_task_rate) if per_task_rate else None
        buf: list = []

        def flush() -> None:
            if not buf:
                return

            def send(batch_rows: list) -> None:
                if limiter:
                    limiter.acquire()
                batch = pd.DataFrame(batch_rows, columns=columns)
                retry.run(lambda: conn.upsert_batch(collection, batch))

            sent = shrink.run(buf, send, should_shrink=should_shrink)
            acc.add(sent)
            buf.clear()

        for row in rows:
            buf.append(tuple(row))
            if len(buf) >= batch_size * 4:
                flush()
        flush()

    df.foreachPartition(write_partition)
    return acc.value
