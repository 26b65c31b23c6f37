"""Embedded file-backed vector store — the test double for remote
connectors.

Plays the role the reference's 10 remote DBs play, with the same surface
(collections, metric+dims DDL, paginated scroll reads, batched upserts
with last-write-wins id semantics) but backed by a local directory of
parquet shards, so the full connector machinery (cursor planning,
mapInPandas scan, foreachPartition upsert, shrink/retry/rate-limit) runs
end-to-end in tests with zero services.

Storage layout:  <root>/<collection>/_config.json + shard-<k>.parquet
(one shard per upsert batch; reads scroll shard-by-shard; dedup-by-id on
read gives upsert semantics with later shards winning).
"""

from __future__ import annotations

import glob
import json
import os
import threading
import time
import uuid
from collections.abc import Iterator

import pandas as pd

from vector_io_spark.sources.connectors import VectorDBConnector

_write_lock = threading.Lock()  # local-mode executors are threads


class EmbeddedVectorDB(VectorDBConnector):
    DB_NAME_SLUG = "embedded"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- catalog -----------------------------------------------------------
    def list_collections(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

    def create_collection(
        self, name: str, dimensions: int, metric: str, index_config: dict | None = None
    ) -> None:
        path = os.path.join(self.root, name)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "_config.json"), "w") as f:
            json.dump(
                {
                    "dimensions": dimensions,
                    "metric": metric,
                    "index_config": index_config or {},
                },
                f,
            )

    def collection_config(self, name: str) -> dict:
        with open(os.path.join(self.root, name, "_config.json")) as f:
            return json.load(f)

    def _shards(self, collection: str) -> list[str]:
        return sorted(glob.glob(os.path.join(self.root, collection, "shard-*.parquet")))

    def count(self, collection: str) -> int:
        shards = self._shards(collection)
        if not shards:
            return 0
        frames = [pd.read_parquet(s, columns=["id"]) for s in shards]
        return int(pd.concat(frames)["id"].nunique())

    # --- scan --------------------------------------------------------------
    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        """One cursor per shard-stride: cursor i reads shards i, i+P, ..."""
        n = len(self._shards(collection))
        stride = min(parallelism, n) or 1
        return [{"start": i, "stride": stride} for i in range(stride)]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        shards = self._shards(collection)
        for i in range(cursor["start"], len(shards), cursor["stride"]):
            yield pd.read_parquet(shards[i])

    # --- upsert ------------------------------------------------------------
    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        path = os.path.join(self.root, collection)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"collection {collection!r} does not exist")
        # monotonic time prefix: shards are consumed in sorted() name
        # order, so last-write-wins semantics need names that sort in
        # WRITE order — bare uuid names sort randomly, resolving an
        # upsert-then-upsert of the same id to a coin flip. The uuid
        # suffix keeps concurrent same-nanosecond writers collision-free
        # (their mutual order is arbitrary, as concurrent writes are).
        fname = f"shard-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.parquet"
        with _write_lock:
            batch.to_parquet(os.path.join(path, fname), index=False)


class EmbeddedVertexAIClient:
    """File-backed fake of the Vertex AI index-client surface
    ``VertexAIVectorSearchConnector`` uses (upsert_datapoints /
    find_neighbors sweep / read_index_datapoints) — same role as
    :class:`EmbeddedVectorDB` but speaking the Vertex shapes, so the
    connector's DDL synthesis, datapoint building, id-sweep cursor
    planning and rate/batch behavior all run end-to-end in tests.
    Upsert calls append wall-clock timestamps to ``calls.log`` so tests
    can assert the rate-limited call cadence."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    # --- catalog ---
    def list_indexes(self):
        from types import SimpleNamespace

        return [
            SimpleNamespace(display_name=d)
            for d in sorted(os.listdir(self.root))
            if os.path.isdir(self._dir(d))
        ]

    def create_index(self, name: str, metadata: dict) -> None:
        os.makedirs(self._dir(name), exist_ok=True)
        with open(os.path.join(self._dir(name), "_meta.json"), "w") as f:
            json.dump(metadata, f)

    def index_metadata(self, name: str) -> dict:
        with open(os.path.join(self._dir(name), "_meta.json")) as f:
            return json.load(f)

    def index_dims(self, name: str) -> int:
        return self.index_metadata(name)["config"]["dimensions"]

    def _points(self, name: str) -> dict[str, dict]:
        points: dict[str, dict] = {}
        for shard in sorted(glob.glob(os.path.join(self._dir(name), "dp-*.jsonl"))):
            with open(shard) as f:
                for line in f:
                    dp = json.loads(line)
                    points[dp["datapoint_id"]] = dp  # last write wins
        return points

    def index_stats(self, name: str) -> dict:
        return {"vectorsCount": len(self._points(name))}

    # --- export surface ---
    def find_neighbor_ids(self, name: str, query, num_neighbors: int) -> list[str]:
        # the zero-vector sweep returns every datapoint id
        return sorted(self._points(name))[:num_neighbors]

    def read_index_datapoints(self, name: str, ids: list[str]) -> list[dict]:
        points = self._points(name)
        return [points[i] for i in ids if i in points]

    # --- import surface ---
    def upsert_datapoints(self, index: str, datapoints: list[dict]) -> None:
        import time

        path = self._dir(index)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"index {index!r} does not exist")
        with _write_lock:
            with open(os.path.join(path, "calls.log"), "a") as f:
                f.write(f"{time.monotonic()}\n")
            # same write-order naming contract as EmbeddedVectorDB
            # shards: _points' "last write wins" iterates sorted names
            fname = f"dp-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.jsonl"
            with open(os.path.join(path, fname), "w") as f:
                for dp in datapoints:
                    f.write(json.dumps(dp) + "\n")

    def upsert_call_times(self, index: str) -> list[float]:
        log = os.path.join(self._dir(index), "calls.log")
        if not os.path.exists(log):
            return []
        with open(log) as f:
            return [float(x) for x in f.read().split()]


class FlakyEmbeddedVectorDB(EmbeddedVectorDB):
    """Fails the first ``fail_first`` upserts per process — exercises the
    shrink/retry loops exactly as a rate-limited remote DB would."""

    DB_NAME_SLUG = "embedded_flaky"
    _failures = 0

    def __init__(self, root: str, fail_first: int = 2):
        super().__init__(root)
        self.fail_first = fail_first

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        cls = FlakyEmbeddedVectorDB
        with _write_lock:
            # check+increment under the lock: local-mode executors are
            # THREADS, and a racy read could mint fail_first+1 synthetic
            # failures, exhausting a retry policy sized exactly to it
            should_fail = cls._failures < self.fail_first
            if should_fail:
                cls._failures += 1
        if should_fail:
            raise ConnectionError("synthetic transient failure")
        super().upsert_batch(collection, batch)
