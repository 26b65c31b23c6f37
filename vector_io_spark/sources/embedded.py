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
        fname = f"shard-{uuid.uuid4().hex}.parquet"
        with _write_lock:
            batch.to_parquet(os.path.join(path, fname), index=False)


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
        if cls._failures < self.fail_first:
            cls._failures += 1
            raise ConnectionError("synthetic transient failure")
        super().upsert_batch(collection, batch)
