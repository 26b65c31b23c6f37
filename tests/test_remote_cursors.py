"""Parallel cursor planning for the remote adapters (Qdrant shard keys,
Milvus partitions, Turbopuffer id ranges) and the Pinecone sweep-scan
fallback for list()-less indexes — all against driver-side fakes."""

from __future__ import annotations

from types import SimpleNamespace

import pandas as pd

from vector_io_spark.sources.remote import (
    MilvusConnector,
    PineconeConnector,
    QdrantConnector,
    TurbopufferConnector,
)


# --------------------------------------------------------------------------
# Qdrant: shard-key cursors
# --------------------------------------------------------------------------

class FakeQdrantClient:
    """Sharded store: points live in named shards; scroll honors
    shard_key_selector and offset paging."""

    PAGE = 4

    def __init__(self, shards: dict[str, list[dict]]):
        self.shards = shards

    def collection_cluster_info(self, collection):
        return SimpleNamespace(
            local_shards=[SimpleNamespace(shard_key=k) for k in self.shards],
            remote_shards=[],
        )

    def scroll(self, collection, limit, offset, with_payload, with_vectors,
               shard_key_selector=None):
        if shard_key_selector is None:
            pts = [p for ps in self.shards.values() for p in ps]
        else:
            pts = self.shards[shard_key_selector]
        pts = sorted(pts, key=lambda p: p["id"])
        start = offset or 0
        page = pts[start : start + min(limit, self.PAGE)]
        nxt = start + len(page) if start + len(page) < len(pts) else None
        return (
            [
                SimpleNamespace(id=p["id"], vector=p["vector"], payload=p.get("payload"))
                for p in page
            ],
            nxt,
        )


def test_qdrant_shard_key_cursors():
    shards = {
        f"sk{i}": [
            {"id": f"sk{i}-{j}", "vector": [float(j)], "payload": {"s": i}}
            for j in range(7)
        ]
        for i in range(3)
    }
    conn = QdrantConnector(client=FakeQdrantClient(shards))
    cursors = conn.plan_cursors("col", 8)
    assert len(cursors) == 3  # one per shard key: genuinely parallel
    assert {c["shard_key"] for c in cursors} == {"sk0", "sk1", "sk2"}
    frames = [pdf for c in cursors for pdf in conn.read_cursor("col", c)]
    got = pd.concat(frames)
    assert len(got) == 21
    assert sorted(got["id"]) == sorted(
        p["id"] for ps in shards.values() for p in ps
    )


def test_qdrant_no_shards_single_cursor():
    class NoClusterClient(FakeQdrantClient):
        def collection_cluster_info(self, collection):
            raise RuntimeError("distributed mode disabled")

    conn = QdrantConnector(client=NoClusterClient({"only": []}))
    assert conn.plan_cursors("col", 8) == [{"offset": None}]


# --------------------------------------------------------------------------
# Milvus: partition cursors
# --------------------------------------------------------------------------

class FakeMilvusIterator:
    def __init__(self, rows, batch):
        self.rows = rows
        self.batch = batch
        self.pos = 0

    def next(self):
        page = self.rows[self.pos : self.pos + self.batch]
        self.pos += len(page)
        return page

    def close(self):
        pass


class FakeMilvusCollection:
    def __init__(self, parts: dict[str, list[dict]]):
        self._parts = parts
        self.partitions = [SimpleNamespace(name=n) for n in parts]

    def query_iterator(self, batch_size, output_fields, partition_names=None):
        if partition_names:
            rows = [r for p in partition_names for r in self._parts[p]]
        else:
            rows = [r for rs in self._parts.values() for r in rs]
        return FakeMilvusIterator(rows, batch_size)


class FakeMilvusModule:
    def __init__(self, parts):
        self._col = FakeMilvusCollection(parts)

    def Collection(self, name):  # noqa: N802 - SDK surface
        return self._col


def test_milvus_partition_cursors():
    parts = {
        f"p{i}": [{"id": f"p{i}-{j}", "v": j} for j in range(5)] for i in range(4)
    }
    conn = MilvusConnector(pymilvus_module=FakeMilvusModule(parts))
    cursors = conn.plan_cursors("col", 8)
    assert len(cursors) == 4
    frames = [pdf for c in cursors for pdf in conn.read_cursor("col", c)]
    got = pd.concat(frames)
    assert sorted(got["id"]) == sorted(r["id"] for rs in parts.values() for r in rs)

    single = MilvusConnector(pymilvus_module=FakeMilvusModule({"_default": []}))
    assert single.plan_cursors("col", 8) == [{}]


# --------------------------------------------------------------------------
# Turbopuffer: id-range cursors via query-API filters
# --------------------------------------------------------------------------

class FakeTpufNamespace:
    def __init__(self, rows: dict[int, dict]):
        self.rows = rows

    def vectors(self):
        for i in sorted(self.rows):
            r = self.rows[i]
            yield SimpleNamespace(id=i, vector=r["v"], attributes=r.get("a"))

    def query(self, filters, top_k, include_vectors, include_attributes):
        # filters: ["And", [["id","Gte",lo], ["id","Lt",hi]]]
        (_, [[_, _, lo], [_, _, hi]]) = filters
        ids = sorted(i for i in self.rows if lo <= i < hi)[:top_k]
        return [
            SimpleNamespace(id=i, vector=self.rows[i]["v"], attributes=self.rows[i].get("a"))
            for i in ids
        ]


class FakeTpufModule:
    def __init__(self, rows):
        self._ns = FakeTpufNamespace(rows)

    def Namespace(self, name):  # noqa: N802 - SDK surface
        return self._ns


def test_turbopuffer_range_cursors_page_and_cover():
    rows = {i: {"v": [float(i)], "a": {"k": i % 2}} for i in range(0, 5000, 3)}
    conn = TurbopufferConnector(
        tpuf_module=FakeTpufModule(rows),
        id_ranges=[(0, 1250), (1250, 2500), (2500, 5000)],
    )
    conn.QUERY_PAGE = 100  # force multi-page pagination within ranges
    cursors = conn.plan_cursors("ns", 8)
    assert len(cursors) == 3
    frames = [pdf for c in cursors for pdf in conn.read_cursor("ns", c)]
    got = pd.concat(frames)
    assert sorted(got["id"]) == sorted(rows)  # disjoint + complete
    assert len(got) == len(set(got["id"]))   # no duplicates across pages

    plain = TurbopufferConnector(tpuf_module=FakeTpufModule(rows))
    assert plain.plan_cursors("ns", 8) == [{}]


# --------------------------------------------------------------------------
# Pinecone: sweep-scan fallback
# --------------------------------------------------------------------------

class FakePodIndex:
    """A pod-style index: list() raises; query/fetch/upsert work and
    honor the marker metadata filter."""

    def __init__(self, store: dict[str, dict], dims: int = 4):
        self.store = store  # id -> {"values": [...], "metadata": {...}}
        self.dims = dims

    def list(self, namespace=""):
        raise RuntimeError("list is not supported on pod indexes")

    def describe_index_stats(self):
        return {"dimension": self.dims, "total_vector_count": len(self.store)}

    def query(self, vector, top_k, filter, include_values):
        [(marker, cond)] = list(filter.items())
        assert cond == {"$ne": True}
        matches = [
            {"id": i}
            for i, v in sorted(self.store.items())
            if (v.get("metadata") or {}).get(marker) is not True
        ][:top_k]
        return {"matches": matches}

    def fetch(self, ids):
        return SimpleNamespace(
            vectors={
                i: SimpleNamespace(
                    id=i,
                    values=self.store[i]["values"],
                    metadata=dict(self.store[i].get("metadata") or {}),
                    sparse_values=None,
                )
                for i in ids
                if i in self.store
            }
        )

    def upsert(self, vectors):
        for v in vectors:
            self.store[v["id"]] = {
                "values": list(v["values"]),
                "metadata": dict(v.get("metadata") or {}),
            }
        return SimpleNamespace(upserted_count=len(vectors))


class FakePodPinecone:
    def __init__(self, index):
        self._index = index

    def Index(self, name):  # noqa: N802 - SDK surface
        return self._index


def test_pinecone_sweep_fallback_scans_everything_and_unmarks():
    store = {
        f"v{i:03d}": {"values": [float(i)] * 4, "metadata": {"tag": f"t{i % 3}"}}
        for i in range(25)
    }
    index = FakePodIndex(store)
    index_small_k = index
    conn = PineconeConnector(client=FakePodPinecone(index_small_k))
    conn.PINECONE_MAX_K = 7   # force multiple sweep rounds
    conn.MAX_FETCH_SIZE = 5   # force chunked fetch/mark

    cursors = conn.plan_cursors("idx", 8)
    assert cursors == [{"sweep": True}]  # list() refused -> single sweep

    frames = list(conn.read_cursor("idx", cursors[0]))
    got = pd.concat(frames)
    assert sorted(got["id"]) == sorted(store)
    assert len(got) == len(set(got["id"]))  # each vector exactly once
    # original metadata came through
    assert set(got["tag"]) == {"t0", "t1", "t2"}
    # unmark pass removed every sweep marker
    for v in store.values():
        assert not any(
            k.startswith("exported_vectorio_") for k in v["metadata"]
        ), v
        assert "tag" in v["metadata"]  # original metadata preserved


def test_pinecone_list_path_still_preferred():
    class ListableIndex(FakePodIndex):
        def list(self, namespace=""):
            yield [i for i in sorted(self.store)]

    conn = PineconeConnector(client=FakePodPinecone(ListableIndex({"a": {"values": [1.0]}})))
    cursors = conn.plan_cursors("idx", 3)
    assert len(cursors) == 3 and all("sweep" not in c for c in cursors)


def test_lancedb_schema_evolution_defaults():
    """Batch columns the table lacks are added with per-dtype defaults
    (reference lancedb_import.py:116-128,155-166) before the add."""
    import pandas as pd

    from vector_io_spark.sources.remote import (
        LanceDBConnector, lancedb_default_value,
    )

    assert lancedb_default_value(pd.Series(["x"]).dtype) == ""
    assert lancedb_default_value(pd.Series([1]).dtype) == 0
    assert lancedb_default_value(pd.Series([1.5]).dtype) == 0.0
    assert lancedb_default_value(pd.Series([True]).dtype) is False
    assert lancedb_default_value(pd.Series([pd.Timestamp("2024-01-01")]).dtype) is None

    class FakeField:
        def __init__(self, name):
            self.name = name

    class FakeTable:
        def __init__(self):
            self.schema = [FakeField("id"), FakeField("vector")]
            self.added_columns = {}
            self.batches = []

        def add_columns(self, mapping):
            self.added_columns.update(mapping)

        def add(self, batch):
            self.batches.append(batch)

    class FakeDB:
        def __init__(self, table):
            self._t = table

        def table_names(self):
            return ["docs"]

        def open_table(self, name):
            return self._t

    conn = LanceDBConnector.__new__(LanceDBConnector)
    tbl = FakeTable()
    conn.db = FakeDB(tbl)
    batch = pd.DataFrame({"id": [1], "vector": [[0.1]], "lang": ["en"], "n": [3]})
    conn.upsert_batch("docs", batch)
    assert tbl.added_columns == {"lang": "''", "n": "0"}
    assert len(tbl.batches) == 1


def test_qdrant_index_config_full_replay():
    """All six exported index_config sections reach create
    (qdrant_import.py:210-248), plus on_disk from params.vectors."""
    from vector_io_spark.sources.remote import QdrantConnector

    captured = {}

    class FakeClient:
        def recreate_collection(self, collection_name, vectors_config, **kw):
            captured["name"] = collection_name
            captured["vectors_config"] = vectors_config
            captured.update(kw)

    conn = QdrantConnector(client=FakeClient())
    cfg = {
        "params": {"vectors": {"on_disk": True}},
        "hnsw_config": {"m": 32, "ef_construct": 256},
        "optimizers_config": {"indexing_threshold": 10000},
        "wal_config": {"wal_capacity_mb": 64},
        "quantization_config": {"scalar": {"type": "int8"}},
        "on_disk_payload": True,
        "sparse_vectors_config": {"text": {"index": {"on_disk": False}}},
    }
    conn.create_collection("c1", 64, "cosine", index_config=cfg)
    assert captured["name"] == "c1"
    assert captured["vectors_config"]["on_disk"] is True
    for k in QdrantConnector.REPLAYED_CONFIGS:
        assert captured[k] == cfg[k], k


def test_pinecone_spec_replay_serverless_and_pod():
    from vector_io_spark.sources.remote import PineconeConnector

    calls = []

    class FakeClient:
        def create_index(self, name, dimension, metric, spec):
            calls.append((name, dimension, metric, spec))

    conn = PineconeConnector.__new__(PineconeConnector)
    conn.client = FakeClient()
    conn.create_collection("a", 64, "Cosine",
                           {"serverless": {"cloud": "gcp", "region": "eu-west4"}})
    conn.create_collection("b", 32, "dotproduct", {"pod": {"environment": "us-west1-gcp"}})
    conn.create_collection("c", 16, "euclidean", None)
    assert calls[0] == ("a", 64, "cosine", {"cloud": "gcp", "region": "eu-west4"})
    assert calls[1] == ("b", 32, "dotproduct",
                        {"environment": "us-west1-gcp", "pod_type": "starter"})
    assert calls[2] == ("c", 16, "euclidean", {"cloud": "aws", "region": "us-east-1"})
