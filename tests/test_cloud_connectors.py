"""Cloud connector adapters (Vertex AI, AstraDB JSON/CQL, KDB.AI, Vespa,
Weaviate) exercised against fakes: DDL synthesis, datapoint building,
paging/slicing cursor plans, shrink loops, and — for Vertex AI — the full
Spark read/write machinery with rate-limited upserts."""

from __future__ import annotations

import math
import re
import time
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import load
from vector_io_spark.sources.connectors import (
    BatchShrinkPolicy,
    paginated_read,
    partitioned_upsert,
)
from vector_io_spark.sources.embedded import EmbeddedVertexAIClient
from vector_io_spark.sources.remote_cloud import (
    AstraDBCqlConnector,
    AstraDBJsonConnector,
    KDBAIConnector,
    VespaConnector,
    WeaviateConnector,
    VertexAIVectorSearchConnector,
    build_datapoints,
    build_tree_ah_index_metadata,
    clean_documents,
    cql_token_ranges,
    kdb_schema_from_arrow,
)


# --------------------------------------------------------------------------
# Vertex AI
# --------------------------------------------------------------------------

def test_tree_ah_index_metadata_shape():
    meta = build_tree_ah_index_metadata(
        "idx", dimensions=64, approximate_neighbors_count=150,
        leaf_node_embedding_count=500, leaf_nodes_to_search_percent=7,
        distance_measure_type="COSINE_DISTANCE", shard_size="SHARD_SIZE_SMALL",
        project_id="p1",
    )
    cfg = meta["config"]
    assert cfg["dimensions"] == 64
    assert cfg["approximateNeighborsCount"] == 150
    assert cfg["distanceMeasureType"] == "COSINE_DISTANCE"
    assert cfg["algorithmConfig"]["treeAhConfig"] == {
        "leafNodeEmbeddingCount": 500,
        "leafNodesToSearchPercent": 7,
    }
    assert cfg["shardSize"] == "SHARD_SIZE_SMALL"
    assert meta["labels"] == {"project": "p1", "tag": "vectorio-import"}


def test_build_datapoints_restricts_numeric_crowding():
    batch = pd.DataFrame(
        {
            "id": [1, 2],
            "vector": [[1.0, 2.0], [3.0, 4.0]],
            "color": ["red", "blue"],
            "banned": ["x", "y"],
            "price": [9.5, 7.25],
            "group": ["a", "b"],
        }
    )
    dps = build_datapoints(
        batch,
        restrict_entries=[
            {"namespace": "color", "allow_list": ["color"], "deny_list": ["banned"]}
        ],
        numeric_restrict_entries=[
            {"namespace": "price", "data_type": "value_double"}
        ],
        crowding_col="group",
    )
    assert dps[0]["datapoint_id"] == "1"
    assert dps[0]["feature_vector"] == [1.0, 2.0]
    assert dps[0]["restricts"] == [
        {"namespace": "color", "allow_list": ["red"], "deny_list": ["x"]}
    ]
    assert dps[1]["numeric_restricts"] == [
        {"namespace": "price", "value_double": 7.25}
    ]
    assert dps[1]["crowding_tag"] == {"crowding_attribute": "b"}
    # without options, no restrict keys at all
    bare = build_datapoints(batch)
    assert "restricts" not in bare[0] and "crowding_tag" not in bare[0]


def test_vertexai_roundtrip_spark(spark, sf_dir, tmp_path):
    """Full distributed path: TreeAH DDL -> rate-limited batched upserts
    through foreachPartition -> id-sweep cursor plan -> parallel
    read_index_datapoints scan; restrict columns come back as metadata."""
    root = str(tmp_path / "vx")
    factory = lambda: VertexAIVectorSearchConnector(  # noqa: E731
        client=EmbeddedVertexAIClient(root),
        restrict_entries=[{"namespace": "label", "allow_list": ["label"]}],
    )
    conn = factory()
    conn.create_collection("idx", 64, "cosine")
    assert [i.display_name for i in conn.client.list_indexes()] == ["idx"]
    meta = conn.client.index_metadata("idx")
    assert meta["config"]["distanceMeasureType"] == "COSINE_DISTANCE"
    assert meta["config"]["algorithmConfig"]["treeAhConfig"][
        "leafNodeEmbeddingCount"
    ] == 1000

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        F.col("label").cast("string").alias("label"),
    )
    n_rows = emb.count()
    n = partitioned_upsert(
        emb,
        factory,
        "idx",
        batch_size=VertexAIVectorSearchConnector.UPSERT_BATCH,
        num_partitions=2,
        rate_limit_per_minute=VertexAIVectorSearchConnector.REQUESTS_PER_MINUTE,
    )
    assert n == n_rows
    assert conn.count("idx") == n_rows
    # batched calls actually happened (>= rows/batch)
    calls = conn.client.upsert_call_times("idx")
    assert len(calls) >= math.ceil(n_rows / 100 / 2)

    cursors = conn.plan_cursors("idx", 4)
    assert len(cursors) == 4
    all_ids = [i for c in cursors for i in c["ids"]]
    assert len(all_ids) == len(set(all_ids)) == n_rows

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("vector", T.ArrayType(T.DoubleType())),
            T.StructField("label", T.ArrayType(T.StringType())),
        ]
    )
    back = paginated_read(spark, factory, "idx", schema, parallelism=4)
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == n_rows
    orig = {r["id"]: r for r in emb.collect()}
    probe = next(iter(orig))
    assert rows[probe]["label"] == [orig[probe]["label"]]
    assert rows[probe]["vector"] == pytest.approx(
        [float(x) for x in orig[probe]["vector"]]
    )


def test_vertexai_rate_limit_throttles_upserts(tmp_path):
    """Driver-side cadence check: a 600/min budget (10/s) across 5 calls
    must take >= ~0.4 s — the connector is the RateLimiter's consumer."""
    from vector_io_spark.sources.connectors import RateLimiter

    root = str(tmp_path / "vx_rate")
    conn = VertexAIVectorSearchConnector(client=EmbeddedVertexAIClient(root))
    conn.create_collection("idx", 2, "dotproduct")
    limiter = RateLimiter(calls_per_minute=600)
    batch = pd.DataFrame({"id": ["a", "b"], "vector": [[1.0, 0.0], [0.0, 1.0]]})
    t0 = time.monotonic()
    for _ in range(5):
        limiter.acquire()
        conn.upsert_batch("idx", batch)
    assert time.monotonic() - t0 >= 0.3
    assert len(conn.client.upsert_call_times("idx")) == 5


# --------------------------------------------------------------------------
# AstraDB JSON API
# --------------------------------------------------------------------------

class FakeAstraCollection:
    PAGE = 3

    def __init__(self, store: dict):
        self.store = store  # id -> doc

    def find(self, sort=None, options=None):
        docs = sorted(self.store.values(), key=lambda d: d["_id"])
        start = int((options or {}).get("pageState") or 0)
        page = docs[start : start + self.PAGE]
        nxt = start + self.PAGE if start + self.PAGE < len(docs) else None
        return {"data": {"documents": page, "nextPageState": nxt}}

    def insert_many(self, documents):
        for d in documents:
            assert not any(
                isinstance(v, float) and math.isnan(v) for v in d.values()
            ), "NaN reached the JSON API"
            self.store[d["_id"]] = d

    def count_documents(self):
        return {"status": {"count": len(self.store)}}


class FakeAstraDB:
    def __init__(self):
        self.collections: dict[str, dict] = {}
        self.configs: dict[str, dict] = {}

    def get_collections(self):
        return {"status": {"collections": sorted(self.collections)}}

    def create_collection(self, name, dimension=None, metric=None):
        self.collections.setdefault(name, {})
        self.configs[name] = {"dimension": dimension, "metric": metric}

    def collection(self, name):
        return FakeAstraCollection(self.collections[name])


def test_astradb_json_connector():
    db = FakeAstraDB()
    conn = AstraDBJsonConnector(client=db)
    conn.create_collection("col", 4, "Cosine")
    assert conn.list_collections() == ["col"]
    assert db.configs["col"] == {"dimension": 4, "metric": "cosine"}

    batch = pd.DataFrame(
        {
            "id": [f"d{i}" for i in range(8)],
            "vector": [[float(i), 0.0] for i in range(8)],
            "score": [1.0, float("nan")] * 4,  # NaN must be cleaned
        }
    )
    conn.upsert_batch("col", batch)
    assert conn.count("col") == 8
    assert db.collections["col"]["d1"]["score"] is None  # NaN -> null
    assert db.collections["col"]["d0"]["$vector"] == [0.0, 0.0]

    [cur] = conn.plan_cursors("col", 8)  # JSON API: one pageState chain
    pages = list(conn.read_cursor("col", cur))
    assert len(pages) == 3  # 8 docs / page 3
    got = pd.concat(pages)
    assert sorted(got["id"]) == sorted(batch["id"])
    assert list(got.columns) == ["id", "vector", "score"]


def test_clean_documents():
    docs = [{"a": float("nan"), "b": 1.0, "c": "x"}]
    assert clean_documents(docs)[0] == {"a": None, "b": 1.0, "c": "x"}


# --------------------------------------------------------------------------
# AstraDB CQL
# --------------------------------------------------------------------------

def _fake_token(doc_id: str) -> int:
    import hashlib

    h = hashlib.md5(doc_id.encode()).digest()
    return int.from_bytes(h[:8], "big", signed=True)


class FakeCqlResultSet:
    def __init__(self, rows, paging_state=None):
        self._rows = rows
        self.paging_state = paging_state

    @property
    def current_rows(self):
        # the real ResultSet's THIS-page view (iteration auto-pages)
        return self._rows

    def __iter__(self):
        return iter(self._rows)

    def one(self):
        return self._rows[0]


class FakeCqlRow:
    def __init__(self, doc_json):
        self.doc_json = doc_json


class FakeCqlSession:
    """Speaks the REAL cassandra-driver execute contract: fetch_size
    rides on the statement object (never an execute kwarg), the result
    exposes current_rows for the page, and INSERTs bind %s parameters.
    Rejects fetch sizes above ``max_fetch`` to exercise the -10% shrink
    loop."""

    def __init__(self, docs: dict[str, dict], max_fetch: int = 10_000):
        self.docs = docs
        self.max_fetch = max_fetch
        self.statements: list[str] = []
        self.parameters: list[tuple] = []
        self.used_fetch_sizes: list[int] = []

    def execute(self, stmt, parameters=None, paging_state=None, **_):
        import json as _json

        if isinstance(stmt, str):
            query, fetch_size = stmt, None
        else:
            # statement object (SimpleStatement shape)
            query = stmt.query_string
            fetch_size = stmt.fetch_size
        self.statements.append(query)
        if parameters is not None:
            self.parameters.append(tuple(parameters))
        if query.startswith("SELECT table_name"):
            return FakeCqlResultSet([("t1",)])
        if query.startswith("SELECT COUNT"):
            return FakeCqlResultSet([(len(self.docs),)])
        if query.startswith(("CREATE TABLE", "INSERT INTO")):
            return FakeCqlResultSet([])
        m = re.search(r"token\(id\) >= (-?\d+) AND token\(id\) < (-?\d+)", query)
        assert m, query
        if fetch_size > self.max_fetch:
            raise RuntimeError("frame size too large")
        self.used_fetch_sizes.append(fetch_size)
        lo, hi = int(m.group(1)), int(m.group(2))
        in_range = sorted(
            (d for i, d in self.docs.items() if lo <= _fake_token(i) < hi),
            key=lambda d: d["_id"],
        )
        start = int(paging_state or 0)
        page = in_range[start : start + fetch_size]
        nxt = start + fetch_size if start + fetch_size < len(in_range) else None
        return FakeCqlResultSet(
            [FakeCqlRow(_json.dumps(d)) for d in page], paging_state=nxt
        )


def test_cql_token_ranges_partition_the_ring():
    ranges = cql_token_ranges(7)
    assert ranges[0][0] == -(2**63) and ranges[-1][1] == 2**63
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert b == c and a < b
    assert len(ranges) == 7


def test_astradb_cql_scan_parallel_and_shrink():
    docs = {
        f"id{i}": {"_id": f"id{i}", "$vector": [float(i)], "tag": i % 3}
        for i in range(50)
    }
    sess = FakeCqlSession(docs, max_fetch=9500)  # force one -10% shrink
    conn = AstraDBCqlConnector(session=sess)
    assert conn.list_collections() == ["t1"]
    assert conn.count("t1") == 50

    cursors = conn.plan_cursors("t1", 4)
    assert len(cursors) == 4
    frames = [
        pdf for cur in cursors for pdf in conn.read_cursor("t1", cur)
    ]
    got = pd.concat(frames)
    # token ranges are disjoint and complete
    assert sorted(got["id"]) == sorted(docs)
    # fetch size shrank 10000 -> 9000 and succeeded there
    assert set(sess.used_fetch_sizes) == {9000}

    conn.create_collection("t2", 8, "cosine")
    assert any(
        'vector<float,8>' in s for s in sess.statements if "CREATE" in s
    )
    conn.upsert_batch(
        "t2",
        pd.DataFrame({"id": ["a"], "vector": [[1.0, 2.0]], "k": ["x'y"]}),
    )
    ins = [s for s in sess.statements if s.startswith("INSERT")]
    # parameterized binding: placeholders in the statement, values
    # (including the quote-bearing metadata string) ride as parameters
    assert len(ins) == 1 and ins[0].count("%s") == 3, ins
    assert sess.parameters == [("a", [1.0, 2.0], "x'y")], sess.parameters


def test_shrink_policy_fractional_and_predicate():
    p = BatchShrinkPolicy(initial=10_000, shrink_factor=0.9)
    assert p.shrunk(10_000) == 9000
    assert p.shrunk(9000) == 8100
    with pytest.raises(RuntimeError):
        p.shrunk(100)  # below floor (1% of initial)

    # should_shrink gates which errors shrink vs re-raise
    sent = []

    def send(batch):
        if len(batch) > 2:
            raise ValueError("please use smaller batches")
        sent.append(len(batch))

    n = BatchShrinkPolicy(initial=8).run(
        list(range(8)), send, should_shrink=lambda e: "smaller batches" in str(e)
    )
    assert n == 8 and max(sent) <= 2

    with pytest.raises(KeyError):
        BatchShrinkPolicy(initial=8).run(
            list(range(8)),
            lambda b: (_ for _ in ()).throw(KeyError("schema mismatch")),
            should_shrink=lambda e: "smaller batches" in str(e),
        )


# --------------------------------------------------------------------------
# KDB.AI
# --------------------------------------------------------------------------

def test_kdb_schema_from_arrow():
    schema, drop = kdb_schema_from_arrow(
        fields=[
            ("id", "string"),
            ("my-col.x", "double"),
            ("n", "int64"),
            ("vec", "list<item: float>"),
            ("vec2", "list<item: float>"),
        ],
        vector_col="vec",
        dims=16,
        metric="CS",
        index_type="Flat",
        all_vector_cols=["vec", "vec2"],
    )
    cols = {c["name"]: c for c in schema["columns"]}
    assert cols["vec"]["vectorIndex"] == {"dims": 16, "metric": "CS", "type": "flat"}
    assert cols["id"]["pytype"] == "str"          # string -> str
    assert cols["my_col_x"]["pytype"] == "float64"  # double -> float64, name compliant
    assert cols["n"]["pytype"] == "int64"
    assert "vec2" not in cols and drop == ["vec2"]  # extra vector col dropped


class FakeKdbTable:
    def __init__(self, max_batch: int):
        self.max_batch = max_batch
        self.frames: list[pd.DataFrame] = []

    def insert(self, chunk: pd.DataFrame):
        if len(chunk) > self.max_batch:
            raise RuntimeError("Please use smaller batches")
        self.frames.append(chunk)

    def query(self):
        return pd.concat(self.frames) if self.frames else pd.DataFrame()


class FakeKdbSession:
    def __init__(self, max_batch: int = 3000):
        self.tables: dict[str, FakeKdbTable] = {}
        self.schemas: dict[str, dict] = {}
        self.max_batch = max_batch

    def list(self):
        return sorted(self.tables)

    def create_table(self, name, schema):
        self.tables[name] = FakeKdbTable(self.max_batch)
        self.schemas[name] = schema
        return self.tables[name]

    def table(self, name):
        return self.tables[name]


def test_kdbai_connector_insert_shrink_and_export():
    sess = FakeKdbSession(max_batch=3000)
    conn = KDBAIConnector(session=sess)
    conn.create_collection(
        "tab", 8, "L2",
        index_config={"fields": [("id", "string"), ("v", "double")],
                      "vector_col": "vec"},
    )
    assert "tab" in sess.list()
    assert sess.schemas["tab"]["columns"][0]["vectorIndex"]["dims"] == 8

    n = 10_000
    batch = pd.DataFrame(
        {"id": [str(i) for i in range(n)], "vec": [[1.0] * 8] * n,
         "v": [float(i) for i in range(n)]}
    )
    conn.upsert_batch("tab", batch)
    # shrink 10000 -> 6666 -> 4444 -> 2962 (only on 'smaller batches')
    assert max(len(f) for f in sess.tables["tab"].frames) <= 3000
    assert sum(len(f) for f in sess.tables["tab"].frames) == n
    assert conn.count("tab") == n
    [cur] = conn.plan_cursors("tab", 4)
    [got] = list(conn.read_cursor("tab", cur))
    assert len(got) == n


# --------------------------------------------------------------------------
# Vespa
# --------------------------------------------------------------------------

class FakeVespaResponse:
    def __init__(self, body, status=200):
        self._body = body
        self.status_code = status

    def json(self):
        return self._body

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")


class FakeVespaHttp:
    """Serves /document/v1 visits with slices/sliceId + continuation."""

    PAGE = 4

    def __init__(self, docs: dict[str, dict]):
        self.docs = docs
        self.posts: list[tuple[str, dict]] = []

    def get(self, url):
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(url).query)
        slices = int(q["slices"][0])
        slice_id = int(q["sliceId"][0])
        start = int(q.get("continuation", ["0"])[0])
        mine = sorted(
            i for i in self.docs
            if int.from_bytes(i.encode()[-4:], "big") % slices == slice_id
        )
        page = mine[start : start + self.PAGE]
        body = {
            "documents": [
                {"id": f"id:ns:doc::{i}", "fields": self.docs[i]} for i in page
            ],
        }
        if start + self.PAGE < len(mine):
            body["continuation"] = str(start + self.PAGE)
        return FakeVespaResponse(body)

    def post(self, url, json=None):
        self.posts.append((url, json))
        return FakeVespaResponse({})


def test_vespa_sliced_visit_scan_and_feed():
    docs = {f"doc{i}": {"text": f"t{i}", "rank": i} for i in range(25)}
    conn = VespaConnector(document_url="http://vespa:8080", http_client=FakeVespaHttp(docs))
    cursors = conn.plan_cursors("mydoc", 3)
    assert [c["slice_id"] for c in cursors] == [0, 1, 2]
    frames = [pdf for c in cursors for pdf in conn.read_cursor("mydoc", c)]
    got = pd.concat(frames)
    assert sorted(got["id"]) == sorted(docs)          # slices disjoint+complete
    assert set(got.columns) == {"id", "text", "rank"}
    assert conn.count("mydoc") == 25

    conn.upsert_batch("mydoc", pd.DataFrame({"id": ["x1"], "text": ["hello"]}))
    [(url, payload)] = conn.http.posts
    assert url.endswith("/document/v1/mydoc/mydoc/docid/x1")
    assert payload == {"fields": {"text": "hello"}}

    with pytest.raises(NotImplementedError):
        conn.create_collection("x", 2, "cosine")  # schemas are deploy-time


# --------------------------------------------------------------------------
# Weaviate
# --------------------------------------------------------------------------

class FakeWeaviateObj:
    def __init__(self, uid, props, vec):
        self.uuid = uid
        self.properties = props
        self.vector = {"default": vec}


class FakeWeaviateCollection:
    def __init__(self):
        self.objs: dict[str, FakeWeaviateObj] = {}

        outer = self

        class _Agg:
            def over_all(self, total_count=True):
                from types import SimpleNamespace

                return SimpleNamespace(total_count=len(outer.objs))

        class _Query:
            def fetch_objects(self, limit, after=None, include_vector=False):
                from types import SimpleNamespace

                ordered = sorted(outer.objs.values(), key=lambda o: str(o.uuid))
                if after is not None:
                    ordered = [o for o in ordered if str(o.uuid) > str(after)]
                return SimpleNamespace(objects=ordered[:limit])

        class _Batch:
            def dynamic(self):
                class _Ctx:
                    def __enter__(ctx):
                        return ctx

                    def __exit__(ctx, *a):
                        return False

                    def add_object(ctx, properties, uuid, vector=None):
                        outer.objs[uuid] = FakeWeaviateObj(uuid, properties, vector)

                return _Ctx()

        self.aggregate = _Agg()
        self.query = _Query()
        self.batch = _Batch()


class FakeWeaviateClient:
    def __init__(self):
        self._cols: dict[str, FakeWeaviateCollection] = {}

        outer = self

        class _Cols:
            def list_all(self):
                return dict(outer._cols)

            def create(self, name):
                outer._cols[name] = FakeWeaviateCollection()

            def get(self, name):
                return outer._cols[name]

        self.collections = _Cols()


def test_weaviate_connector_scan_and_sink():
    conn = WeaviateConnector(client=FakeWeaviateClient())
    conn.create_collection("Cls", 4, "cosine")
    assert conn.list_collections() == ["Cls"]

    ids = [str(uuid.UUID(int=i)) for i in range(7)]
    conn.upsert_batch(
        "Cls",
        pd.DataFrame(
            {"id": ids, "vector": [[float(i), 0.0] for i in range(7)],
             "title": [f"t{i}" for i in range(7)]}
        ),
    )
    assert conn.count("Cls") == 7
    conn.PAGE = 3  # force after-cursor paging
    [cur] = conn.plan_cursors("Cls", 4)
    frames = list(conn.read_cursor("Cls", cur))
    assert len(frames) == 3
    got = pd.concat(frames)
    assert sorted(got["id"]) == sorted(ids)
    assert set(got.columns) == {"id", "vector", "title"}
