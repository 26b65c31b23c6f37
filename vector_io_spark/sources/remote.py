"""Remote vector-DB connectors.

Each class adapts one vector DB to the engine's connector contract
(sources/connectors.py): cursor planning + scroll reads feed
``paginated_read`` (mapInPandas), batched writes feed
``partitioned_upsert`` (foreachPartition with shrink/retry/rate-limit).
Batch sizes and resilience constants mirror the reference (BASELINE.md).

None of the client SDKs are installed in this environment, so every
constructor is import-gated with a clear error; the Spark-side machinery
these plug into is fully tested against the embedded connector
(tests/test_connectors_multimodal.py). Docstrings cite the reference
implementation each adapter reproduces.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from vector_io_spark.sources.connectors import VectorDBConnector


def lancedb_default_value(dtype):
    """Per-dtype default used when evolving a LanceDB table's schema to
    accept a batch with new columns (lancedb_import.py:155-166): text ->
    '', ints -> 0, floats -> 0.0, bool -> False, anything else -> None."""
    return {
        "object": "",
        "int64": 0,
        "float64": 0.0,
        "bool": False,
    }.get(getattr(dtype, "name", str(dtype)), None)


def _require(module: str, hint: str):
    import importlib

    try:
        return importlib.import_module(module)
    except ImportError as e:
        raise ImportError(
            f"{module} is required for this connector ({hint}); "
            "it is not installed in this environment"
        ) from e


class QdrantConnector(VectorDBConnector):
    """Qdrant: scroll-cursor scan (qdrant_export.py:119-163 — offset
    cursor, with_payload/with_vectors, fetch-size shrink on error) and
    PointStruct upserts batch 64 (qdrant_import.py:286-343)."""

    DB_NAME_SLUG = "qdrant"
    SCROLL_BATCH = 1000  # qdrant_export.py:16
    UPSERT_BATCH = 64    # qdrant_import.py:311-315

    def __init__(self, url: str = "", api_key: str | None = None, client=None):
        if client is None:
            qdrant_client = _require("qdrant_client", "pip install qdrant-client")
            client = qdrant_client.QdrantClient(url=url, api_key=api_key)
        self.client = client

    def list_collections(self) -> list[str]:
        return [c.name for c in self.client.get_collections().collections]

    # exported index_config sections replayed verbatim on create
    # (qdrant_import.py:210-248)
    REPLAYED_CONFIGS = (
        "hnsw_config",
        "optimizers_config",
        "wal_config",
        "quantization_config",
        "on_disk_payload",
        "sparse_vectors_config",
    )

    def create_collection(self, name, dimensions, metric, index_config=None):
        cfg = index_config or {}
        on_disk = (
            cfg.get("params", {}).get("vectors", {}).get("on_disk")
            if isinstance(cfg.get("params"), dict)
            else None
        )
        try:  # typed params with the real SDK; plain dict (also accepted
            # by the qdrant API) when testing against a fake client
            from qdrant_client import models  # type: ignore

            vectors_config = models.VectorParams(
                size=dimensions,
                distance=getattr(
                    models.Distance, metric.upper(), models.Distance.COSINE
                ),
                on_disk=on_disk,
            )
        except ImportError:
            vectors_config = {
                "size": dimensions, "distance": metric, "on_disk": on_disk,
            }
        self.client.recreate_collection(
            collection_name=name,
            vectors_config=vectors_config,
            **{k: cfg.get(k) for k in self.REPLAYED_CONFIGS},
        )

    def count(self, collection: str) -> int:
        return self.client.count(collection).count

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        """One cursor per shard key when the collection uses custom
        sharding (each Spark task scrolls one shard via
        shard_key_selector — Qdrant's native parallel-scan addressing);
        single scroll chain otherwise (offsets are opaque)."""
        keys = self._shard_keys(collection)
        if keys:
            return [{"offset": None, "shard_key": k} for k in keys]
        return [{"offset": None}]

    def _shard_keys(self, collection: str) -> list:
        try:
            info = self.client.collection_cluster_info(collection)
        except Exception:
            return []
        keys = sorted(
            {
                getattr(s, "shard_key", None)
                for s in (
                    list(getattr(info, "local_shards", []) or [])
                    + list(getattr(info, "remote_shards", []) or [])
                )
            }
            - {None}
        )
        return keys

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        offset = cursor.get("offset")
        extra = (
            {"shard_key_selector": cursor["shard_key"]}
            if cursor.get("shard_key") is not None
            else {}
        )
        while True:
            points, offset = self.client.scroll(
                collection, limit=self.SCROLL_BATCH, offset=offset,
                with_payload=True, with_vectors=True, **extra,
            )
            if not points:
                return
            yield pd.DataFrame(
                [{"id": str(p.id), "vector": p.vector, **(p.payload or {})} for p in points]
            )
            if offset is None:
                return

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        try:  # typed points with the real SDK; plain dicts (also
            # accepted by the qdrant API) against an injected fake —
            # same ImportError fallback create_collection already has
            from qdrant_client import models  # type: ignore

            def point(row):
                return models.PointStruct(
                    id=row["id"], vector=row["vector"],
                    payload={
                        k: v for k, v in row.items()
                        if k not in ("id", "vector")
                    },
                )
        except ImportError:
            def point(row):
                return {
                    "id": row["id"], "vector": row["vector"],
                    "payload": {
                        k: v for k, v in row.items()
                        if k not in ("id", "vector")
                    },
                }

        points = [point(row) for row in batch.to_dict("records")]
        self.client.upsert(collection, points=points, wait=True)


class PineconeConnector(VectorDBConnector):
    """Pinecone: id-pagination scan (pinecone_export.py:261-430 id
    collection + fetch batch 1000) and Vector upserts batch 1000 with
    shrink ×2/3 (pinecone_import.py:236-276)."""

    DB_NAME_SLUG = "pinecone"
    MAX_FETCH_SIZE = 1000  # pinecone_export.py:25

    def __init__(self, api_key: str = "", index_name: str | None = None, client=None):
        if client is None:
            pinecone = _require("pinecone", "pip install pinecone-client")
            client = pinecone.Pinecone(api_key=api_key)
        self.client = client
        self.index_name = index_name

    def list_collections(self) -> list[str]:
        return [i["name"] for i in self.client.list_indexes()]

    def create_collection(self, name, dimensions, metric, index_config=None):
        """Create with serverless OR pod spec replayed from index_config
        (pinecone_import.py:126-161: --serverless picks ServerlessSpec
        (cloud, region); otherwise PodSpec(environment, pod_type
        defaulting 'starter'))."""
        cfg = index_config or {}
        spec = cfg.get("spec")
        if spec is None:
            try:
                from pinecone import PodSpec, ServerlessSpec  # type: ignore
            except ImportError:  # fake-client tests: plain dicts
                PodSpec = ServerlessSpec = dict  # type: ignore[assignment]
            if "pod" in cfg:
                pod = cfg["pod"] or {}
                spec = PodSpec(
                    environment=pod.get("environment", "us-east-1-aws"),
                    pod_type=pod.get("pod_type") or "starter",
                )
            else:
                sl = cfg.get("serverless") or {}
                spec = ServerlessSpec(
                    cloud=sl.get("cloud", "aws"), region=sl.get("region", "us-east-1")
                )
        self.client.create_index(
            name=name, dimension=dimensions, metric=metric.lower(), spec=spec
        )

    def count(self, collection: str) -> int:
        return self.client.Index(collection).describe_index_stats().total_vector_count

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        """Preferred: list() id pages split by page strides. Fallback for
        indexes where list() is unavailable (pre-serverless pods): the
        query+mark/unmark sweep (pinecone_export.py:184-259), which must
        run as ONE cursor — it pages by mutating a per-sweep metadata
        marker, so concurrent sweeps would race on the marker."""
        index = self.client.Index(collection)
        try:
            next(iter(index.list()), None)  # probe: list() raises on pods
        except Exception:
            return [{"sweep": True}]
        return [{"page_start": i, "stride": parallelism} for i in range(parallelism)]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        index = self.client.Index(collection)
        if cursor.get("sweep"):
            yield from self._sweep_scan(index)
            return
        for page_no, ids in enumerate(index.list()):
            if page_no % cursor["stride"] != cursor["page_start"]:
                continue
            for i in range(0, len(ids), self.MAX_FETCH_SIZE):
                fetched = index.fetch(ids=list(ids[i : i + self.MAX_FETCH_SIZE]))
                yield pd.DataFrame(
                    [
                        {
                            "id": v.id,
                            "vector": list(v.values),
                            # sparseValues passthrough into the engine's
                            # struct convention (pinecone_export.py:233-235)
                            **(
                                {
                                    "sparse_vector": {
                                        "indices": list(v.sparse_values.indices),
                                        "values": list(v.sparse_values.values),
                                    }
                                }
                                if getattr(v, "sparse_values", None)
                                else {}
                            ),
                            **(v.metadata or {}),
                        }
                        for v in fetched.vectors.values()
                    ]
                )

    PINECONE_MAX_K = 10_000  # pinecone_export.py PINECONE_MAX_K

    def _sweep_scan(self, index) -> Iterator[pd.DataFrame]:
        """Random-query sweep with mark/unmark
        (pinecone_export.py:184-259 marking, :432-465 unmarking): query
        for top-k vectors NOT yet carrying this sweep's marker, fetch
        them, yield, mark them exported, repeat until the query returns
        nothing new; finally strip the marker from everything touched.
        Deterministic probe vectors (seeded RNG) so reruns are
        reproducible."""
        import numpy as np

        marker = f"exported_vectorio_{uuid.uuid4().hex[:8]}"
        dims = int(index.describe_index_stats()["dimension"])
        rng = np.random.RandomState(42)
        seen: set[str] = set()
        while True:
            res = index.query(
                vector=rng.rand(dims).tolist(),
                top_k=self.PINECONE_MAX_K,
                filter={marker: {"$ne": True}},
                include_values=False,
            )
            ids = [m["id"] for m in res["matches"] if m["id"] not in seen]
            if not ids:
                break
            for i in range(0, len(ids), self.MAX_FETCH_SIZE):
                chunk = ids[i : i + self.MAX_FETCH_SIZE]
                fetched = index.fetch(ids=chunk)
                vecs = fetched.vectors
                yield pd.DataFrame(
                    [
                        {
                            "id": v.id,
                            "vector": list(v.values),
                            # sparseValues passthrough — the sweep path
                            # must emit the same shape as the list path
                            **(
                                {
                                    "sparse_vector": {
                                        "indices": list(
                                            v.sparse_values.indices
                                        ),
                                        "values": list(
                                            v.sparse_values.values
                                        ),
                                    }
                                }
                                if getattr(v, "sparse_values", None)
                                else {}
                            ),
                            **(v.metadata or {}),
                        }
                        for v in vecs.values()
                    ]
                )
                # mark exported (metadata flag rides along with values;
                # sparseValues preserved, pinecone_export.py:233-235)
                index.upsert(
                    vectors=[
                        {
                            "id": v.id,
                            "values": list(v.values),
                            "metadata": {**(v.metadata or {}), marker: True},
                            **(
                                {
                                    "sparse_values": {
                                        "indices": list(v.sparse_values.indices),
                                        "values": list(v.sparse_values.values),
                                    }
                                }
                                if getattr(v, "sparse_values", None)
                                else {}
                            ),
                        }
                        for v in vecs.values()
                    ]
                )
            seen.update(ids)
        # unmark pass: restore metadata without the sweep marker
        all_ids = sorted(seen)
        for i in range(0, len(all_ids), self.MAX_FETCH_SIZE):
            chunk = all_ids[i : i + self.MAX_FETCH_SIZE]
            fetched = index.fetch(ids=chunk)
            # upsert REPLACES the whole record: dropping sparse_values
            # here would permanently destroy hybrid vectors in the
            # SOURCE index during a read-only export
            index.upsert(
                vectors=[
                    {
                        "id": v.id,
                        "values": list(v.values),
                        "metadata": {
                            k: val
                            for k, val in (v.metadata or {}).items()
                            if k != marker
                        },
                        **(
                            {
                                "sparse_values": {
                                    "indices": list(v.sparse_values.indices),
                                    "values": list(v.sparse_values.values),
                                }
                            }
                            if getattr(v, "sparse_values", None)
                            else {}
                        ),
                    }
                    for v in fetched.vectors.values()
                ]
            )

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        index = self.client.Index(collection)
        vectors = []
        for row in batch.to_dict("records"):
            vec = {
                "id": str(row["id"]),
                "values": row["vector"],
                "metadata": {
                    k: v
                    for k, v in row.items()
                    if k not in ("id", "vector", "sparse_vector")
                    and v is not None  # None keys dropped, pinecone_import.py:246-252
                },
            }
            # engine sparse struct -> Pinecone sparse_values
            # (pinecone_export.py:460-462 carries sparseValues on upsert)
            sv = row.get("sparse_vector")
            if sv is not None:
                vec["sparse_values"] = {
                    "indices": list(sv["indices"]),
                    "values": list(sv["values"]),
                }
            vectors.append(vec)
        index.upsert(vectors=vectors)


class MilvusConnector(VectorDBConnector):
    """Milvus: query_iterator scan batch 1000 (milvus_export.py:117-158)
    and row upserts batch 1000 with AUTOINDEX DDL
    (milvus_import.py:98-215)."""

    DB_NAME_SLUG = "milvus"
    ITER_BATCH = 1000  # milvus_export.py:20

    def __init__(self, uri: str = "", token: str | None = None, pymilvus_module=None):
        if pymilvus_module is None:
            pymilvus_module = _require("pymilvus", "pip install pymilvus")
            pymilvus_module.connections.connect(uri=uri, token=token or "")
        self._pymilvus = pymilvus_module

    def list_collections(self) -> list[str]:
        return self._pymilvus.utility.list_collections()

    def create_collection(self, name, dimensions, metric, index_config=None):
        pm = self._pymilvus
        fields = [
            pm.FieldSchema("id", pm.DataType.VARCHAR, is_primary=True, max_length=65535),
            pm.FieldSchema("vector", pm.DataType.FLOAT_VECTOR, dim=dimensions),
        ]
        schema = pm.CollectionSchema(fields, enable_dynamic_field=True)
        col = pm.Collection(name, schema)
        col.create_index(
            "vector", {"index_type": "AUTOINDEX", "metric_type": metric}
        )

    def count(self, collection: str) -> int:
        return self._pymilvus.Collection(collection).num_entities

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        """One cursor per Milvus partition (each Spark task drives a
        query_iterator scoped with partition_names — partitions are
        Milvus's horizontal scan split); single iterator for
        unpartitioned collections."""
        col = self._pymilvus.Collection(collection)
        parts = [p.name for p in getattr(col, "partitions", []) or []]
        if len(parts) > 1:
            return [{"partition": p} for p in parts]
        return [{}]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        col = self._pymilvus.Collection(collection)
        extra = (
            {"partition_names": [cursor["partition"]]}
            if cursor.get("partition")
            else {}
        )
        it = col.query_iterator(
            batch_size=self.ITER_BATCH, output_fields=["*"], **extra
        )
        while True:
            page = it.next()
            if not page:
                it.close()
                return
            yield pd.DataFrame(page)

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        self._pymilvus.Collection(collection).upsert(batch.to_dict("records"))
        # flush happens once per partition close in the reference (milvus_import.py:216)


class ChromaConnector(VectorDBConnector):
    """Chroma: offset/limit paging scan (chroma_export.py:123-165) and
    upserts with scalar-only metadata (chroma_import.py:145-218)."""

    DB_NAME_SLUG = "chroma"
    PAGE = 1000

    def __init__(self, path: str | None = None, host: str | None = None):
        chromadb = _require("chromadb", "pip install chromadb")
        self.client = (
            chromadb.HttpClient(host=host) if host else chromadb.PersistentClient(path=path)
        )

    def list_collections(self) -> list[str]:
        return [c.name for c in self.client.list_collections()]

    def create_collection(self, name, dimensions, metric, index_config=None):
        metric_map = {"Cosine": "cosine", "Euclid": "l2", "Dot": "ip"}
        self.client.get_or_create_collection(
            name, metadata={"hnsw:space": metric_map.get(metric, "cosine")}
        )

    def count(self, collection: str) -> int:
        return self.client.get_collection(collection).count()

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        total = self.count(collection)
        stride = max(1, (total + parallelism - 1) // parallelism)
        return [{"offset": o, "limit": stride} for o in range(0, total, stride)]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        col = self.client.get_collection(collection)
        got = col.get(
            include=["metadatas", "documents", "embeddings"],
            limit=cursor["limit"], offset=cursor["offset"],
        )
        if got["ids"]:
            yield pd.DataFrame(
                {
                    "id": got["ids"],
                    "vector": [list(e) for e in got["embeddings"]],
                    "document": got["documents"],
                    **(
                        pd.DataFrame(got["metadatas"]).to_dict("series")
                        if got["metadatas"]
                        else {}
                    ),
                }
            )

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        col = self.client.get_collection(collection)
        scalars = batch.drop(columns=["id", "vector", "document"], errors="ignore")
        col.upsert(
            ids=[str(x) for x in batch["id"]],
            embeddings=[list(v) for v in batch["vector"]],
            documents=list(batch["document"]) if "document" in batch else None,
            metadatas=scalars.to_dict("records") if len(scalars.columns) else None,
        )


class LanceDBConnector(VectorDBConnector):
    """LanceDB: arrow-batch scan re-chunked to fixed size
    (lancedb_export.py:82-111) and table.add batches 10k with
    missing-column defaults (lancedb_import.py:71-152)."""

    DB_NAME_SLUG = "lancedb"
    BATCH = 10_000  # lancedb_export.py:33-38

    def __init__(self, uri: str):
        lancedb = _require("lancedb", "pip install lancedb")
        self.db = lancedb.connect(uri)

    def list_collections(self) -> list[str]:
        return list(self.db.table_names())

    def create_collection(self, name, dimensions, metric, index_config=None):
        pass  # lancedb creates tables on first add with the data's schema

    def count(self, collection: str) -> int:
        return self.db.open_table(collection).count_rows()

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        total = self.count(collection)
        stride = max(1, (total + parallelism - 1) // parallelism)
        return [{"offset": o, "limit": stride} for o in range(0, total, stride)]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        tbl = self.db.open_table(collection)
        yield (
            tbl.to_lance()
            .to_table(offset=cursor["offset"], limit=cursor["limit"])
            .to_pandas()
        )

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        if collection in self.db.table_names():
            tbl = self.db.open_table(collection)
            # schema evolution: batch columns the table lacks are ADDED to
            # the table with a per-dtype default expression
            # (lancedb_import.py:116-128, get_default_value:155-166)
            existing = {f.name for f in tbl.schema}
            for col in batch.columns:
                if col not in existing:
                    default = lancedb_default_value(batch[col].dtype)
                    # unmapped dtypes default to SQL NULL — repr(None)
                    # would hand DataFusion the unknown identifier 'None'
                    tbl.add_columns(
                        {col: "NULL" if default is None else repr(default)}
                    )
            tbl.add(batch)
        else:
            self.db.create_table(collection, batch)


class TurbopufferConnector(VectorDBConnector):
    """Turbopuffer: full-namespace iteration (turbopuffer_export.py:64-95)
    and upserts batch <=10k with attribute coercion
    (turbopuffer_import.py:56-164)."""

    DB_NAME_SLUG = "turbopuffer"
    BATCH = 10_000
    QUERY_PAGE = 1000  # query API top_k page (id-ordered when unranked)

    def __init__(self, api_key: str = "", tpuf_module=None,
                 id_ranges: list[tuple[int, int]] | None = None):
        if tpuf_module is None:
            tpuf_module = _require("turbopuffer", "pip install turbopuffer")
            tpuf_module.api_key = api_key
        self._tpuf = tpuf_module
        self.id_ranges = id_ranges

    def list_collections(self) -> list[str]:
        return [ns.name for ns in self._tpuf.namespaces()]

    def create_collection(self, name, dimensions, metric, index_config=None):
        pass  # namespaces are created on first upsert

    def count(self, collection: str) -> int:
        return self._tpuf.Namespace(collection).approx_count()

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        """Range cursors over a numeric id space when the caller provides
        ``id_ranges`` (mirroring the reference's --id_range_start/end
        escape hatch, pinecone_export.py:266-281): each Spark task scans
        one [lo, hi) slice via the query API's documented Gte/Lt id
        filters. Without ranges, one full-namespace ``vectors()``
        iteration (the export cursor is opaque and single-threaded)."""
        if self.id_ranges:
            return [
                {"id_gte": int(lo), "id_lt": int(hi)} for lo, hi in self.id_ranges
            ]
        return [{}]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        ns = self._tpuf.Namespace(collection)
        if "id_gte" in cursor:
            yield from self._read_range(ns, cursor["id_gte"], cursor["id_lt"])
            return
        buf = []
        for row in ns.vectors():
            buf.append({"id": row.id, "vector": row.vector, **(row.attributes or {})})
            if len(buf) >= self.BATCH:
                yield pd.DataFrame(buf)
                buf = []
        if buf:
            yield pd.DataFrame(buf)

    def _read_range(self, ns, lo: int, hi: int) -> Iterator[pd.DataFrame]:
        """Filter-based pagination inside [lo, hi): repeatedly query with
        ['id','Gte',cursor] + ['id','Lt',hi] and advance the cursor past
        the max id returned — turbopuffer's documented id-filter paging."""
        cur = lo
        while cur < hi:
            rows = ns.query(
                filters=["And", [["id", "Gte", cur], ["id", "Lt", hi]]],
                top_k=self.QUERY_PAGE,
                include_vectors=True,
                include_attributes=True,
            )
            rows = list(rows)
            if not rows:
                return
            yield pd.DataFrame(
                [
                    {"id": r.id, "vector": r.vector, **(r.attributes or {})}
                    for r in rows
                ]
            )
            max_id = max(int(r.id) for r in rows)
            if len(rows) < self.QUERY_PAGE:
                return
            cur = max_id + 1

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        ns = self._tpuf.Namespace(collection)
        ns.upsert(
            ids=[str(x) for x in batch["id"]],
            vectors=[list(v) for v in batch["vector"]],
            attributes={
                c: list(batch[c]) for c in batch.columns if c not in ("id", "vector")
            },
        )


CONNECTORS = {
    cls.DB_NAME_SLUG: cls
    for cls in (
        QdrantConnector,
        PineconeConnector,
        MilvusConnector,
        ChromaConnector,
        LanceDBConnector,
        TurbopufferConnector,
    )
}

# cloud adapters (Vertex AI, AstraDB JSON/CQL, KDB.AI, Vespa, Weaviate)
# live in remote_cloud.py; txtai + Azure AI Search in remote_extra.py;
# one merged registry for the CLI / callers
from vector_io_spark.sources.remote_cloud import CLOUD_CONNECTORS  # noqa: E402
from vector_io_spark.sources.remote_extra import EXTRA_CONNECTORS  # noqa: E402

CONNECTORS.update(CLOUD_CONNECTORS)
CONNECTORS.update(EXTRA_CONNECTORS)
