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

from collections.abc import Iterator

import pandas as pd

from vector_io_spark.sources.connectors import VectorDBConnector


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

    def __init__(self, url: str, api_key: str | None = None):
        qdrant_client = _require("qdrant_client", "pip install qdrant-client")
        self.client = qdrant_client.QdrantClient(url=url, api_key=api_key)

    def list_collections(self) -> list[str]:
        return [c.name for c in self.client.get_collections().collections]

    def create_collection(self, name, dimensions, metric, index_config=None):
        from qdrant_client import models  # type: ignore

        self.client.recreate_collection(
            collection_name=name,
            vectors_config=models.VectorParams(
                size=dimensions, distance=getattr(models.Distance, metric.upper(), models.Distance.COSINE)
            ),
            # replay the exported sparse-vectors config, the part of
            # index_config qdrant_import.py:215-243 restores on create
            sparse_vectors_config=(index_config or {}).get(
                "sparse_vectors_config"
            ),
        )

    def count(self, collection: str) -> int:
        return self.client.count(collection).count

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        # scroll offsets are opaque -> one cursor; shard-aware splits
        # would use shard_key selectors here
        return [{"offset": None}]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        offset = cursor.get("offset")
        while True:
            points, offset = self.client.scroll(
                collection, limit=self.SCROLL_BATCH, offset=offset,
                with_payload=True, with_vectors=True,
            )
            if not points:
                return
            yield pd.DataFrame(
                [{"id": str(p.id), "vector": p.vector, **(p.payload or {})} for p in points]
            )
            if offset is None:
                return

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        from qdrant_client import models  # type: ignore

        points = [
            models.PointStruct(
                id=row["id"], vector=row["vector"],
                payload={k: v for k, v in row.items() if k not in ("id", "vector")},
            )
            for row in batch.to_dict("records")
        ]
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
        from pinecone import ServerlessSpec  # type: ignore

        spec = (index_config or {}).get("spec") or ServerlessSpec(
            cloud="aws", region="us-east-1"
        )
        self.client.create_index(
            name=name, dimension=dimensions, metric=metric.lower(), spec=spec
        )

    def count(self, collection: str) -> int:
        return self.client.Index(collection).describe_index_stats().total_vector_count

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        # list() gives id pages; split the id space by page strides
        return [{"page_start": i, "stride": parallelism} for i in range(parallelism)]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        index = self.client.Index(collection)
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

    def __init__(self, uri: str, token: str | None = None):
        pymilvus = _require("pymilvus", "pip install pymilvus")
        pymilvus.connections.connect(uri=uri, token=token or "")
        self._pymilvus = pymilvus

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
        return [{}]  # query_iterator is single-cursor; partitions would map here

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        col = self._pymilvus.Collection(collection)
        it = col.query_iterator(batch_size=self.ITER_BATCH, output_fields=["*"])
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
            self.db.open_table(collection).add(batch)
        else:
            self.db.create_table(collection, batch)


class TurbopufferConnector(VectorDBConnector):
    """Turbopuffer: full-namespace iteration (turbopuffer_export.py:64-95)
    and upserts batch <=10k with attribute coercion
    (turbopuffer_import.py:56-164)."""

    DB_NAME_SLUG = "turbopuffer"
    BATCH = 10_000

    def __init__(self, api_key: str):
        tpuf = _require("turbopuffer", "pip install turbopuffer")
        tpuf.api_key = api_key
        self._tpuf = tpuf

    def list_collections(self) -> list[str]:
        return [ns.name for ns in self._tpuf.namespaces()]

    def create_collection(self, name, dimensions, metric, index_config=None):
        pass  # namespaces are created on first upsert

    def count(self, collection: str) -> int:
        return self._tpuf.Namespace(collection).approx_count()

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        return [{}]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        ns = self._tpuf.Namespace(collection)
        buf = []
        for row in ns.vectors():
            buf.append({"id": row.id, "vector": row.vector, **(row.attributes or {})})
            if len(buf) >= self.BATCH:
                yield pd.DataFrame(buf)
                buf = []
        if buf:
            yield pd.DataFrame(buf)

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
# live in remote_cloud.py; one merged registry for the CLI / callers
from vector_io_spark.sources.remote_cloud import CLOUD_CONNECTORS  # noqa: E402

CONNECTORS.update(CLOUD_CONNECTORS)
