"""txtai and Azure AI Search connectors.

These close the reference's last two named components: txtai's export is
an empty stub (``export_vdf/txtai_export.py:36`` — only an ``--endpoint``
argument pointing at a txtai API service, default
``http://localhost:8080``, and a pass-body ``get_data``) and Azure AI
Search ships a 65-LoC import stub (``import_vdf/azureai_import.py``:
endpoint + api key args, print-only ``upsert_data``) plus a fully
commented-out export (``export_vdf/azureai_export.py``) whose comments
cite the SearchClient surface it intended to use: ``get_document_count``,
``merge_or_upload_documents``, and ``search`` with skip-paging, with
``id`` / ``content`` / ``content_vector`` field conventions.

Both adapters here implement the full connector contract
(sources/connectors.py) at the same fidelity as the other SDK-gated
adapters — real cursor plans, batch/shrink constants, DDL synthesis —
exceeding the reference stubs the way the Weaviate adapter exceeds its
count-only stub. Clients are injectable for the embedded-fake tests;
real clients are import-gated (no SDKs in this environment).
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


# ---------------------------------------------------------------------------
# txtai
# ---------------------------------------------------------------------------

class TxtaiConnector(VectorDBConnector):
    """txtai HTTP API service (reference stub txtai_export.py:1-36: an
    ``--endpoint`` URL, nothing else — this adapter supplies the scan and
    sink the stub never implemented, against txtai's public API service:
    ``GET /count``, ``POST /search`` with txtai-SQL, ``POST /add`` +
    ``GET /upsert``).

    Scan: txtai-SQL ``select * from txtai`` with ``limit``/``offset``
    paging. The service exposes a total count, so the cursor plan splits
    ``[0, count)`` into ``parallelism`` contiguous offset ranges — one
    Spark task per range, each paging independently (offset paging is
    stable because txtai ids order deterministically between index
    commits; a concurrent writer invalidates counts exactly as it does
    for every offset-paged store, e.g. the Chroma adapter).

    Sink: ``POST /add`` document batches then one ``GET /upsert`` per
    batch to commit the index segment (txtai's documented two-step
    ingest). A txtai service hosts ONE embeddings index, so the
    collection argument is ignored on the data plane and the catalog
    surface is the fixed single name.
    """

    DB_NAME_SLUG = "txtai"
    PAGE = 1000
    INDEX_NAME = "txtai"

    def __init__(self, endpoint: str = "http://localhost:8080", http_client=None):
        if http_client is None:
            httpx = _require("httpx", "pip install httpx")
            http_client = httpx.Client()
        self.http = http_client
        self.endpoint = endpoint.rstrip("/")

    def list_collections(self) -> list[str]:
        return [self.INDEX_NAME]

    def create_collection(self, name, dimensions, metric, index_config=None):
        raise NotImplementedError(
            "a txtai service hosts one embeddings index configured at "
            "service startup; there is no create-index data-plane API"
        )

    def count(self, collection: str) -> int:
        resp = self.http.get(f"{self.endpoint}/count")
        resp.raise_for_status()
        return int(resp.json())

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        total = self.count(collection)
        if total == 0:
            return []
        parallelism = max(1, min(parallelism, total))
        per = -(-total // parallelism)  # ceil
        return [
            {"offset": i * per, "end": min((i + 1) * per, total)}
            for i in range(parallelism)
            if i * per < total
        ]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        offset, end = cursor["offset"], cursor["end"]
        while offset < end:
            limit = min(self.PAGE, end - offset)
            resp = self.http.post(
                f"{self.endpoint}/search",
                json={
                    "query": (
                        f"select * from txtai limit {limit} offset {offset}"
                    )
                },
            )
            resp.raise_for_status()
            rows = resp.json()
            if not rows:
                return
            yield pd.DataFrame(rows)
            offset += len(rows)

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        docs = batch.to_dict("records")
        resp = self.http.post(f"{self.endpoint}/add", json=docs)
        resp.raise_for_status()
        resp = self.http.get(f"{self.endpoint}/upsert")
        resp.raise_for_status()


# ---------------------------------------------------------------------------
# Azure AI Search
# ---------------------------------------------------------------------------

def build_azure_index_definition(
    name: str,
    dimensions: int,
    metric: str = "cosine",
    id_field: str = "id",
    vector_field: str = "content_vector",
    content_field: str = "content",
) -> dict:
    """REST-shaped Azure AI Search index definition with an HNSW vector
    profile — the DDL the reference's commented export sketches with SDK
    models (azureai_export.py comments: HnswAlgorithmConfiguration /
    VectorSearchProfile; field conventions id/content/content_vector).
    Pure dict so tests verify the shape without the SDK; the connector
    feeds it to ``SearchIndexClient.create_index`` (or the REST API)
    verbatim."""
    metric_map = {"cosine": "cosine", "euclid": "euclidean", "dot": "dotProduct"}
    return {
        "name": name,
        "fields": [
            {
                "name": id_field,
                "type": "Edm.String",
                "key": True,
                "filterable": True,
                "sortable": True,
            },
            {"name": content_field, "type": "Edm.String", "searchable": True},
            {
                "name": vector_field,
                "type": "Collection(Edm.Single)",
                "searchable": True,
                "dimensions": dimensions,
                "vectorSearchProfile": f"{name}-profile",
            },
        ],
        "vectorSearch": {
            "algorithms": [
                {
                    "name": f"{name}-hnsw",
                    "kind": "hnsw",
                    "hnswParameters": {
                        "m": 4,
                        "efConstruction": 400,
                        "efSearch": 500,
                        "metric": metric_map.get(metric, "cosine"),
                    },
                }
            ],
            "profiles": [
                {"name": f"{name}-profile", "algorithm": f"{name}-hnsw"}
            ],
        },
    }


class AzureAISearchConnector(VectorDBConnector):
    """Azure AI Search (reference azureai_import.py:1-65 stub +
    azureai_export.py's commented plan, which cites get_document_count,
    merge_or_upload_documents, and search-with-skip as the intended
    surface).

    Scan: ``search("*")`` ordered by the key field with a
    ``id gt <last>`` range-filter continuation — Azure's documented
    deep-paging pattern ($skip hard-caps at 100k, so skip-paging — the
    reference's sketched approach — cannot scan a large index; the
    range-filter chain can). Single cursor chain per index: the key is
    an opaque string, so there is no server-side slice API to fan out on
    (same single-chain fidelity as the Weaviate after-cursor adapter).

    Sink: ``merge_or_upload_documents`` batches of ≤1000 docs (the
    service's documented per-request document limit), under the engine's
    shrink policy for payload-too-large responses.
    """

    DB_NAME_SLUG = "azureai"
    PAGE = 1000
    UPSERT_BATCH = 1000  # service max docs per indexing request
    ID_FIELD = "id"

    def __init__(
        self,
        endpoint: str = "",
        api_key: str = "",
        search_client_factory=None,
        index_client=None,
    ):
        if search_client_factory is None or index_client is None:
            documents = _require(
                "azure.search.documents", "pip install azure-search-documents"
            )
            indexes = _require(
                "azure.search.documents.indexes",
                "pip install azure-search-documents",
            )
            core = _require("azure.core.credentials", "pip install azure-core")
            cred = core.AzureKeyCredential(api_key)
            index_client = indexes.SearchIndexClient(endpoint, cred)
            search_client_factory = lambda index: documents.SearchClient(  # noqa: E731
                endpoint, index, cred
            )
        self._client_for = search_client_factory
        self.index_client = index_client

    def list_collections(self) -> list[str]:
        return list(self.index_client.list_index_names())

    def create_collection(self, name, dimensions, metric, index_config=None):
        definition = build_azure_index_definition(name, dimensions, metric)
        if index_config:
            definition.update(index_config)
        self.index_client.create_index(definition)

    def count(self, collection: str) -> int:
        return int(self._client_for(collection).get_document_count())

    def plan_cursors(self, collection: str, parallelism: int) -> list[dict]:
        return [{"after": None}]

    def read_cursor(self, collection: str, cursor: dict) -> Iterator[pd.DataFrame]:
        client = self._client_for(collection)
        after = cursor.get("after")
        while True:
            kwargs = {
                "search_text": "*",
                "top": self.PAGE,
                "order_by": [f"{self.ID_FIELD} asc"],
            }
            if after is not None:
                kwargs["filter"] = f"{self.ID_FIELD} gt '{after}'"
            rows = [dict(r) for r in client.search(**kwargs)]
            if not rows:
                return
            yield pd.DataFrame(
                [
                    {k: v for k, v in r.items() if not k.startswith("@")}
                    for r in rows
                ]
            )
            after = rows[-1][self.ID_FIELD]

    def upsert_batch(self, collection: str, batch: pd.DataFrame) -> None:
        docs = batch.to_dict("records")
        for d in docs:
            d[self.ID_FIELD] = str(d[self.ID_FIELD])
        client = self._client_for(collection)
        for i in range(0, len(docs), self.UPSERT_BATCH):
            client.merge_or_upload_documents(docs[i : i + self.UPSERT_BATCH])


EXTRA_CONNECTORS = {
    cls.DB_NAME_SLUG: cls for cls in (TxtaiConnector, AzureAISearchConnector)
}
