"""txtai and Azure AI Search adapters against embedded fakes — the last
two named reference components (txtai_export.py stub, azureai_import.py
stub): cursor plans cover the whole store disjointly, sinks round-trip,
DDL shape matches the Azure REST contract."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from vector_io_spark.sources.remote_extra import (
    AzureAISearchConnector,
    TxtaiConnector,
    build_azure_index_definition,
)


# --------------------------------------------------------------------------
# txtai
# --------------------------------------------------------------------------

class FakeResponse:
    def __init__(self, payload):
        self._payload = payload

    def raise_for_status(self):
        return None

    def json(self):
        return self._payload


class FakeTxtaiHttp:
    """txtai API service: /count, /search (txtai-SQL), /add + /upsert.
    Documents live in a staged list until /upsert commits them — the
    two-step ingest the real service uses."""

    def __init__(self, docs=None):
        self.committed: list[dict] = list(docs or [])
        self.staged: list[dict] = []
        self.search_calls = 0

    def get(self, url):
        if url.endswith("/count"):
            return FakeResponse(len(self.committed))
        if url.endswith("/upsert"):
            self.committed.extend(self.staged)
            self.staged.clear()
            return FakeResponse({"status": "ok"})
        raise AssertionError(f"unexpected GET {url}")

    def post(self, url, json=None):
        if url.endswith("/add"):
            self.staged.extend(json)
            return FakeResponse({"status": "ok"})
        if url.endswith("/search"):
            self.search_calls += 1
            q = json["query"]
            # parse "select * from txtai limit L offset O"
            parts = q.split()
            limit = int(parts[parts.index("limit") + 1])
            offset = int(parts[parts.index("offset") + 1])
            return FakeResponse(self.committed[offset : offset + limit])
        raise AssertionError(f"unexpected POST {url}")


def test_txtai_offset_cursors_cover_store_disjointly():
    docs = [{"id": f"d{i:03d}", "text": f"text {i}", "score": i} for i in range(25)]
    conn = TxtaiConnector(http_client=FakeTxtaiHttp(docs))
    conn.PAGE = 4  # force multi-page reads inside each cursor range

    assert conn.count("txtai") == 25
    assert conn.list_collections() == ["txtai"]

    cursors = conn.plan_cursors("txtai", 4)
    ends = [(c["offset"], c["end"]) for c in cursors]
    # contiguous, disjoint, complete
    assert ends[0][0] == 0 and ends[-1][1] == 25
    for (_, e), (o2, _) in zip(ends, ends[1:]):
        assert e == o2

    frames = [pdf for c in cursors for pdf in conn.read_cursor("txtai", c)]
    got = pd.concat(frames)
    assert sorted(got["id"]) == sorted(d["id"] for d in docs)
    assert len(got) == 25


def test_txtai_empty_store_and_upsert_commit():
    http = FakeTxtaiHttp()
    conn = TxtaiConnector(http_client=http)
    assert conn.plan_cursors("txtai", 8) == []

    conn.upsert_batch("txtai", pd.DataFrame({"id": ["a"], "text": ["hi"]}))
    # /add then /upsert: nothing left staged, doc committed
    assert http.staged == [] and http.committed == [{"id": "a", "text": "hi"}]
    assert conn.count("txtai") == 1

    with pytest.raises(NotImplementedError):
        conn.create_collection("x", 4, "cosine")  # single service index


# --------------------------------------------------------------------------
# Azure AI Search
# --------------------------------------------------------------------------

class FakeAzureSearchClient:
    def __init__(self, store: dict[str, dict]):
        self.store = store

    def get_document_count(self):
        return len(self.store)

    def search(self, search_text, top, order_by, filter=None):
        assert search_text == "*" and order_by == ["id asc"]
        docs = sorted(self.store.values(), key=lambda d: d["id"])
        if filter is not None:
            # "id gt '<last>'"
            last = filter.split("'")[1]
            docs = [d for d in docs if d["id"] > last]
        return [dict(d, **{"@search.score": 1.0}) for d in docs[:top]]

    def merge_or_upload_documents(self, docs):
        assert len(docs) <= 1000
        for d in docs:
            self.store[d["id"]] = dict(d)


class FakeAzureIndexClient:
    def __init__(self):
        self.indexes: dict[str, dict] = {}

    def list_index_names(self):
        return list(self.indexes)

    def create_index(self, definition):
        self.indexes[definition["name"]] = definition


def test_azure_index_definition_shape():
    d = build_azure_index_definition("idx", dimensions=128, metric="dot")
    assert json.dumps(d)  # REST-serializable
    key = [f for f in d["fields"] if f.get("key")]
    assert key and key[0]["name"] == "id" and key[0]["sortable"]
    vec = [f for f in d["fields"] if f["name"] == "content_vector"][0]
    assert vec["dimensions"] == 128
    assert vec["type"] == "Collection(Edm.Single)"
    assert (
        d["vectorSearch"]["algorithms"][0]["hnswParameters"]["metric"]
        == "dotProduct"
    )
    assert (
        d["vectorSearch"]["profiles"][0]["algorithm"]
        == d["vectorSearch"]["algorithms"][0]["name"]
    )


def test_azure_range_filter_paging_scans_past_skip_limit():
    store = {
        f"k{i:04d}": {"id": f"k{i:04d}", "content": f"c{i}", "content_vector": [float(i)]}
        for i in range(23)
    }
    ix = FakeAzureIndexClient()
    conn = AzureAISearchConnector(
        search_client_factory=lambda index: FakeAzureSearchClient(store),
        index_client=ix,
    )
    conn.PAGE = 5  # force several id-gt continuation hops

    assert conn.count("idx") == 23
    [cursor] = conn.plan_cursors("idx", 8)
    frames = list(conn.read_cursor("idx", cursor))
    got = pd.concat(frames)
    assert list(got["id"]) == sorted(store)  # ordered, complete, no dups
    assert "@search.score" not in got.columns  # service fields stripped

    conn.create_collection("newidx", 64, "euclid")
    assert conn.list_collections() == ["newidx"]
    assert ix.indexes["newidx"]["fields"][2]["dimensions"] == 64

    conn.upsert_batch(
        "idx", pd.DataFrame({"id": [9999], "content": ["x"], "content_vector": [[1.0]]})
    )
    assert store["9999"]["content"] == "x"  # id stringified + merged
