"""Sparse-vector convention: dense<->sparse roundtrip, Catalyst-only dot
products, VDF meta recording, Pinecone sparseValues passthrough."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.functions.sparse import (
    sparse_dot,
    sparse_from_dense,
    sparse_nnz,
    sparse_to_dense,
    sparse_topk,
)


def test_sparse_roundtrip_exact(spark, sf_dir):
    """threshold=0 keeps every non-zero entry; to_dense reconstructs the
    original bit-for-bit (embeddings have no exact zeros)."""
    emb = load(spark, sf_dir, "embeddings").limit(50)
    back = emb.select(
        "embedding",
        sparse_to_dense(sparse_from_dense("embedding", 0.0), 64).alias("back"),
    )
    assert back.where(F.expr("embedding <> back")).count() == 0


def test_sparse_dot_matches_dense(spark, sf_dir):
    """Sparse dot at threshold 0 == dense dot (same sequential-double
    accumulation over ascending indices)."""
    emb = load(spark, sf_dir, "embeddings").limit(20)
    q = emb.limit(1).select(F.col("embedding").alias("qe"))
    pair = emb.crossJoin(F.broadcast(q))
    dense_dot = F.aggregate(
        F.zip_with(
            "embedding", "qe", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = pair.select(
        F.round(dense_dot, 6).alias("dense"),
        F.round(
            sparse_dot(
                sparse_from_dense("embedding", 0.0), sparse_from_dense("qe", 0.0)
            ),
            6,
        ).alias("sparse"),
    ).collect()
    for r in rows:
        assert r["dense"] == pytest.approx(r["sparse"], abs=1e-6)


def test_sparse_topk_plan_no_cartesian(spark, sf_dir):
    """The sparse search plan broadcasts the query side — no
    CartesianProduct, corpus scanned once."""
    emb = load(spark, sf_dir, "embeddings")
    sp = emb.select(
        "vec_id", sparse_from_dense("embedding", 0.15).alias("sparse")
    )
    queries = sp.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "sparse"
    )
    out = sparse_topk(sp, queries, k=5, metric="cosine")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    got = out.collect()
    assert len(got) == 10  # 2 queries x k=5
    # self-match ranks first with cosine 1.0
    best = {r["query_id"]: r for r in got if r["rank"] == 1}
    assert best[0]["vec_id"] == 0 and best[0]["score"] == pytest.approx(1.0)


def test_write_vdf_records_sparse_columns(spark, sf_dir, tmp_path):
    from vector_io_spark.format.reader import read_vdf
    from vector_io_spark.format.writer import write_vdf

    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").alias("vector"),
        sparse_from_dense("embedding", 0.15).alias("sparse_vector"),
    )
    out = str(tmp_path / "vdf_sparse")
    meta = write_vdf(
        {("emb", ""): emb},
        out,
        vector_columns=["vector"],
        sparse_vector_columns=["sparse_vector"],
    )
    ns = meta.indexes["emb"][0]
    assert ns.sparse_vector_columns == ["sparse_vector"]
    ds = read_vdf(spark, out)
    back = ds.df("emb")
    # struct<indices,values> survives the parquet roundtrip
    f = {fld.name: fld.dataType.simpleString() for fld in back.schema.fields}
    assert f["sparse_vector"] == "struct<indices:array<int>,values:array<float>>"
    row = back.where(F.col("id") == "7").select("sparse_vector").first()[0]
    assert list(row["indices"]) == sorted(row["indices"])
    assert len(row["indices"]) == len(row["values"]) > 0
    assert ds.meta.indexes["emb"][0].sparse_vector_columns == ["sparse_vector"]


class _FakePineconeIndex:
    def __init__(self):
        self.upserts: list[dict] = []

    def upsert(self, vectors):
        self.upserts.extend(vectors)


class _FakePinecone:
    def __init__(self):
        self.index = _FakePineconeIndex()

    def Index(self, name):  # noqa: N802 - SDK surface
        return self.index


def test_pinecone_sparse_values_passthrough():
    from vector_io_spark.sources.remote import PineconeConnector

    fake = _FakePinecone()
    conn = PineconeConnector(client=fake)
    batch = pd.DataFrame(
        {
            "id": ["a", "b"],
            "vector": [[1.0, 2.0], [3.0, 4.0]],
            "sparse_vector": [
                {"indices": [0, 5], "values": [0.5, 0.25]},
                None,
            ],
            "tag": ["x", None],
        }
    )
    conn.upsert_batch("idx", batch)
    a, b = fake.index.upserts
    assert a["sparse_values"] == {"indices": [0, 5], "values": [0.5, 0.25]}
    assert "sparse_values" not in b
    assert a["metadata"] == {"tag": "x"}  # sparse col not leaked into metadata
    assert "tag" not in b["metadata"]  # None dropped


def test_sparse_nnz_threshold_monotone(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings").limit(100)
    counts = emb.select(
        sparse_nnz(sparse_from_dense("embedding", 0.0)).alias("all_nz"),
        sparse_nnz(sparse_from_dense("embedding", 0.15)).alias("t15"),
        sparse_nnz(sparse_from_dense("embedding", 0.3)).alias("t30"),
    ).collect()
    for r in counts:
        assert r["all_nz"] >= r["t15"] >= r["t30"]
        assert r["all_nz"] <= 64


def test_binary_quantization_matches_numpy_packbits(spark, sf_dir):
    """Packed binary quantization == np.packbits (MSB-first) exactly —
    the sentence_transformers 'binary'/'ubinary' output shape the
    reference produces (reembed.py:500-512)."""
    import numpy as np

    from vector_io_spark.functions.vectors import quantize_embeddings

    emb = load(spark, sf_dir, "embeddings").limit(30)
    rows = quantize_embeddings(emb, "embedding", "ub", "ubinary")
    rows = quantize_embeddings(rows, "embedding", "sb", "binary")
    for r in rows.select("embedding", "ub", "sb").collect():
        expected = np.packbits(np.array(r["embedding"]) > 0)
        assert list(r["ub"]) == expected.tolist()
        assert list(r["sb"]) == (
            expected.astype(np.int16) - 128
        ).tolist()
        assert len(r["ub"]) == 8  # 64 dims -> 8 bytes
