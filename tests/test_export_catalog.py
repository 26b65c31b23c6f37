"""Catalog → dataset export (operators/export_catalog.py) — semantics
SQL can't express: the sparse struct round-trip, SQ8 reconstruction
bounds, tombstone exclusion, and the full export_index_to_vdf commit
(files + VDF_META.json). Exact IVF export values are oracle-gated
(queries.py index_export_roundtrip)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.export_catalog import (
    export_index_to_vdf,
    read_index_vectors,
    read_sparse_vectors,
    read_sq8_reconstructed,
)
from vector_io_spark.operators.ranking import bm25_sparse_vectors
from vector_io_spark.operators.similarity import (
    delete_from_index,
    write_ivf_index,
)
from vector_io_spark.operators.sparse_index import write_sparse_index
from vector_io_spark.operators.sq8 import write_sq8_index


def test_ivf_export_roundtrips_rows_and_metadata(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, num_cells=4, seed=7, metadata_cols=("label",))
    out = read_index_vectors(spark, path)
    assert sorted(out.columns) == ["embedding", "label", "vec_id"]
    want = {
        (r["vec_id"], r["label"], tuple(r["embedding"]))
        for r in emb.collect()
    }
    got = {
        (r["vec_id"], r["label"], tuple(r["embedding"]))
        for r in out.collect()
    }
    assert got == want

    # tombstoned ids are excluded
    delete_from_index(spark, path, [3, 4], delete_token="exp-d1")
    ids = {r["vec_id"] for r in read_index_vectors(spark, path).collect()}
    assert ids == {r["vec_id"] for r in emb.collect()} - {3, 4}


def test_sparse_export_reassembles_original_structs(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs = bm25_sparse_vectors(d, "doc_id", "text", vocab_buckets=4096)
    path = str(tmp_path / "sparse")
    write_sparse_index(docs, path, num_shards=16)

    def as_map(df, col):
        return {
            r["doc_id"]: (
                tuple(r[col]["indices"]),
                tuple(r[col]["values"]),
            )
            for r in df.collect()
        }

    want = as_map(docs, "sparse")
    got = as_map(read_sparse_vectors(spark, path), "sparse")
    assert got == want


def test_sq8_export_reconstruction_error_is_bounded(spark, sf_dir, tmp_path):
    """Reconstruction is lossy by at most span/510 per component (half
    a quantization step) — the documented bound."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "sq8")
    write_sq8_index(emb, path, num_cells=4, seed=7)
    brow = spark.read.parquet(f"{path}/bounds").collect()[0]
    spans = [h - lo for h, lo in zip(brow["his"], brow["los"])]
    tol = [s / 510.0 + 1e-9 for s in spans]

    orig = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    out = read_sq8_reconstructed(spark, path)
    assert "code" not in out.columns and "cell" not in out.columns
    for r in out.limit(200).collect():
        o = orig[r["vec_id"]]
        for i, (a, b) in enumerate(zip(o, r["embedding"])):
            assert abs(float(a) - float(b)) <= tol[i], (r["vec_id"], i)


def test_export_index_to_vdf_commits_dataset(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, num_cells=4, seed=7)
    ds = str(tmp_path / "vdf_out")
    meta = export_index_to_vdf(
        spark, path, ds, kind="ivf", index_name="embs", metric="cosine"
    )
    # VDF_META.json on disk and consistent
    mpath = os.path.join(ds, "VDF_META.json")
    assert os.path.exists(mpath)
    m = json.load(open(mpath))
    assert m["exported_from"] == "vdf_spark_catalog_ivf"
    ns = m["indexes"]["embs"][0]
    assert ns["total_vector_count"] == emb.count()
    assert ns["dimensions"] == 64
    # the exported data reads back identically
    back = spark.read.parquet(os.path.join(ds, "embs"))
    assert back.count() == emb.count()
    assert {r["vec_id"] for r in back.select("vec_id").collect()} == {
        r["vec_id"] for r in emb.collect()
    }

    with pytest.raises(ValueError, match="unknown kind"):
        export_index_to_vdf(spark, path, str(tmp_path / "x"), kind="hnsw")


def test_sparse_export_to_vdf(spark, sf_dir, tmp_path):
    d = load(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    docs = bm25_sparse_vectors(d, "doc_id", "text", vocab_buckets=512)
    path = str(tmp_path / "sparse")
    write_sparse_index(docs, path, num_shards=8)
    ds = str(tmp_path / "vdf_sparse")
    meta = export_index_to_vdf(
        spark, path, ds, kind="sparse", index_name="docs",
        id_column="doc_id", vector_column="sparse", metric="dotproduct",
    )
    ns = json.load(open(os.path.join(ds, "VDF_META.json")))
    ns0 = ns["indexes"]["docs"][0]
    assert ns0["sparse_vector_columns"] == ["sparse"]
    back = spark.read.parquet(os.path.join(ds, "docs"))
    assert back.count() == 50
    assert back.schema["sparse"].dataType.simpleString().startswith("struct")
