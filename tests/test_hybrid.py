"""Catalog-served hybrid search (operators/hybrid.py) — semantics SQL
can't express: the dense-leg dispatch across every persisted catalog
kind (VERDICT r10 Next #8), single/batch consistency, and the unknown-
kind refusal. Exact fused values are oracle-gated
(queries.py hybrid_indexed_search / hybrid_indexed_batch /
hybrid_indexed_sq8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.operators.hybrid import (
    hybrid_indexed_topk,
    hybrid_indexed_topk_batch,
)
from vector_io_spark.operators.ranking import bm25_sparse_vectors
from vector_io_spark.operators.similarity import (
    write_ivf_index,
    write_ivfpq_index,
)
from vector_io_spark.operators.sparse_index import write_sparse_index
from vector_io_spark.operators.sq8 import write_sq8_index


@pytest.fixture(scope="module")
def hybrid_stores(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("hybrid")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    sv = bm25_sparse_vectors(docs, "doc_id", "text", vocab_buckets=512)
    spath = str(root / "sparse")
    write_sparse_index(sv, spath, num_shards=8)

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dense = {}
    p = str(root / "ivf")
    write_ivf_index(emb, p, num_cells=4, seed=7)
    dense["ivf"] = p
    p = str(root / "sq8")
    write_sq8_index(emb, p, num_cells=4, seed=7)
    dense["sq8"] = p
    p = str(root / "ivfpq")
    write_ivfpq_index(
        emb, p, num_cells=4, num_subspaces=8, codebook_size=16, seed=11
    )
    dense["ivfpq"] = p
    return spath, dense, emb


def _query_entries(spark, spath):
    # probe buckets that actually carry postings (guaranteed lexical hits)
    bks = sorted(
        r["bucket"]
        for r in spark.read.parquet(f"{spath}/postings")
        .select("bucket").distinct().limit(3).collect()
    )
    return [(b, 1.0) for b in bks]


@pytest.mark.parametrize("kind", ["ivf", "sq8", "ivfpq"])
def test_hybrid_dense_leg_dispatches_every_catalog_kind(
    spark, sf_dir, hybrid_stores, kind
):
    """The fused result for each dense_kind must equal hand-composing
    rrf_fuse with that kind's own probe — dispatch is exact, fusion is
    kind-agnostic (RRF consumes rank order only)."""
    from vector_io_spark.operators.hybrid import _dense_probe
    from vector_io_spark.operators.ranking import rrf_fuse
    from vector_io_spark.operators.sparse_index import (
        sparse_index_probe_topk,
    )

    spath, dense, emb = hybrid_stores
    entries = _query_entries(spark, spath)
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = hybrid_indexed_topk(
        spark, spath, dense[kind], entries, q,
        k=15, shortlist=50, nprobe=4, dense_kind=kind,
    ).collect()
    assert 0 < len(got) <= 15
    assert all(r["n_rankers"] in (1, 2) for r in got)

    lex = sparse_index_probe_topk(
        spark, spath, entries, k=50
    ).select("doc_id", "rank")
    dl = _dense_probe(spark, dense[kind], kind, q, 50, 4).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = {
        r["doc_id"]: (r["rrf_score"], r["n_rankers"])
        for r in rrf_fuse([lex, dl], "doc_id").collect()
    }
    for r in got:
        assert fused[r["doc_id"]] == (r["rrf_score"], r["n_rankers"]), r


@pytest.mark.parametrize("kind", ["ivf", "sq8", "ivfpq"])
def test_hybrid_batch_single_query_matches_single_form(
    spark, sf_dir, hybrid_stores, kind
):
    spath, dense, emb = hybrid_stores
    entries = _query_entries(spark, spath)
    q = emb.where(F.col("vec_id") == 0).select(
        F.lit("q0").alias("query_id"), "embedding"
    )
    single = hybrid_indexed_topk(
        spark, spath, dense[kind], entries, q,
        k=10, shortlist=50, nprobe=4, dense_kind=kind,
    ).collect()
    batch = hybrid_indexed_topk_batch(
        spark, spath, dense[kind], [("q0", entries)], q,
        k=10, shortlist=50, nprobe=4, dense_kind=kind,
    ).collect()
    assert {(r["doc_id"], r["rrf_score"], r["n_rankers"]) for r in single} \
        == {(r["doc_id"], r["rrf_score"], r["n_rankers"]) for r in batch}


def test_hybrid_unknown_dense_kind_refuses(spark, sf_dir, hybrid_stores):
    spath, dense, emb = hybrid_stores
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="dense_kind"):
        hybrid_indexed_topk(
            spark, spath, dense["ivf"], [(1, 1.0)], q, dense_kind="hnsw"
        )


def test_hybrid_single_form_refuses_multi_query_frame(
    spark, sf_dir, hybrid_stores
):
    """ADVICE r11: a multi-row queries frame used to make the dense leg
    emit per-query ranks that doc_id-grouped fusion silently summed
    against the one un-keyed lexical ranking — now it refuses and
    routes to the batch form."""
    spath, dense, emb = hybrid_stores
    entries = _query_entries(spark, spath)
    q2 = emb.where(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="hybrid_indexed_topk_batch"):
        hybrid_indexed_topk(
            spark, spath, dense["ivf"], entries, q2,
            k=5, shortlist=20, nprobe=4,
        )
