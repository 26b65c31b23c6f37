"""Smoke tests: every operator family runs and returns sane results."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import load
from vector_io_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
    word_shingles,
)
from vector_io_spark.functions.vectors import (
    coerce_vector_column,
    cosine_similarity,
    vector_dim,
)
from vector_io_spark.operators.aggregates import vector_range_stats
from vector_io_spark.operators.dedup import (
    dedup_by_id,
    dedup_exact_content,
    minhash_lsh_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
)
from vector_io_spark.operators.filters import filter_id_range
from vector_io_spark.operators.joins import (
    anti_join_missing_ids,
    vectors_metadata_outer_join,
)
from vector_io_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk


def test_vector_basics(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    assert vector_dim(emb, "embedding") == 64
    coerced = coerce_vector_column(emb, "embedding")
    assert dict(coerced.dtypes)["embedding"] == "array<float>"
    sims = emb.limit(5).select(
        cosine_similarity("embedding", "embedding").alias("s")
    ).collect()
    for r in sims:
        assert abs(r["s"] - 1.0) < 1e-9


def test_range_stats(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    stats = vector_range_stats(emb, "embedding")
    rows = stats.collect()
    assert len(rows) == 64
    assert all(r["dim_min"] <= r["dim_max"] for r in rows)


def test_filters_and_joins(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    sub = filter_id_range(emb, "vec_id", 10, 99)
    assert sub.count() == 90
    joined = vectors_metadata_outer_join(
        emb.withColumnRenamed("vec_id", "id"),
        docs.withColumnRenamed("doc_id", "id"),
        id_col="id",
    )
    assert joined.count() >= emb.count()
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    missing = anti_join_missing_ids(
        orders.select(F.col("o_orderkey").alias("id")),
        li.select(F.col("l_orderkey").alias("id")),
    )
    assert missing.count() >= 0


def test_dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    doubled = docs.union(docs)
    dd = dedup_by_id(doubled, "doc_id")
    assert dd.count() == docs.count()
    dc = dedup_exact_content(doubled, "doc_id", "text")
    assert dc.count() <= docs.count()


def test_minhash_and_simhash(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(100)
    sigs = minhash_signatures(docs, "doc_id", "text", num_hashes=8)
    r = sigs.first()
    assert len(r["minhash"]) == 8
    # identical texts must collide at threshold 1.0
    dup = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    pairs = minhash_lsh_dup_pairs(
        docs.select("doc_id", "text").union(dup), "doc_id", "text",
        num_hashes=8, bands=4, threshold=0.99,
    )
    assert pairs.count() >= 100
    fp = docs.select(simhash("text", bits=16).alias("fp")).first()["fp"]
    assert 0 <= fp < 2**16
    sp = simhash_dup_pairs(
        docs.select("doc_id", "text").union(dup), "doc_id", "text",
        bits=16, max_hamming=0, chunks=4,
    )
    assert sp.count() >= 100


def test_ngram_jaccard(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(50)
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    pairs = ngram_jaccard_pairs(
        docs.select("doc_id", "text").union(dup), "doc_id", "text", threshold=0.999
    )
    assert pairs.count() >= 50


def test_ngram_jaccard_lazy_plan_path_matches(spark, sf_dir):
    """materialize=False (the r13 plan-capture path) must return the
    same pair set as the checkpointed default — pins the count-window
    df_sh + persisted-prefix staging against the released result."""
    from vector_io_spark.cache_registry import release_pending

    docs = load(spark, sf_dir, "documents").limit(40)
    dup = docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    corpus = docs.select("doc_id", "text").union(dup)
    eager = sorted(
        map(tuple, ngram_jaccard_pairs(corpus, "doc_id", "text").collect())
    )
    lazy = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                corpus, "doc_id", "text", materialize=False
            ).collect(),
        )
    )
    release_pending()
    assert eager == lazy and len(eager) >= 40


def test_cache_registry_releases_once():
    """register() queues frames; release_pending() unpersists each
    exactly once, tolerating already-dead sessions."""
    from vector_io_spark import cache_registry

    class _Frame:
        def __init__(self, boom=False):
            self.calls = 0
            self.boom = boom

        def unpersist(self):
            self.calls += 1
            if self.boom:
                raise RuntimeError("session stopped")

    ok, dead = _Frame(), _Frame(boom=True)
    cache_registry.register(ok, dead)
    cache_registry.release_pending()
    assert ok.calls == 1 and dead.calls == 1
    cache_registry.release_pending()  # queue drained — no re-release
    assert ok.calls == 1 and dead.calls == 1


def test_similarity_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = brute_force_topk(emb, queries, k=5)
    rows = topk.collect()
    assert len(rows) == 15
    # self-match must rank first with score ~1
    firsts = {r["query_id"]: r for r in rows if r["rank"] == 1}
    for qid, r in firsts.items():
        assert r["vec_id"] == qid and abs(r["score"] - 1.0) < 1e-4
    approx = lsh_bucketed_topk(emb, queries, k=5)
    arows = approx.collect()
    assert 0 < len(arows) <= 15
    afirsts = {r["query_id"]: r for r in arows if r["rank"] == 1}
    for qid, r in afirsts.items():
        assert r["vec_id"] == qid  # self always collides in every band


def test_text_functions(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    out = docs.select(
        token_count("text").alias("ntok"),
        language_id("text").alias("lang"),
        quality_score("text").alias("q"),
        doc_fingerprint("text").alias("fp"),
        word_shingles("text", 3).alias("sh"),
    ).collect()
    for r in out:
        assert r["ntok"] > 0
        assert len(r["fp"]) == 32
        assert 0.0 <= r["q"]["score"] <= 1.0
