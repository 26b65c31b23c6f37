"""BM25 + RRF semantics (operators/ranking.py)."""

from pyspark.sql import functions as F

from vector_io_spark.operators.ranking import bm25_scores, rrf_fuse


def test_bm25_semantics(spark):
    rows = [
        (1, "hash join hash join hash"),   # both terms, short
        (2, "hash " + "pad " * 100),       # one term, long doc
        (3, "nothing relevant here"),      # no terms -> absent
        (4, "join"),                       # one term, shortest
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["hash", "join"]).collect()}
    assert 3 not in got
    # two matching terms with high tf in a short doc beats single-term docs
    assert got[1] > got[2] and got[1] > got[4]
    # same tf=1 for 'hash': longer doc scores lower (length normalization)
    assert got[4] > got[2]


def test_rrf_fuse_membership_and_order(spark):
    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    r2 = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank long")
    got = {r["doc_id"]: r for r in rrf_fuse([r1, r2]).collect()}
    assert got[1]["n_rankers"] == 2 and got[9]["n_rankers"] == 1
    # doc 1 (ranks 1+2) beats doc 3 (ranks 3+1): 1/61+1/62 > 1/63+1/61
    assert got[1]["rrf_score"] > got[3]["rrf_score"]
    # every score positive, two-ranker doc beats equally-ranked singleton
    assert got[2]["rrf_score"] > got[9]["rrf_score"]


def test_bm25_sparse_vector_struct_invariants(spark):
    from vector_io_spark.operators.ranking import bm25_sparse_vectors

    rows = [(1, "hash join hash scan"), (2, "filter " * 30), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_sparse_vectors(df, vocab_buckets=64)
    got = {r["doc_id"]: r["sparse"] for r in out.collect()}
    assert 3 not in got or len(got[3]["indices"]) == 0
    for sv in got.values():
        idx = sv["indices"]
        assert list(idx) == sorted(idx)              # ascending
        assert len(idx) == len(set(idx))             # merged collisions
        assert len(idx) == len(sv["values"])
        assert all(v > 0 for v in sv["values"])      # BM25 weights positive
    # schema matches the engine's sparse convention
    f = dict(out.dtypes)["sparse"]
    assert f == "struct<indices:array<int>,values:array<float>>"
    # repeated-term doc: one entry, tf folded in (weight reflects tf=30)
    assert len(got[2]["indices"]) == 1


def test_weighted_score_fusion_semantics(spark):
    """Convex fusion (r9): min-max per leg, missing doc = 0 for that
    leg, constant-score leg normalizes to 1.0, and validation errors
    are loud. Values are oracle-gated (hybrid_weighted_search)."""
    import pytest

    from vector_io_spark.operators.ranking import weighted_score_fusion

    lex = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "doc_id long, score double"
    )
    dense = spark.createDataFrame(
        [(2, 0.9), (3, 0.1), (9, 0.5)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: r
        for r in weighted_score_fusion([lex, dense], [0.5, 0.5]).collect()
    }
    # doc 1: lex-normalized 1.0, absent dense -> 0.5*1 + 0.5*0
    assert got[1]["fused_score"] == 0.5 and got[1]["n_rankers"] == 1
    # doc 2: lex (5-0)/(10-0)=0.5, dense (0.9-0.1)/(0.8)=1.0
    assert got[2]["fused_score"] == 0.75 and got[2]["n_rankers"] == 2
    # doc 9: dense (0.5-0.1)/0.8=0.5 -> 0.25
    assert got[9]["fused_score"] == 0.25

    # constant-score leg: everyone ties at 1.0
    flat = spark.createDataFrame(
        [(1, 2.0), (2, 2.0)], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: r["fused_score"]
        for r in weighted_score_fusion([flat], [1.0]).collect()
    }
    assert got == {1: 1.0, 2: 1.0}

    with pytest.raises(ValueError, match="empty"):
        weighted_score_fusion([], [])
    with pytest.raises(ValueError, match="weights"):
        weighted_score_fusion([lex], [0.5, 0.5])


def test_rrf_fuse_grouped_stays_within_query(spark):
    """r10: group_cols=('query_id',) fuses per query — a doc ranked in
    q0's legs must get no contribution from its rank in q1's legs, and
    the grouped result for each query must equal the ungrouped fusion
    of that query's legs alone."""
    r1 = spark.createDataFrame(
        [("q0", 1, 1), ("q0", 2, 2), ("q1", 1, 1), ("q1", 7, 2)],
        "query_id string, doc_id long, rank long",
    )
    r2 = spark.createDataFrame(
        [("q0", 2, 1), ("q0", 9, 2), ("q1", 1, 3)],
        "query_id string, doc_id long, rank long",
    )
    got = {
        (r["query_id"], r["doc_id"]): r
        for r in rrf_fuse([r1, r2], group_cols=("query_id",)).collect()
    }
    # per-group ranker counts (doc 1: 2 legs in q1, 1 leg in q0)
    assert got[("q0", 1)]["n_rankers"] == 1
    assert got[("q1", 1)]["n_rankers"] == 2
    assert got[("q0", 2)]["n_rankers"] == 2
    # equivalence with ungrouped fusion of one query's slice
    solo = {
        r["doc_id"]: (r["rrf_score"], r["n_rankers"])
        for r in rrf_fuse(
            [
                r1.where(F.col("query_id") == "q1").drop("query_id"),
                r2.where(F.col("query_id") == "q1").drop("query_id"),
            ]
        ).collect()
    }
    for doc, (s, n) in solo.items():
        assert got[("q1", doc)]["rrf_score"] == s
        assert got[("q1", doc)]["n_rankers"] == n
