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
