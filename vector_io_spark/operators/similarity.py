"""Similarity search over an embedding column (array<float>).

Two strategies:
- ``brute_force_topk``: exact cosine top-k per query — broadcast the query
  set, codegen'd dot products over the corpus scan, per-query top-k via
  window. The correctness baseline; also the right plan when the query set
  is small (the 100 TB corpus is scanned once, never shuffled — only
  (query_id, corpus_id, score) tuples shuffle for the top-k).
- ``lsh_bucketed_topk``: random-hyperplane LSH bucketing — queries and
  corpus hash to signature buckets; only colliding buckets score. The
  recall/speed knob is (num_planes, bands). At 100 TB this turns a full
  scan per query batch into a bucket-pruned probe; an IVF variant would
  replace the hash with k-means cell assignment, same join shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from vector_io_spark.functions.vectors import cosine_similarity, dot_product, l2_distance
from vector_io_spark.operators.dedup import _hyperplane_signature

_METRIC_FNS = {
    "cosine": cosine_similarity,
    "dot": dot_product,
    "euclid": l2_distance,
}


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cosine",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for every query row.

    Returns (query_id, vec_id, score, rank), rank 1..k, deterministic
    tie-break on corpus id. Query side is broadcast: the corpus — the
    100 TB side — is scanned in place and never shuffled; the shuffle that
    ranks top-k moves only (query, id, score) triples, and Catalyst plans
    per-partition partial top-k (TakeOrdered-style) under the window+filter.
    """
    score_fn = _METRIC_FNS[metric]
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    asc = metric == "euclid"  # distances rank ascending, similarities descending
    scored = corpus.crossJoin(broadcast(q)).select(
        "query_id",
        F.col(corpus_id),
        F.round(score_fn(F.col(corpus_vec), F.col("__qv")), 6).alias("score"),
    )
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(corpus_id).asc()]
    w = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", corpus_id, "score", "rank")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 16,
    bands: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane signatures on both sides,
    candidate join on signature bands, exact cosine re-rank of candidates.

    Recall < 1 by design (bucket misses); rank/score of returned rows are
    exact. Returns (query_id, vec_id, score, rank).
    """
    rows = num_planes // bands

    def banded(df: DataFrame, idc: str, vc: str, out_id: str) -> DataFrame:
        sig = _hyperplane_signature(df, idc, vc, num_planes)
        band_arr = F.array(
            *[
                F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))
                for b in range(bands)
            ]
        )
        return sig.select(
            F.col(idc).alias(out_id), F.posexplode(band_arr).alias("band_id", "band_key")
        )

    cb = banded(corpus, corpus_id, corpus_vec, "__cid")
    qb = banded(queries, query_id, query_vec, "__qid")
    cand = (
        cb.join(broadcast(qb), ["band_id", "band_key"])
        .select(F.col("__cid"), F.col("__qid"))
        .dropDuplicates(["__cid", "__qid"])
    )
    scored = (
        cand.join(
            corpus.select(F.col(corpus_id).alias("__cid"), F.col(corpus_vec).alias("__cv")),
            "__cid",
        )
        .join(
            broadcast(
                queries.select(F.col(query_id).alias("__qid"), F.col(query_vec).alias("__qv"))
            ),
            "__qid",
        )
        .select(
            F.col("__qid").alias("query_id"),
            F.col("__cid").alias(corpus_id),
            F.round(cosine_similarity("__cv", "__qv"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", corpus_id, "score", "rank")
    )
