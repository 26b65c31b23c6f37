"""Persisted sparse (posting-list) retrieval catalog — the
Pinecone/Qdrant "sparse index" served by the engine, completing the
catalog family (dense: IVF / SQ8 / PQ / IVFPQ; late-interaction: token
index; sparse: THIS).

The scan form (queries.py sparse_keyword_retrieval) evaluates a
sparse dot against EVERY document's sparse vector per query — fine for
one-off batches, linear in corpus per query. The catalog inverts that:
``write_sparse_index`` explodes (doc, bucket, weight) entries and
partitions them by ``shard = bucket % num_shards``; a query touches
only the shards its term buckets live in (directory-level partition
pruning) and, inside them, only the matching posting rows (pushed
``bucket IN (...)`` filter). Score accumulation is per-doc map-side
partial aggregation — the classic inverted-index query plan, in
Catalyst.

Exactness: stored weights are 1e-6-quantized floats (the
bm25_sparse_vectors contract), so ``round(w · 1e6)`` recovers exact
integers; scores are BIGINT sums of ``wd_int · wq_int`` divided by
1e12 — order-independent, hash-exact against a pure-SQL oracle
(queries.py sparse_indexed_retrieval).

Scale shape: the build is one explode + partitionBy write (the index
job). A probe reads |query-bucket shards| / num_shards of the index —
corpus-size-independent I/O for fixed vocabulary — shuffles only the
per-doc partial sums of matching postings, and ranks a
WindowGroupLimit-bounded top-k. Query state is the bounded term list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_io_spark.operators.similarity import (
    _apply_tombstones,
    _idempotent_delta_write,
)


def write_sparse_index(
    doc_sparse: DataFrame,
    path: str,
    doc_id: str = "doc_id",
    sparse_col: str = "sparse",
    num_shards: int = 64,
) -> None:
    """Persist sparse document vectors (struct<indices array<int>,
    values array<float>>, e.g. from
    :func:`~vector_io_spark.operators.ranking.bm25_sparse_vectors`) as
    a shard-partitioned posting-list layout:
    ``<path>/postings/shard=<s>/`` rows (doc_id, bucket, weight) and a
    one-row ``<path>/meta`` (num_shards)."""
    spark = doc_sparse.sparkSession
    entries = doc_sparse.select(
        F.col(doc_id).alias("doc_id"),
        F.explode(
            F.arrays_zip(f"{sparse_col}.indices", f"{sparse_col}.values")
        ).alias("__e"),
    ).select(
        "doc_id",
        F.col("__e.indices").alias("bucket"),
        F.col("__e.values").alias("weight"),
        (F.col("__e.indices") % num_shards).alias("shard"),
    )
    entries.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/postings"
    )
    spark.createDataFrame(
        [(int(num_shards),)], "num_shards int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def append_to_sparse_index(
    doc_sparse: DataFrame,
    path: str,
    delta_token: str,
    doc_id: str = "doc_id",
    sparse_col: str = "sparse",
) -> None:
    """Incremental sparse-catalog maintenance: explode a delta batch of
    new documents' sparse vectors and append their postings into the
    existing shard layout — the same exactly-once contract as the
    vector catalogs (``_idempotent_delta_write``: `_MAINT` mutex,
    hidden staging, deterministic renames, `_DELTA-<token>` ledger; a
    committed token's re-run is a pure no-op). Appending an
    already-indexed doc would double its postings — token-keyed appends
    cannot, and a genuine duplicate id is an upstream bug, same stance
    as the vector catalogs.

    Scale shape: one explode + partitionBy shuffle of the DELTA only;
    renames are metadata ops; nothing resident is read or rewritten.
    """
    spark = doc_sparse.sparkSession
    num_shards = int(
        spark.read.parquet(f"{path}/meta").collect()[0]["num_shards"]
    )
    entries = doc_sparse.select(
        F.col(doc_id).alias("doc_id"),
        F.explode(
            F.arrays_zip(f"{sparse_col}.indices", f"{sparse_col}.values")
        ).alias("__e"),
    ).select(
        "doc_id",
        F.col("__e.indices").alias("bucket"),
        F.col("__e.values").alias("weight"),
        (F.col("__e.indices") % num_shards).alias("shard"),
    )
    _idempotent_delta_write(
        entries, f"{path}/postings", delta_token, partition_col="shard"
    )


def sparse_index_probe_topk(
    spark,
    path: str,
    query_entries: list,
    k: int = 10,
    query_id="q0",
) -> DataFrame:
    """Top-k sparse retrieval from the posting-list catalog.
    ``query_entries`` is the bounded [(bucket, weight), ...] sparse
    query (weights 1e-6-quantized like the stored side; a keyword query
    is just weight-1.0 entries over its term buckets — see
    :func:`~vector_io_spark.functions.sparse` helpers for hashing).

    Returns (query_id, doc_id, score, rank), score = Σ wd·wq over
    matching buckets via exact integer micro-unit arithmetic
    (BIGINT Σ wd_int·wq_int / 1e12, rounded 6 dp), rank best-first
    with ascending-doc_id tie-break.

    Plan: shard partition pruning (only shards containing query
    buckets are read — PartitionFilters), pushed bucket-IN filter,
    broadcast of the tiny query-weight table, map-side partial per-doc
    sums, WindowGroupLimit top-k.
    """
    if not query_entries:
        raise ValueError(
            "sparse_index_probe_topk: query_entries is empty — a sparse "
            "query needs at least one (bucket, weight) entry"
        )
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    num_shards = int(meta["num_shards"])
    qb = {}
    for b, w in query_entries:
        qb[int(b)] = qb.get(int(b), 0) + int(round(float(w) * 1e6))
    shards = sorted({b % num_shards for b in qb})
    buckets = sorted(qb)
    qdf = spark.createDataFrame(
        [(b, qb[b]) for b in buckets], "bucket int, wq_int bigint"
    )
    scan = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("shard").isin(shards))
        .where(F.col("bucket").isin(buckets))
    )
    # deleted docs stop matching immediately (delete_from_index writes
    # doc_id tombstones at the index root; compaction applies them
    # physically) — broadcast anti-join after partition pruning, same
    # contract as the vector catalogs
    scan = _apply_tombstones(spark, path, scan, "sparse_index_probe_topk")
    scored = (
        scan.join(F.broadcast(qdf), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.round(F.col("weight").cast("double") * 1e6).cast("bigint")
                * F.col("wq_int")
            ).alias("__s")
        )
        .select(
            F.lit(query_id).alias("query_id"),
            "doc_id",
            F.round(F.col("__s").cast("double") / 1e12, 6).alias("score"),
            F.col("__s"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
