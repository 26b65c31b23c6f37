"""Sparse-vector support: the column convention and Catalyst-only math.

Convention: a sparse vector is ``struct<indices: array<int>, values:
array<float>>`` with indices strictly ascending — the same
indices/values pair shape Pinecone's ``sparseValues`` uses
(pinecone_export.py:233-235, 460-462) and Qdrant's sparse vectors store
(qdrant_import.py:215-243 replays ``sparse_vectors_config``). It flows
through parquet/VDF untouched (a struct of two arrays), is recorded in
``NamespaceMeta.sparse_vector_columns``, and the Pinecone/Qdrant
adapters map it to/from their native sparse payloads.

All math here is pure Catalyst higher-order functions — codegen'd,
zero-shuffle, no Python in the hot path — because at 100 TB a sparse dot
product is a per-row map over (typically) tens of entries: exactly what
``zip_with``/``aggregate`` compile to. Accumulation is sequential
left-to-right in doubles so the DuckDB oracle
(``list_sum(list_transform(...))``) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SPARSE_STRUCT_DDL = "struct<indices: array<int>, values: array<float>>"


def sparse_from_dense(dense: Column | str, threshold: float = 0.0) -> Column:
    """Dense ``array<float>`` -> sparse struct, keeping entries with
    ``abs(x) > threshold``. Indices come out ascending because
    ``transform`` preserves element order."""
    col = F.col(dense) if isinstance(dense, str) else dense
    pairs = F.filter(
        F.transform(col, lambda x, i: F.struct(i.alias("i"), x.alias("x"))),
        lambda s: F.abs(s["x"]) > F.lit(threshold),
    )
    return F.struct(
        F.transform(pairs, lambda s: s["i"].cast("int")).alias("indices"),
        F.transform(pairs, lambda s: s["x"].cast("float")).alias("values"),
    )


def sparse_to_dense(sparse: Column | str, dims: int) -> Column:
    """Sparse struct -> dense ``array<float>`` of length ``dims``
    (missing indices are 0.0)."""
    col = F.col(sparse) if isinstance(sparse, str) else sparse
    m = F.map_from_arrays(col["indices"], col["values"])
    return F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda j: F.coalesce(m[j.cast("int")], F.lit(0.0)).cast("float"),
    )


def sparse_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two sparse structs: walk ``a``'s entries in stored
    (ascending-index) order, look each index up in ``b`` via a per-row
    map, accumulate sequentially in doubles. O(nnz_a) per row, codegen'd."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    bmap = F.map_from_arrays(cb["indices"], cb["values"])
    return F.aggregate(
        F.zip_with(
            ca["indices"],
            ca["values"],
            lambda i, v: F.coalesce(bmap[i], F.lit(0.0)).cast("double")
            * v.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sparse_norm(s: Column | str) -> Column:
    """L2 norm of a sparse struct (sequential double accumulation)."""
    col = F.col(s) if isinstance(s, str) else s
    return F.sqrt(
        F.aggregate(
            col["values"],
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def sparse_nnz(s: Column | str) -> Column:
    col = F.col(s) if isinstance(s, str) else s
    return F.size(col["indices"])


def sparse_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_col: str = "sparse",
    query_id: str = "query_id",
    query_col: str = "sparse",
    metric: str = "dot",
) -> DataFrame:
    """Sparse top-k search: broadcast the (small) query side, score every
    corpus row with a codegen'd sparse dot, window top-k per query.

    Plan shape for 100 TB: identical to the dense ``brute_force_topk`` —
    the corpus is scanned once and never shuffled; only the k×|queries|
    result rows enter the rank exchange. ``metric``: 'dot' or 'cosine'.

    Returns (query_id, <corpus_id>, score, rank).
    """
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("query_id"), F.col(query_col).alias("__q")
        )
    )
    scored = corpus.select(corpus_id, corpus_col).crossJoin(q)
    dot = sparse_dot(F.col(corpus_col), F.col("__q"))
    if metric == "cosine":
        # zero-norm guard (mirrors the dense cosine_similarity twin):
        # an all-zero sparse vector must score NULL, not raise
        # DIVIDE_BY_ZERO under Spark 4's default ANSI mode
        den = sparse_norm(F.col(corpus_col)) * sparse_norm(F.col("__q"))
        score = F.when(den != 0.0, dot / den)
    elif metric == "dot":
        score = dot
    else:
        raise ValueError(f"unsupported sparse metric: {metric}")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("score", F.round(score, 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            corpus_id,
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )
