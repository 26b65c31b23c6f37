"""Keyword (BM25) scoring and hybrid rank fusion (RRF).

Hybrid search — fuse a lexical ranking with a dense-vector ranking — is
first-class in the vector-DB ecosystem the reference targets (Pinecone/
Qdrant/Weaviate all expose it); this module provides the Spark-native
version: BM25 from one corpus aggregation pass, reciprocal-rank fusion
as a union + groupBy.

Engine-exactness: per-(doc, term) BM25 contributions and per-(ranker,
rank) RRF contributions are quantized to fixed-point BIGINTs before any
cross-row sum, so aggregation order can never change a result bit.

Scale shape: the token stream filters to the QUERY TERMS immediately
after the explode (a handful of terms — the filtered stream is tiny no
matter the corpus); corpus constants (N, avgdl) are one aggregate row
broadcast everywhere; rankings union as (id, rank) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_io_spark.functions.text import WORD_RE, tokens


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    pattern: str = WORD_RE,
    scale: int = 6,
) -> DataFrame:
    """BM25 score of every document against a bag of query terms.

    idf(t) = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)   (Lucene form)
    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                       (tf(t,d) + k1·(1 - b + b·dl(d)/avgdl))

    One explode pass computes doc lengths AND query-term tfs (the
    filter to query terms happens inside the aggregation, so the only
    corpus-sized shuffle is the per-doc aggregate); N/avgdl/df are a
    broadcast scalar row + a terms-sized table. Per-(doc, term) scores
    quantize to 10^-scale units before the per-doc sum. Documents
    matching no term are absent (score 0 by convention).
    """
    term_arr = F.array(*[F.lit(t) for t in query_terms])
    per_doc = df.select(
        F.col(id_col),
        tokens(text_col, pattern).alias("__t"),
    ).select(
        id_col,
        F.size("__t").cast("long").alias("__dl"),
        F.filter("__t", lambda t: F.array_contains(term_arr, t)).alias("__qt"),
    )
    per_doc = per_doc.persist()
    per_doc.count()  # eager fill: 2 consumers (consts agg + tf explode)
    consts = per_doc.agg(
        F.count("*").alias("__n_docs"),
        F.sum("__dl").alias("__sum_dl"),
    )
    tf = per_doc.select(
        id_col, "__dl", F.explode("__qt").alias("term")
    ).groupBy(id_col, "__dl", "term").agg(F.count("*").cast("long").alias("__tf"))
    dfreq = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("__df")
    )
    avgdl = F.col("__sum_dl").cast("double") / F.col("__n_docs")
    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    unit = float(10 ** scale)
    contrib = F.round(
        idf
        * (F.col("__tf") * (k1 + 1.0))
        / (
            F.col("__tf")
            + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl)
        )
        * unit
    ).cast("long")
    out = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .select(id_col, contrib.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.round(F.sum("__c") / unit, 4).alias("bm25")
        )
    )
    # materialize the (small) score table, then release the token cache —
    # same cache-hygiene contract as dedup._materialize_release
    out = out.localCheckpoint(eager=True)
    per_doc.unpersist()
    return out


def bm25_sql(
    table: str,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    pattern: str = WORD_RE,
    scale: int = 6,
) -> str:
    """DuckDB oracle replicating :func:`bm25_scores` bit-for-bit.

    ``pattern`` mirrors bm25_scores' tokenizer regex — both engines use
    RE2-compatible syntax, so the pattern splices through verbatim
    (single quotes escaped). Terms are likewise quote-escaped, so a
    term containing ``'`` can't break or silently diverge the oracle.
    """
    sq = lambda s: s.replace("'", "''")
    terms = ", ".join(f"'{sq(t)}'" for t in query_terms)
    unit = float(10 ** scale)
    return f"""
    WITH d AS (
        SELECT {id_col},
               regexp_extract_all(lower({text_col}), '{sq(pattern)}') AS toks
        FROM {table}
    ),
    pd AS (SELECT {id_col}, CAST(len(toks) AS BIGINT) AS dl,
                  list_filter(toks, t -> t IN ({terms})) AS qt
           FROM d),
    consts AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(dl) AS BIGINT) AS sum_dl FROM pd),
    tf AS (SELECT {id_col}, dl, term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT {id_col}, dl, unnest(qt) AS term FROM pd)
           GROUP BY {id_col}, dl, term),
    dfreq AS (SELECT term, CAST(count(DISTINCT {id_col}) AS BIGINT) AS df
              FROM tf GROUP BY term)
    SELECT {id_col},
           round(CAST(sum(CAST(round(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * ({k1} + 1.0))
               / (tf + {k1} * (1.0 - {b}
                   + {b} * CAST(dl AS DOUBLE)
                     / (CAST(sum_dl AS DOUBLE) / n_docs)))
               * {unit}) AS BIGINT)) AS DOUBLE) / {unit}, 4) AS bm25
    FROM tf JOIN dfreq USING (term), consts
    GROUP BY {id_col}
    """


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    scale: int = 9,
    group_cols: tuple = (),
) -> DataFrame:
    """Reciprocal-rank fusion: score(d) = Σ_r 1/(rrf_k + rank_r(d)) over
    every ranking that contains d. Each contribution quantizes to
    10^-scale units (BIGINT) before the sum — exact for ANY number of
    rankers. Input rankings are (id, rank) pairs; union + one groupBy,
    nothing corpus-sized moves.

    ``group_cols`` (r10) fuses PER GROUP — pass ``("query_id",)`` when
    each ranking carries a whole query batch (per-query ranks) and
    fusion must stay within each query: the serving shape of the
    catalog-probe legs, which all emit (query_id, id, rank) batches.
    Same single union + groupBy; the group key rides the shuffle key.
    """
    if not rankings:
        raise ValueError(
            "rrf_fuse: rankings is empty — at least one (id, rank) "
            "frame is required"
        )
    unit = float(10 ** scale)
    keys = [*group_cols, id_col]
    parts = []
    for r in rankings:
        parts.append(
            r.select(
                *[F.col(c) for c in keys],
                F.round(unit / (F.lit(rrf_k) + F.col(rank_col)))
                .cast("long")
                .alias("__c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.round(F.sum("__c") / unit, 6).alias("rrf_score"),
        F.count("*").cast("long").alias("n_rankers"),
    )


def weighted_score_fusion(
    rankings: list[DataFrame],
    weights: list[float],
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Convex-combination hybrid fusion — the Weaviate ``alpha`` /
    relativeScoreFusion convention (and Pinecone's recommended
    normalized weighted hybrid), complementing :func:`rrf_fuse`:
    each ranking's shortlist scores are min-max normalized to [0, 1]
    WITHIN that ranking, then combined as Σ wᵢ · normᵢ(d), a doc
    missing from a ranking contributing 0 for that leg.

    Determinism/exactness: callers pass shortlists whose scores are
    already rounded (6 dp house rule); min/max are exact, and the
    normalize → weight → sum chain is a fixed sequence of double ops
    replicated verbatim by the SQL oracle (hybrid_weighted_search), so
    fused scores are hash-exact. A ranking whose shortlist has a single
    distinct score normalizes every doc to 1.0 (all tied at the top).

    Returns (id_col, fused_score, n_rankers). Scale shape: inputs are
    SHORTLISTS (top-N per leg, bounded); per-leg stats are one tiny agg
    broadcast back over the shortlist; the fusion joins are
    shortlist-sized — nothing corpus-scale moves here (the legs
    themselves own the corpus scans).
    """
    if not rankings:
        raise ValueError(
            "weighted_score_fusion: rankings is empty — at least one "
            "(id, score) shortlist is required"
        )
    if len(rankings) != len(weights):
        raise ValueError(
            f"weighted_score_fusion: {len(rankings)} rankings but "
            f"{len(weights)} weights"
        )
    normed = []
    for i, r in enumerate(rankings):
        stats = r.agg(
            F.min(score_col).alias("__mn"), F.max(score_col).alias("__mx")
        )
        normed.append(
            r.crossJoin(F.broadcast(stats)).select(
                F.col(id_col),
                F.when(F.col("__mx") == F.col("__mn"), F.lit(1.0))
                .otherwise(
                    (F.col(score_col) - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                )
                .alias(f"__n{i}"),
            )
        )
    fused = normed[0]
    for n in normed[1:]:
        fused = fused.join(n, id_col, "full_outer")
    combined = None
    present = None
    for i, w in enumerate(weights):
        term = F.lit(float(w)) * F.coalesce(F.col(f"__n{i}"), F.lit(0.0))
        combined = term if combined is None else combined + term
        flag = F.when(F.col(f"__n{i}").isNotNull(), 1).otherwise(0)
        present = flag if present is None else present + flag
    return fused.select(
        F.col(id_col),
        F.round(combined, 6).alias("fused_score"),
        present.cast("long").alias("n_rankers"),
    )


def bm25_sparse_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_buckets: int = 4096,
    k1: float = 1.2,
    b: float = 0.75,
    pattern: str = WORD_RE,
    scale: int = 6,
    out_col: str = "sparse",
) -> DataFrame:
    """Every document as a BM25-weighted SPARSE VECTOR in the engine's
    ``struct<indices, values>`` convention — the learned-sparse /
    keyword side of a hybrid index, ready for the Pinecone
    ``sparseValues`` / Qdrant sparse-vector sinks (terms hash into
    ``vocab_buckets`` dimensions; colliding terms merge their counts
    BEFORE weighting — the standard hashing-trick trade).

    Same corpus-stat pass as :func:`bm25_scores` but over ALL terms;
    weights quantize to 10^-scale units for engine-exact values, emitted
    micro-units / 10^scale as float32. Indices ascend (groupBy + sort at
    assembly). One explode + two aggregations; documents shuffle as
    (id, bucket, weight) triples only.
    """
    per_doc = df.select(
        F.col(id_col), tokens(text_col, pattern).alias("__t")
    ).select(
        id_col,
        F.size("__t").cast("long").alias("__dl"),
        F.col("__t"),
    )
    per_doc = per_doc.persist()
    per_doc.count()  # eager fill: consts + tf consumers
    consts = per_doc.agg(
        F.count("*").alias("__n_docs"), F.sum("__dl").alias("__sum_dl")
    )
    tf = (
        per_doc.select(id_col, "__dl", F.explode("__t").alias("__term"))
        .withColumn(
            # md5-derived bucket (not xxhash64): engine-portable so the
            # DuckDB oracle reproduces the hashed dimensions exactly
            "__bucket",
            (
                F.conv(F.substring(F.md5("__term"), 1, 8), 16, 10).cast("long")
                % vocab_buckets
            ).cast("int"),
        )
        .groupBy(id_col, "__dl", "__bucket")
        .agg(F.count("*").cast("long").alias("__tf"))
    )
    dfreq = tf.groupBy("__bucket").agg(
        F.countDistinct(id_col).cast("long").alias("__df")
    )
    avgdl = F.col("__sum_dl").cast("double") / F.col("__n_docs")
    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    unit = float(10 ** scale)
    w_micro = F.round(
        idf
        * (F.col("__tf") * (k1 + 1.0))
        / (
            F.col("__tf")
            + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl)
        )
        * unit
    ).cast("long")
    entries = (
        tf.join(dfreq, "__bucket")
        .crossJoin(F.broadcast(consts))
        .select(id_col, "__bucket", w_micro.alias("__w"))
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__bucket", "__w"))
            ).alias("__e")
        )
        .select(
            id_col,
            F.struct(
                F.transform("__e", lambda e: e["__bucket"]).alias("indices"),
                F.transform(
                    "__e", lambda e: (e["__w"] / unit).cast("float")
                ).alias("values"),
            ).alias(out_col),
        )
    )
    out = entries.localCheckpoint(eager=True)
    per_doc.unpersist()
    return out


def ranking_metrics(
    pred: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    k: int = 10,
    scale: int = 9,
) -> DataFrame:
    """Offline retrieval evaluation: per-query recall@k and MRR of a
    predicted ranking against a ground-truth ranking (both as
    (query, id, rank) rows — the shape every topk operator here emits).

    recall@k = |pred_k ∩ truth_k| / k;
    MRR      = 1 / (rank in pred of the best-ranked truth item), 0 if
    none retrieved. Pure joins + grouped aggregates over shortlist-sized
    frames (k rows per query per side) — evaluation cost is independent
    of corpus size. Ratios quantize to 10^-scale units so any later
    macro-average is exact.
    """
    p = pred.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        F.col(rank_col).alias("__pr"),
    )
    t = truth.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__id")
    )
    hits = p.join(t, ["__q", "__id"])
    agg = hits.groupBy("__q").agg(
        F.count("*").alias("__n_hit"),
        F.min("__pr").alias("__best"),
    )
    all_q = truth.select(F.col(query_col).alias("__q")).distinct()
    unit = float(10 ** scale)
    return (
        all_q.join(agg, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.round(
                F.coalesce(F.col("__n_hit"), F.lit(0)) / float(k), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(
                    F.round(1.0 / F.col("__best") * unit) / unit, F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
        )
    )


def ndcg_at_k(
    pred: DataFrame,
    truth: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
    k: int = 10,
    scale: int = 9,
) -> DataFrame:
    """Per-query nDCG@k of a predicted ranking against a ground-truth
    ranking, with graded relevance rel = k+1 - truth_rank (the truth
    top-1 is worth k, the truth top-k is worth 1, everything else 0).

    DCG terms quantize to 10^-scale units BEFORE summation (the only
    floats involved are log2 of the small integers 2..k+1, identical
    across engines), so the per-query DCG is an exact integer sum; IDCG
    is the same quantized sum over the perfect ranking — a compile-time
    constant. Same shortlist-sized join shape as
    :func:`ranking_metrics`: evaluation cost independent of corpus size.
    """
    import math

    unit = float(10 ** scale)
    # HALF_UP (away from zero for these positive terms), matching Spark's
    # F.round and DuckDB's round — Python round() is banker's rounding and
    # would silently diverge on exact .5 terms at some (k, scale) choices.
    idcg_units = sum(
        int((k + 1 - i) / math.log2(i + 1) * unit + 0.5) for i in range(1, k + 1)
    )
    p = pred.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        F.col(rank_col).alias("__pr"),
    )
    t = truth.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        (F.lit(k + 1) - F.col(rank_col)).alias("__rel"),
    )
    dcg = (
        p.join(t, ["__q", "__id"])
        .groupBy("__q")
        .agg(
            F.sum(
                F.round(
                    F.col("__rel") / F.log2(F.col("__pr") + 1) * unit, 0
                ).cast("long")
            )
            .cast("long")
            .alias("__dcg_units")
        )
    )
    all_q = truth.select(F.col(query_col).alias("__q")).distinct()
    return all_q.join(dcg, "__q", "left").select(
        F.col("__q").alias(query_col),
        F.round(
            F.coalesce(F.col("__dcg_units"), F.lit(0)) / float(idcg_units), 6
        ).alias("ndcg"),
    )
