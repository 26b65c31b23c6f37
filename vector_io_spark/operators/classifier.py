"""Distributed trained quality classifier — engine-exact gradient descent.

Curation pipelines train lightweight classifiers (language ID, quality
scoring) over cheap features; this module trains one IN the engine with
batch gradient descent that is bit-reproducible across engines:

- features and weights live in integer MICRO units (1e6 scale);
- the activation is the HARD sigmoid ``clamp(z/4 + 1/2, 0, 1)`` —
  integer floor-division and clamps only, no ``exp`` (libm's exp
  differs by ulps across engines, which a hash-exact oracle cannot
  tolerate; hard-sigmoid logistic regression is a standard cheap
  approximation and an entirely respectable linear classifier);
- each iteration: one pass computing per-row scores (zero shuffle) and
  one map-combined aggregate for the d-dimensional gradient — the
  gradient (d values) is the ONLY thing that reaches the driver.

The DuckDB replay (:func:`logreg_sql`) unrolls the same iterations into
MATERIALIZED CTE rounds and must reproduce weights, scores, and
accuracy bit-for-bit.

Scale shape: per iteration one full pass + a d-value aggregate —
textbook distributed batch GD; driver state is O(d · iters).

Reference context: vector-io has no model training; this extends the
text-quality surface (SURVEY north-star) with the classifier those
pipelines actually fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q = 1_000_000  # micro-unit fixed-point scale

# English function words (mirrors functions/text.py::_LANG_MARKERS['en'])
_EN_MARKERS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def doc_features(text_col: str = "text", n_chars_col: str = "n_chars"):
    """Quantized (bigint micro-unit) feature expressions over the
    documents table — engine-portable integer arithmetic from string
    lengths only. Returns an ordered dict name -> Column."""
    text = F.col(text_col)
    n = F.greatest(F.lit(1), F.col(n_chars_col))
    # length()/size()/int-seed aggregate are INT expressions: widen to
    # long BEFORE the ×Q, or any document with > ~2147 matching chars
    # overflows 32 bits (ANSI crash; the DuckDB twin is BIGINT-native)
    lower_letters = F.length(
        F.regexp_replace(text, "[^a-z ]", "")
    ).cast("long")
    words = F.regexp_extract_all(F.lower(text), F.lit("[a-z]+"), 0)
    n_words = F.greatest(F.lit(1), F.size(words))
    word_chars = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    en_markers = F.array(*[F.lit(m) for m in _EN_MARKERS])
    en_hits = F.size(
        F.filter(words, lambda w: F.array_contains(en_markers, w))
    ).cast("long")
    return {
        "bias": F.lit(Q).cast("long"),
        # document length, saturating at 2000 chars
        "len_frac": F.least(
            F.lit(Q).cast("long"),
            (F.col(n_chars_col).cast("long") * Q / 2000).cast("long"),
        ),
        # fraction of [a-z ] characters (prose-likeness)
        "alpha_frac": (lower_letters * Q / n).cast("long"),
        # mean word length in tenths (cap 20 chars)
        "avg_word_len": F.least(
            F.lit(2 * Q).cast("long"), (word_chars * Q / n_words).cast("long")
        ),
        # English function-word hit rate — the separating signal
        "en_marker_frac": (en_hits * Q / n_words).cast("long"),
    }


def _doc_features_sql(text_col: str = "text", n_chars_col: str = "n_chars"):
    """DuckDB twins of :func:`doc_features` (same integer arithmetic)."""
    n = f"greatest(1, {n_chars_col})"
    lower_letters = f"length(regexp_replace({text_col}, '[^a-z ]', '', 'g'))"
    words = f"regexp_extract_all(lower({text_col}), '[a-z]+')"
    n_words = f"greatest(1, len({words}))"
    word_chars = f"list_sum(list_transform({words}, w -> length(w)))"
    markers = ", ".join(f"'{m}'" for m in _EN_MARKERS)
    en_hits = f"len(list_filter({words}, w -> w IN ({markers})))"
    return {
        "bias": f"CAST({Q} AS BIGINT)",
        "len_frac": f"CAST(least({Q}, {n_chars_col} * {Q} // 2000) AS BIGINT)",
        "alpha_frac": f"CAST({lower_letters} * {Q} // {n} AS BIGINT)",
        "avg_word_len": (
            f"CAST(least({2 * Q}, coalesce({word_chars}, 0) * {Q} // {n_words})"
            " AS BIGINT)"
        ),
        "en_marker_frac": f"CAST({en_hits} * {Q} // {n_words} AS BIGINT)",
    }


def logreg_train(
    df: DataFrame,
    features: dict[str, Column],
    label: Column,
    iters: int = 5,
    lr: float = 0.5,
) -> tuple[list[int], DataFrame]:
    """Train hard-sigmoid logistic regression; ``label`` must be 0/1.

    Returns (weights_q, scored): weights in micro units ordered like
    ``features``; ``scored`` adds ``score_q`` (micro-probability) and
    ``pred`` under the final weights.
    """
    import math

    names = list(features)
    base = df.select(
        *[features[k].alias(f"__x_{k}") for k in names],
        (label.cast("long") * Q).alias("__y"),
    ).persist()
    n_rows = base.count()
    if n_rows == 0:
        base.unpersist()
        raise ValueError("logreg_train: empty training set")
    w = [0] * len(names)

    def score_q_expr(weights: list[int]) -> Column:
        z = None
        for k, wq in zip(names, weights):
            term = F.col(f"__x_{k}") * F.lit(wq)
            z = term if z is None else z + term
        zq = F.floor(z / Q).cast("long")  # micro-unit margin
        return F.least(
            F.lit(Q), F.greatest(F.lit(0), F.floor(zq / 4).cast("long") + Q // 2)
        ).cast("long")

    for _ in range(iters):
        resid = (score_q_expr(w) - F.col("__y")).alias("__r")
        # per-row products are <= 2Q^2 ~ 2e12 (long-safe) but the SUM
        # overflows int64 at a few million rows — accumulate in
        # decimal(38,0) (exact), matching DuckDB's BIGINT->HUGEINT sum
        grads = base.select(
            *[
                F.sum(
                    (resid * F.col(f"__x_{k}")).cast("decimal(38,0)")
                ).alias(k)
                for k in names
            ]
        ).first()
        # grad in (micro)^2-scale summed over rows; normalize by n and
        # one Q, floor — identical ops in the SQL replay. float() FIRST:
        # DuckDB's g/(n*1.0) converts the exact BIGINT to DOUBLE before
        # dividing; Python's int/int true division rounds the exact
        # rational instead, which diverges by one floor step once
        # |grad| > 2^53 (reachable at a few thousand rows of Q-scale
        # features) — convert the same way DuckDB does
        w = [
            wq - int(math.floor(lr * math.floor(float(grads[k]) / n_rows) / Q))
            for wq, k in zip(w, names)
        ]
    base.unpersist()
    sq = score_q_expr(w)
    scored = df.select(
        "*",
        *[features[k].alias(f"__x_{k}") for k in names],
    ).select(
        "*",
        sq.alias("score_q"),
    ).withColumn(
        "pred", (F.col("score_q") >= Q // 2).cast("long")
    ).drop(*[f"__x_{k}" for k in names])
    return w, scored


def embedding_features(vec_col: str = "embedding", dims: int = 16):
    """Quantized features from the first ``dims`` embedding coordinates
    + bias — the linear-probe setup over a representation column."""
    out = {"bias": F.lit(Q).cast("long")}
    for j in range(dims):
        out[f"d{j:02d}"] = (
            F.round(F.element_at(F.col(vec_col), j + 1).cast("double") * Q)
            .cast("long")
        )
    return out


def _embedding_features_sql(vec_col: str = "embedding", dims: int = 16):
    out = {"bias": f"CAST({Q} AS BIGINT)"}
    for j in range(dims):
        out[f"d{j:02d}"] = (
            f"CAST(round(CAST({vec_col}[{j + 1}] AS DOUBLE) * {Q}) AS BIGINT)"
        )
    return out


def logreg_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    label_sql: str = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
    iters: int = 5,
    lr: float = 0.5,
    output: str = "weights",
    features_sql: dict | None = None,
) -> str:
    """DuckDB replay of :func:`logreg_train` — over :func:`doc_features`
    by default, or any features_sql dict (e.g.
    :func:`_embedding_features_sql` for the linear-probe setup).
    ``output``: ``weights`` (feature, w_q) or ``scores``
    (id, score_q, pred)."""
    feats = features_sql if features_sql is not None else _doc_features_sql()
    names = list(feats)
    cols = ",\n               ".join(
        f"{sql} AS x_{k}" for k, sql in feats.items()
    )
    parts = [
        f"""
    base AS MATERIALIZED (
        SELECT {id_col},
               {cols},
               CAST(({label_sql}) * {Q} AS BIGINT) AS y
        FROM {table}
    ),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
    w0 AS MATERIALIZED (
        SELECT {", ".join(f"CAST(0 AS BIGINT) AS w_{k}" for k in names)}
    )"""
    ]

    def z_expr(wt: str) -> str:
        return " + ".join(
            f"x_{k} * (SELECT w_{k} FROM {wt})" for k in names
        )

    def score_expr(wt: str) -> str:
        zq = f"CAST(floor(({z_expr(wt)}) / {Q}.0) AS BIGINT)"
        return (
            f"least({Q}, greatest(0, "
            f"CAST(floor({zq} / 4.0) AS BIGINT) + {Q // 2}))"
        )

    for t in range(1, iters + 1):
        prev = f"w{t - 1}"
        g_cols = ",\n               ".join(
            f"CAST(sum(({score_expr(prev)} - y) * x_{k}) AS BIGINT) AS g_{k}"
            for k in names
        )
        w_cols = ",\n               ".join(
            f"(SELECT w_{k} FROM {prev}) - CAST(floor({lr} * "
            f"CAST(floor(g_{k} / ((SELECT n FROM nn) * 1.0)) AS BIGINT)"
            f" / {Q}.0) AS BIGINT) AS w_{k}"
            for k in names
        )
        parts.append(f"""
    g{t} AS MATERIALIZED (
        SELECT {g_cols}
        FROM base
    ),
    w{t} AS MATERIALIZED (
        SELECT {w_cols}
        FROM g{t}
    )""")
    if output == "weights":
        rows = " UNION ALL ".join(
            f"SELECT '{k}' AS feature, (SELECT w_{k} FROM w{iters}) AS w_q"
            for k in names
        )
        select = f"SELECT * FROM ({rows}) ORDER BY feature"
    elif output == "scores":
        select = f"""
    SELECT {id_col},
           CAST({score_expr(f"w{iters}")} AS BIGINT) AS score_q,
           CAST(CASE WHEN {score_expr(f"w{iters}")} >= {Q // 2}
                THEN 1 ELSE 0 END AS BIGINT) AS pred
    FROM base"""
    else:
        raise ValueError(f"unknown output {output!r}")
    return "WITH " + ",".join(parts) + "\n    " + select
