"""Distributed BPE tokenizer training (vocabulary induction).

A training-data pipeline that counts tokens needs a tokenizer; this
module TRAINS one — byte-pair-encoding merges learned from the corpus
itself, fully distributed and engine-exact:

- The corpus collapses to a (word, count) table once (one shuffle);
  every later stage works on the VOCABULARY, which is sublinear in
  corpus size (Heaps' law) — the classic BPE-training shape.
- Each merge step counts adjacent symbol pairs weighted by word count
  (map-side combined), takes the global argmax (ORDER BY count DESC
  with lexicographic tie-break → TakeOrdered, distributed), and applies
  the merge with two sequential ``replace`` passes over the
  space-delimited symbol string.
- Only the single argmax row per step reaches the driver — O(num_merges)
  driver state.

Merge-application semantics: ``replace`` scans left-to-right and
resumes AFTER each replacement (identical in Spark and DuckDB), so a
run of the same pair longer than 2 merges at positions 1, 3, ... within
each pass; the second pass catches pairs re-exposed by the first. For
runs longer than ~4 repeated symbols this deviates from textbook
greedy-leftmost BPE (which would need O(run) passes), but it is
deterministic, identical across engines, and immaterial for natural-
language vocabularies — documented rather than hidden. Ties in pair
frequency break lexicographically, so the learned merge table is unique.

The DuckDB oracle (:func:`bpe_sql`) retrains from scratch with unrolled
CTE layers (pair-count → argmax scalar subquery → double replace) and
must land on the identical merge table and vocabulary.

Reference context: vector-io has no tokenizer at all; this extends the
token-counting surface (SURVEY §2 north-star text analysis) to actual
vocabulary induction, following the published BPE algorithm (Sennrich et
al. 2016).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"
MARKER = "</w>"
ENCODE_ID = "doc_id"  # id column spliced into the 'encode' oracle SQL


def word_counts(
    df: DataFrame, text_col: str, pattern: str = WORD_RE
) -> DataFrame:
    """(word, n) over the corpus — the single corpus-proportional pass."""
    return (
        df.select(F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _symbolize(wc: DataFrame) -> DataFrame:
    """word -> space-delimited character symbols + end-of-word marker:
    'the' -> 't h e </w>'."""
    return wc.select(
        "word",
        F.concat(
            F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")),
            F.lit(" " + MARKER),
        ).alias("ws"),
        "n",
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word count; map-side
    combined before the one shuffle per step.

    Fully-merged words (ONE symbol left — happens once enough merges
    apply) are filtered first: they contribute no pairs, and without the
    guard ``sequence(1, size-1)`` runs DESCENDING to [1, 0] and
    element_at(syms, 2) throws under ANSI (hit at the sf1 bench, never
    at sf0.01 — the oracle's ``range(1, len)`` is naturally empty)."""
    syms = F.split(F.col("ws"), " ")
    multi = words.where(F.size(syms) >= 2)
    pair_arr = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"), F.element_at(syms, i + 1).alias("b")
        ),
    )
    return (
        multi.select(F.explode(pair_arr).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(words: DataFrame, a: str, b: str) -> DataFrame:
    """Merge symbol pair (a, b) -> a||b via the double-replace pass (see
    module docstring for the exact semantics)."""
    pat = F.lit(f" {a} {b} ")
    rep = F.lit(f" {a}{b} ")
    padded = F.concat(F.lit(" "), F.col("ws"), F.lit(" "))
    merged = F.replace(F.replace(padded, pat, rep), pat, rep)
    return words.withColumn("ws", F.trim(merged))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    pattern: str = WORD_RE,
) -> tuple[list[tuple[int, str, str, int]], DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns (merges, vocab, words): merges = [(step, left, right,
    pair_count)] (the tokenizer artifact — O(num_merges) driver state);
    vocab = the symbol vocabulary (token, n_occurrences) AFTER applying
    all merges; words = the per-word segmentation (word, ws, n) — the
    encode map a tokenizer applies to new text. Deterministic:
    tie-broken argmax per step.
    """
    words = _symbolize(word_counts(df, text_col, pattern)).persist()
    words.count()  # eager fill: every merge step re-reads the vocab table
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, num_merges + 1):
            top = (
                _pair_counts(words)
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((step, a, b, cnt))
            nxt = _apply_merge(words, a, b).persist()
            nxt.count()
            words.unpersist()
            words = nxt
        vocab = (
            words.select(F.explode(F.split(F.col("ws"), " ")).alias("token"), "n")
            .groupBy("token")
            .agg(F.sum("n").alias("n_occurrences"))
        )
        vocab = vocab.localCheckpoint(eager=True)
        word_map = words.localCheckpoint(eager=True)
    finally:
        words.unpersist()
    return merges, vocab, word_map


def bpe_merges_df(
    df: DataFrame, text_col: str = "text", num_merges: int = 8,
    pattern: str = WORD_RE,
) -> DataFrame:
    """The learned merge table as a DataFrame (step, left, right,
    pair_count) — the oracle-checkable tokenizer artifact."""
    merges, _, _ = bpe_train(df, text_col, num_merges, pattern)
    # left/right are SQL keywords — left_sym/right_sym keeps the oracle
    # column names splice-safe
    return df.sparkSession.createDataFrame(
        merges, "step long, left_sym string, right_sym string, pair_count long"
    )


def bpe_vocab_df(
    df: DataFrame, text_col: str = "text", num_merges: int = 8,
    pattern: str = WORD_RE,
) -> DataFrame:
    """Post-merge symbol vocabulary (token, n_occurrences)."""
    _, vocab, _ = bpe_train(df, text_col, num_merges, pattern)
    return vocab


def bpe_encode_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 8,
    pattern: str = WORD_RE,
) -> DataFrame:
    """ENCODE side of the tokenizer: per-document token statistics under
    the trained merges — (id, n_words, n_tokens). The per-word
    segmentation table is |vocab|-sized, so it broadcasts and the encode
    pass is one corpus explode + broadcast join + per-doc aggregate (no
    vocabulary shuffle). n_tokens is what a context-length planner /
    token-budget accountant actually needs."""
    _, _, word_map = bpe_train(df, text_col, num_merges, pattern)
    tok_per_word = word_map.select(
        "word", F.size(F.split(F.col("ws"), " ")).cast("long").alias("__wt")
    )
    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), 0)
        ).alias("word"),
    )
    return (
        doc_words.join(F.broadcast(tok_per_word), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("__wt").alias("n_tokens"),
        )
    )


def bpe_sql(
    table: str = "documents",
    text_col: str = "text",
    num_merges: int = 8,
    pattern: str = WORD_RE,
    output: str = "merges",
) -> str:
    """DuckDB replay of :func:`bpe_train` — each merge step unrolled into
    pair-count / argmax / double-replace CTE layers. ``output``:
    ``merges`` (step, left, right, pair_count) or ``vocab``
    (token, n_occurrences)."""
    parts = [
        f"""
    wc AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
            SELECT unnest(regexp_extract_all(lower({text_col}), '{pattern}'))
                AS word
            FROM {table}
        ) GROUP BY word
    ),
    w0 AS MATERIALIZED (
        SELECT word,
               trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' {MARKER}'
                   AS ws, n
        FROM wc
    )"""
    ]
    for t in range(1, num_merges + 1):
        prev = f"w{t - 1}"
        parts.append(f"""
    p{t} AS MATERIALIZED (
        SELECT s[t.i] AS a, s[t.i + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
        FROM (SELECT string_split(ws, ' ') AS s, n FROM {prev}),
             LATERAL (SELECT unnest(range(1, len(s))) AS i) t
        GROUP BY s[t.i], s[t.i + 1]
    ),
    b{t} AS MATERIALIZED (
        SELECT a, b, cnt FROM p{t}
        ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    ),
    w{t} AS MATERIALIZED (
        -- coalesce: when the corpus exhausts its pairs before
        -- num_merges steps, b{t} is empty, the scalar subqueries are
        -- NULL and the replace chain NULLs out — fall back to the
        -- previous segmentation, matching the Spark side's early break
        SELECT word, coalesce(trim(replace(replace(
                   ' ' || ws || ' ',
                   ' ' || (SELECT a FROM b{t}) || ' ' || (SELECT b FROM b{t})
                       || ' ',
                   ' ' || (SELECT a FROM b{t}) || (SELECT b FROM b{t}) || ' '),
                   ' ' || (SELECT a FROM b{t}) || ' ' || (SELECT b FROM b{t})
                       || ' ',
                   ' ' || (SELECT a FROM b{t}) || (SELECT b FROM b{t}) || ' ')),
                   ws)
            AS ws, n
        FROM {prev}
    )""")
    if output == "merges":
        rows = " UNION ALL ".join(
            f"SELECT CAST({t} AS BIGINT) AS step, a AS left_sym, "
            f"b AS right_sym, cnt AS pair_count FROM b{t}"
            for t in range(1, num_merges + 1)
        )
        select = f"SELECT * FROM ({rows}) ORDER BY step"
    elif output == "vocab":
        select = f"""
    SELECT token, CAST(sum(n) AS BIGINT) AS n_occurrences FROM (
        SELECT unnest(string_split(ws, ' ')) AS token, n FROM w{num_merges}
    ) GROUP BY token"""
    elif output == "encode":
        select = f"""
    SELECT d.{ENCODE_ID} AS {ENCODE_ID},
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(m.ws, ' '))) AS BIGINT) AS n_tokens
    FROM (
        SELECT {ENCODE_ID},
               unnest(regexp_extract_all(lower({text_col}), '{pattern}'))
                   AS word
        FROM {table}
    ) d JOIN w{num_merges} m USING (word)
    GROUP BY d.{ENCODE_ID}"""
    else:
        raise ValueError(f"unknown output {output!r}")
    return "WITH " + ",".join(parts) + "\n    " + select
