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
from vector_io_spark.session import local_rows_df
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
    return _apply_merges(words, [(a, b)])


def _apply_merges(words: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Apply a batch of symbol-DISJOINT merges in ONE projection pass:
    each pair gets its own double-replace over the padded symbol string
    (chained — later pairs' patterns contain none of the earlier pairs'
    symbols, and every replacement re-emits its surrounding spaces, so
    chaining is exactly sequential application)."""
    expr = F.concat(F.lit(" "), F.col("ws"), F.lit(" "))
    for a, b in pairs:
        pat = F.lit(f" {a} {b} ")
        rep = F.lit(f" {a}{b} ")
        expr = F.replace(F.replace(expr, pat, rep), pat, rep)
    return words.withColumn("ws", F.trim(expr))


def _select_merge_batch(
    top: list, m: int, complete: bool
) -> list[tuple[str, str, int]]:
    """Driver-side batch selection over the sorted top pair list —
    returns a batch whose one-pass application is PROVABLY identical to
    applying the merges one argmax at a time:

    1. Take the maximal PREFIX of the sorted (cnt desc, a, b) list that
       is pairwise symbol-disjoint — stop at the FIRST conflicting pair
       (skipping would break the boundary argument below).
    2. Boundary bound: every pair that a batched merge can create or
       change shares a symbol with the batch, so it sorts at/after the
       first excluded pair; trim the batch to entries with cnt STRICTLY
       above that boundary count (ties could lose the lexicographic
       tie-break to a created pair). When the collected list was
       truncated (``complete=False``) the boundary is the last seen
       count — pairs beyond the horizon can't exceed it.
    3. String-aliasing guard: a merged token's STRING (a||b) must not
       equal any batch symbol or another batch concat — token identity
       is string identity, so an alias would let one merge change
       another's counts despite symbol-level disjointness. (The caller
       additionally probes the live symbol table for concat collisions
       with EXISTING symbols.)

    The first pair is always safe (it IS the argmax), so the batch is
    never empty while pairs remain.

    On natural-language character vocabularies this rule is
    conservative (the head pairs share letters and tie on counts, so
    batches stay small — measured ~1.1 merges/pass at 256 merges);
    :func:`_select_merge_batch_greedy` is the aggressive variant for
    when strict argmax-order equivalence is not required.
    """
    symbols: set[str] = set()
    concats: set[str] = set()
    prefix: list[tuple[str, str, int]] = []
    boundary: int | None = None
    for i, r in enumerate(top):
        a, b, cnt = r["a"], r["b"], int(r["cnt"])
        if len(prefix) >= m:
            boundary = cnt
            break
        cat = a + b
        if (
            a in symbols
            or b in symbols
            or a in concats
            or b in concats
            or cat in symbols
            or cat in concats
        ):
            boundary = cnt
            break
        prefix.append((a, b, cnt))
        symbols.update((a, b))
        concats.add(cat)
    if boundary is None:
        # ran off the end of the collected list
        boundary = None if complete else int(top[-1]["cnt"])
    if boundary is not None:
        trimmed = [p for p in prefix if p[2] > boundary]
    else:
        trimmed = prefix
    return trimmed or prefix[:1]


def _select_merge_batch_greedy(top: list, m: int) -> list[tuple[str, str, int]]:
    """Aggressive batch selection — the standard parallel-BPE trick:
    walk the sorted pair list and take up to ``m`` pairs that share no
    symbol (SKIPPING conflicting pairs instead of stopping at the first
    one), with the same string-alias guards. Applying the batch in one
    pass is deterministic and well-defined, but the learned merge table
    may deviate from strict one-argmax-at-a-time BPE: a skipped
    conflicting pair would sometimes have been the true next argmax
    after the earlier merges recounted. That trade (documented, like
    the module's double-replace run semantics) is what buys
    O(vocab/m) corpus passes — the difference between a trainable and
    an untrainable 30k vocabulary at 100 TB."""
    symbols: set[str] = set()
    concats: set[str] = set()
    batch: list[tuple[str, str, int]] = []
    for r in top:
        if len(batch) >= m:
            break
        a, b, cnt = r["a"], r["b"], int(r["cnt"])
        cat = a + b
        if (
            a in symbols
            or b in symbols
            or a in concats
            or b in concats
            or cat in symbols
            or cat in concats
        ):
            continue
        batch.append((a, b, cnt))
        symbols.update((a, b))
        concats.add(cat)
    return batch


LAST_TRAIN_PASSES = 0  # diagnostic: corpus passes used by the last bpe_train


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    pattern: str = WORD_RE,
    merge_batch: int = 1,
    exact: bool = True,
) -> tuple[list[tuple[int, str, str, int]], DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns (merges, vocab, words): merges = [(step, left, right,
    pair_count)] (the tokenizer artifact — O(num_merges) driver state);
    vocab = the symbol vocabulary (token, n_occurrences) AFTER applying
    all merges; words = the per-word segmentation (word, ws, n) — the
    encode map a tokenizer applies to new text. Deterministic:
    tie-broken argmax per step.

    ``merge_batch`` > 1 is the SCALE path for real vocab sizes: per
    corpus pass it collects the top ~3·batch pairs (bounded driver
    state), selects a provably-safe batch (:func:`_select_merge_batch`:
    symbol-disjoint prefix, trimmed strictly above the first excluded
    pair's count, string-alias guarded — including one cheap probe of
    the live symbol table for concat collisions) and applies the whole
    batch in ONE projection. The learned merge table is IDENTICAL to
    merge_batch=1 (pytest-pinned), but a 30k-merge vocabulary costs
    O(vocab/batch) Spark job rounds instead of 2 jobs per merge — the
    round-3 bound that capped practical training at tens of merges.
    Batch size adapts to the count distribution (ties shrink it; the
    argmax pair alone is always safe), so progress is guaranteed.
    ``LAST_TRAIN_PASSES`` records the pass count for diagnostics.

    On character-level natural-language heads the exact rule batches
    conservatively (shared letters + count ties); ``exact=False``
    switches to the standard greedy top-m-disjoint selection
    (:func:`_select_merge_batch_greedy`) — O(num_merges/merge_batch)
    passes guaranteed, at the documented cost that the merge table may
    deviate from strict argmax order. Oracle-paired queries use the
    default (exact sequential); ``exact=False`` is the 30k-vocab
    production path.
    """
    global LAST_TRAIN_PASSES
    # persist is LAZY-filled: the first pass's top-pair collect runs the
    # whole (word, count) pipeline and populates the cache for the
    # apply/checkpoint job that follows it — consumers are strictly
    # sequential here, so the old eager count() was a pure extra job
    # per train (r13, guide §1/§2: fewer job boundaries)
    words = _symbolize(word_counts(df, text_col, pattern)).persist()
    merges: list[tuple[int, str, str, int]] = []
    passes = 0
    # Driver-side SUPERSET of symbols a merge concat could alias
    # (r13 — replaces the per-pass live-vocab probe JOB): initial
    # symbols are single characters plus the MARKER (see _symbolize:
    # '(.)' splits every char), so a concat (length >= 2) can only
    # equal (a) the MARKER or (b) a concat applied by an earlier
    # batch. Symbols never appear from anywhere else; dead symbols
    # left in the set only make the check conservative — it may trim
    # a batch that the live probe would have kept, and any prefix of
    # a safe batch is itself safe (later merges re-enter via the next
    # pass's exact recount), so the learned merge table is UNCHANGED
    # (pytest-pinned batch == sequential equality still holds).
    alias_symbols: set[str] = {MARKER}
    try:
        while len(merges) < num_merges:
            passes += 1
            want = min(merge_batch, num_merges - len(merges))
            k = 1 if want <= 1 else max(3 * want + 1, 8)
            top = (
                _pair_counts(words)
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(k)
                .collect()
            )
            if not top:
                break
            if want <= 1:
                batch = [(top[0]["a"], top[0]["b"], int(top[0]["cnt"]))]
            elif not exact:
                batch = _select_merge_batch_greedy(top, want)
            else:
                batch = _select_merge_batch(top, want, complete=len(top) < k)
            if want > 1 and len(batch) > 1:
                # alias guard: a merged token whose string already
                # EXISTS as a symbol lets that merge change counts of
                # pairs OUTSIDE the batch's symbol set, voiding the
                # boundary bound for every LATER batch member — keep
                # the batch only up to and including the first
                # colliding pair (that pair's own count is still
                # exact; the argmax alone is always safe). Checked
                # against the driver-side superset above: no Spark job.
                for i in range(len(batch) - 1):
                    a, b, _ = batch[i]
                    if (a + b) in alias_symbols:
                        batch = batch[: i + 1]
                        break
            for a, b, cnt in batch:
                merges.append((len(merges) + 1, a, b, cnt))
            # localCheckpoint, not persist: it TRUNCATES the lineage, so
            # pass N analyzes an O(1) plan instead of N stacked
            # projections — without it Catalyst analysis goes quadratic
            # and a 48-merge train stalls (measured; the same per-round
            # pattern as operators/graph.py::pagerank). The checkpointed
            # frame is vocabulary-sized (sublinear in corpus, Heaps'
            # law), so block-manager cost is bounded.
            nxt = _apply_merges(
                words, [(a, b) for a, b, _ in batch]
            ).localCheckpoint(eager=True)
            words.unpersist()
            words = nxt
            alias_symbols.update(a + b for a, b, _ in batch)
        vocab = (
            words.select(F.explode(F.split(F.col("ws"), " ")).alias("token"), "n")
            .groupBy("token")
            .agg(F.sum("n").alias("n_occurrences"))
        )
        vocab = vocab.localCheckpoint(eager=True)
        word_map = words.localCheckpoint(eager=True)
    finally:
        words.unpersist()
    LAST_TRAIN_PASSES = passes
    return merges, vocab, word_map


def bpe_merges_df(
    df: DataFrame, text_col: str = "text", num_merges: int = 8,
    pattern: str = WORD_RE, merge_batch: int = 1,
) -> DataFrame:
    """The learned merge table as a DataFrame (step, left, right,
    pair_count) — the oracle-checkable tokenizer artifact.
    ``merge_batch`` uses the EXACT batched train (identical table,
    fewer corpus passes — see :func:`bpe_train`)."""
    merges, _, _ = bpe_train(
        df, text_col, num_merges, pattern, merge_batch=merge_batch
    )
    # left/right are SQL keywords — left_sym/right_sym keeps the oracle
    # column names splice-safe
    return local_rows_df(
        df.sparkSession,
        merges,
        "step long, left_sym string, right_sym string, pair_count long",
    )


def bpe_vocab_df(
    df: DataFrame, text_col: str = "text", num_merges: int = 8,
    pattern: str = WORD_RE, merge_batch: int = 1,
) -> DataFrame:
    """Post-merge symbol vocabulary (token, n_occurrences)."""
    _, vocab, _ = bpe_train(
        df, text_col, num_merges, pattern, merge_batch=merge_batch
    )
    return vocab


def bpe_encode_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_merges: int = 8,
    pattern: str = WORD_RE,
    merge_batch: int = 1,
) -> DataFrame:
    """ENCODE side of the tokenizer: per-document token statistics under
    the trained merges — (id, n_words, n_tokens). The per-word
    segmentation table is |vocab|-sized, so it broadcasts and the encode
    pass is one corpus explode + broadcast join + per-doc aggregate (no
    vocabulary shuffle). n_tokens is what a context-length planner /
    token-budget accountant actually needs."""
    _, _, word_map = bpe_train(
        df, text_col, num_merges, pattern, merge_batch=merge_batch
    )
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


def synthetic_word_corpus(
    spark, n_docs: int = 100_000, vocab: int = 20_000,
    words_per_doc: int = 40,
):
    """Deterministic rich-vocabulary corpus for VOCABULARY-SCALE
    tokenizer-training runs. The synthetic ``documents`` table carries a
    31-word template vocabulary (a TESTDATA artifact), so BPE exhausts
    all learnable merges at ~113 — useless for demonstrating a >=1k-
    merge train. This generator yields ``vocab`` distinct 8-letter
    pseudo-words (md5-derived, digits translated to letters so the
    ``[a-z]+`` tokenizer keeps them whole; 16-letter alphabet), hashed
    uniformly into ``words_per_doc`` slots per doc — a corpus whose
    distinct-pair space supports tens of thousands of merges.

    Scale shape: one ``spark.range`` projection, pure codegen'd
    expressions, shuffle-free; the (word, count) collapse downstream is
    the only corpus-proportional pass, exactly as with real text.
    """
    def word_at(j):
        wid = F.pmod(
            F.hash(F.col("id") * words_per_doc + j), F.lit(vocab)
        ).cast("string")
        return F.translate(
            F.substring(F.md5(F.concat(F.lit("w:"), wid)), 1, 8),
            "0123456789",
            "ghijklmnop",
        )

    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)), word_at
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )
