"""Corpus-level text statistics (vocabulary, TF-IDF).

Unlike the per-row functions in ``functions/text.py`` (zero-shuffle
column expressions), these are genuine corpus aggregations: they explode
documents into tokens and aggregate across the whole dataset. The plans
are kept to the minimum shuffle count:

- ``vocab_topk``: one shuffle (token count is partial-aggregated map-side
  before the exchange), then a global top-k (TakeOrderedAndProject — only
  k rows per partition reach the driver side of the sort).
- ``tfidf_top_terms``: tf and document-frequency share the same exploded
  child; the df table is |vocab| rows (AQE picks broadcast vs shuffle
  join by its actual size — do NOT hint broadcast, vocabulary can be
  huge at web scale), and the final per-document top-n is one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_io_spark.functions.text import WORD_RE, tokens


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    pattern: str = WORD_RE,
) -> DataFrame:
    """Top-k corpus vocabulary by term frequency.

    Ties broken by token ascending so the result is deterministic (and
    engine-portable). Columns: ``token``, ``freq``.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col), pattern)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
    pattern: str = WORD_RE,
    log_idf: bool = False,
) -> DataFrame:
    """Top-n characteristic terms per document by smoothed TF-IDF.

    ``log_idf=False`` (default) scores ``tf * (N+1)/(df+1)`` — a rational
    idf whose doubles are bit-identical across engines (int-to-double
    division and multiply only, no libm), which is what the DuckDB oracle
    verifies. ``log_idf=True`` uses the textbook
    ``tf * (ln((N+1)/(df+1)) + 1)``. The two genuinely rank differently:
    log compresses the idf range, damping rare-term dominance (a tf=1
    hapax can top the rational score but not the log score) — pick per
    use case; only the rational form is engine-exact for the oracle.

    Columns: ``<id_col>``, ``term``, ``tf``, ``doc_freq``, ``score``.
    """
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col), pattern)).alias("term")
    )
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.count()  # single scalar aggregate — not a data collect

    ratio = F.lit(float(n_docs + 1)) / (F.col("doc_freq") + F.lit(1)).cast(
        "double"
    )
    idf = (F.log(ratio) + F.lit(1.0)) if log_idf else ratio
    scored = tf.join(doc_freq, "term").withColumn(
        "score", F.round(F.col("tf").cast("double") * idf, 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= top_n)
        .drop("__rank")
        .select(id_col, "term", "tf", "doc_freq", "score")
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = WORD_RE,
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-token
    fraction and top-bigram fraction (the two cheapest of the paper's
    repetition filters; high values flag boilerplate/spam for removal).

    Token stats are per-row array expressions (no shuffle); the top-bigram
    count needs one explode + grouped max — the group key is (doc, bigram)
    so partial aggregation collapses repeats map-side before the exchange.

    Columns: ``<id_col>``, ``n_tokens``, ``n_distinct``,
    ``dup_token_frac``, ``top_bigram_frac``.
    """
    toks = tokens(F.col(text_col), pattern)
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        toks.alias("__toks"),
    )
    bigrams = F.zip_with(
        F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
        F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = (
        base.where(F.col("n_tokens") >= 2)
        .select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("max_bg"))
    )
    one = F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
    # token-less documents carry ZERO repetition evidence — without the
    # n_tokens guard they'd read 1 - 0/1 = 1.0 (maximal spam) and get
    # deleted by any boilerplate threshold. Overlapping repeats ("a a
    # a a": max_bg=3, tokens=4) push count*2/n past 1 — cap at 1.0 so
    # the value stays the token-coverage fraction it is documented as.
    return (
        base.drop("__toks")
        .join(bg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.lit(1.0) - F.col("n_distinct").cast("double") / one,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_token_frac"),
            F.round(
                F.least(
                    (
                        F.coalesce(F.col("max_bg"), F.lit(0)).cast("double")
                        * 2.0
                    )
                    / one,
                    F.lit(1.0),
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    keep_every: int = 4,
) -> DataFrame:
    """Benchmark decontamination: find training documents that share any
    winnowed character-n-gram fingerprint with an eval/benchmark set —
    the standard guard against test-set leakage into pre-training data.

    Both sides reuse :func:`functions.text.rolling_fingerprints` (md5
    n-grams downsampled ~1/keep_every), so the join key set stays bounded.
    The eval side is deduplicated to distinct fingerprints before the
    join; eval sets are typically small, and AQE will broadcast the
    distinct-fp table when it is (no hint — "typically" is not a plan
    guarantee). Join output is ~|contaminated n-grams|, never all-pairs.

    Returns ``(<id_col>, n_shared)`` for contaminated training docs only.
    """
    from vector_io_spark.functions.text import rolling_fingerprints

    fps = rolling_fingerprints(F.col(text_col), n=n, keep_every=keep_every)
    train_fps = train_df.select(F.col(id_col), F.explode(fps).alias("fp"))
    eval_fps = eval_df.select(F.explode(fps).alias("fp")).distinct()
    return (
        train_fps.join(eval_fps, "fp")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    metric_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Binned distribution comparison between two corpus slices (e.g.
    yesterday's crawl vs today's, or source A vs source B) — the
    monitoring primitive behind population-stability checks on quality
    scores, document lengths, token counts.

    Fixed-width bins over [lo, hi) (clamped at the edges so nothing
    drops); per bin: counts and Laplace-smoothed proportions from both
    sides, plus the PSI contribution
    ``(p_a - p_b) * ln(p_a / p_b)``. Sum psi_contrib for the scalar PSI
    (rule of thumb: <0.1 stable, >0.25 shifted).

    Each side is one scan + one |bins|-sized aggregate; the bin join is
    |bins| rows. Nothing here is data-proportional after the aggregates,
    so the plan is identical at any scale. The exact-count columns are
    engine-exact; psi_contrib involves ``ln`` whose last ulp is
    libm-dependent — treat it as a monitoring value, not an
    oracle-comparable one.
    """
    def binned(df: DataFrame, name: str) -> DataFrame:
        v = F.col(metric_col).cast("double")
        # clamp the bin INDEX, not the value: a value epsilon (hi-1e-9)
        # vanishes in double precision once |hi| is large (ulp(1e9) >
        # 1e-9), leaking an out-of-range bin n_bins that corrupts the
        # smoothed denominators. NULL metric values are dropped — they
        # would otherwise form their own silent NULL bin.
        b = F.least(
            F.floor(
                (F.greatest(v, F.lit(float(lo))) - lo) / ((hi - lo) / n_bins)
            ).cast("bigint"),
            F.lit(n_bins - 1).cast("bigint"),
        )
        return (
            df.where(v.isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )
    a = binned(df_a, "n_a")
    b = binned(df_b, "n_b")
    # outer join over <= n_bins rows; totals via a window over the tiny
    # bin frame (no second scan of either input)
    j = (
        a.join(b, "bin", "full")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    w = Window.partitionBy()
    tot_a = F.sum("n_a").over(w)
    tot_b = F.sum("n_b").over(w)
    s = float(smoothing)
    p_a = (F.col("n_a") + s) / (tot_a + s * n_bins)
    p_b = (F.col("n_b") + s) / (tot_b + s * n_bins)
    return j.select(
        "bin",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        ((p_a - p_b) * F.log(p_a / p_b)).alias("psi_contrib"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs_per_line: int = 2,
    min_line_chars: int = 1,
) -> DataFrame:
    """CCNet/RefinedWeb-style boilerplate line removal: a (trimmed) line
    that appears in MORE than ``max_docs_per_line`` distinct documents is
    boilerplate (nav bars, cookie banners, license footers) and is dropped
    from every document; the remaining lines are reassembled in order.
    Lines shorter than ``min_line_chars`` after trimming are kept as-is
    (blank separators aren't evidence of duplication).

    Plan: explode lines with position -> per-line distinct-doc count
    (partial-aggregated map-side; the group key is the line text, so the
    exchange carries one row per distinct line, not per occurrence) ->
    join occurrences to counts on the line key -> re-aggregate per doc
    with ``array_sort`` on (pos, line) structs. Two shuffles total (line
    count, doc reassembly), both keyed well; no UDF, no driver state.
    At 100 TB the heavy intermediate is the exploded line table — the
    same frame every corpus-level text op here pays — and the count
    table is |distinct lines|, which partial aggregation keeps compact.

    Returns ``(id, clean_text, n_lines_kept, n_lines_removed)``.
    """
    # NULL text passes through as one empty line (same survival path as
    # an empty-string doc) — split(NULL) explodes to ZERO rows, which
    # would silently DELETE the document from the returned corpus
    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn("__key", F.trim(F.col("line")))

    eligible = F.length("__key") >= min_line_chars
    counts = (
        lines.where(eligible)
        .groupBy("__key")
        .agg(F.countDistinct(id_col).alias("__ndocs"))
        # only boilerplate keys matter downstream; at web scale this
        # shrinks the join side from |distinct lines| to |boilerplate|
        .where(F.col("__ndocs") > max_docs_per_line)
    )
    flagged = lines.join(counts, "__key", "left").select(
        id_col,
        "pos",
        "line",
        (eligible & F.col("__ndocs").isNotNull()).alias("__drop"),
    )
    kept_arr = F.array_sort(
        F.collect_list(
            F.when(~F.col("__drop"), F.struct(F.col("pos"), F.col("line")))
        )
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            kept_arr.alias("__kept"),
            F.sum(F.when(F.col("__drop"), 1).otherwise(0)).alias(
                "n_lines_removed"
            ),
        )
        .select(
            id_col,
            F.concat_ws(
                "\n", F.transform(F.col("__kept"), lambda s: s["line"])
            ).alias("clean_text"),
            F.size("__kept").alias("n_lines_kept"),
            F.col("n_lines_removed").cast("long").alias("n_lines_removed"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = WORD_RE,
    scale: int = 6,
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    KenLM-style perplexity-proxy quality filter: low average bigram
    log-probability flags incoherent / boilerplate / wrong-language text.

    Model: Laplace-smoothed conditional p(w2 | w1) =
    (c(w1 w2) + 1) / (c(w1·) + V), trained on the corpus itself in one
    aggregation over the exploded bigram stream; c(w1·) and V derive
    from the bigram-count table (|vocab|² bounded rows), never a second
    corpus pass. NOTE: V here is the count of DISTINCT FIRST words
    (bigram left-hand contexts), not the continuation vocabulary that
    textbook Laplace smoothing for p(w2|w1) would use — a deliberate,
    deterministic smoothing constant (the oracle SQL matches it
    exactly); scores are comparable across documents either way.

    Engine-exactness: each DISTINCT bigram's log-probability is computed
    once and quantized to ``round(ln(p)·10^scale)`` BIGINT micro-logs, so
    the per-document aggregation sums INTEGERS — order-independent and
    bit-identical across engines; only the final per-doc average divides
    in doubles.

    Scale shape: explode → count (map-side combined, one shuffle) →
    equi-join doc-bigrams with the logprob table (NO broadcast hint —
    bigram vocabulary grows with the corpus; AQE picks the strategy) →
    per-doc aggregate. The documents themselves shuffle as (id, bigram)
    pairs, never full text.

    Returns (id, n_bigrams, avg_neg_logprob) — higher = less fluent.
    """
    toks = tokens(text_col, pattern)
    d = df.select(F.col(id_col), toks.alias("__t")).where(F.size("__t") >= 2)
    bigram = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("__t", i), F.element_at("__t", i + 1)
        ),
    )
    bg = d.select(id_col, F.explode(bigram).alias("bigram"))
    bc = bg.groupBy("bigram").agg(F.count("*").alias("__c12"))
    w1 = F.split_part(F.col("bigram"), F.lit(" "), F.lit(1))
    uc = bc.groupBy(w1.alias("__w1")).agg(F.sum("__c12").alias("__c1"))
    v = bc.select(
        F.countDistinct(w1).alias("__v")
    )
    lp = (
        bc.join(uc, w1 == F.col("__w1"))
        .crossJoin(F.broadcast(v))
        .select(
            "bigram",
            F.round(
                F.log(
                    (F.col("__c12") + 1.0)
                    / (F.col("__c1") + F.col("__v"))
                )
                * (10 ** scale)
            )
            .cast("long")
            .alias("__mlp"),
        )
    )
    return (
        bg.join(lp, "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                -F.sum("__mlp") / F.count("*") / F.lit(float(10 ** scale)), 4
            ).alias("avg_neg_logprob"),
        )
    )


def _cms_bucket(col, j: int, width: int):
    """Deterministic CMS hash row j: md5-derived 32-bit value mod width —
    engine-portable (md5 + hex slice everywhere, no library RNG)."""
    h = F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"|cms{j}"))), 1, 8), 16, 10
    ).cast("long")
    return (h % width).cast("long")


def count_min_sketch(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    pattern: str = WORD_RE,
) -> DataFrame:
    """Count-min sketch of the corpus token stream: ``depth`` hash rows ×
    ``width`` buckets of EXACT counts — the mergeable fixed-size summary
    that answers approximate frequency queries over arbitrarily large
    corpora. The sketch table is depth·width rows (KBs) no matter the
    corpus size; building it is one explode + one map-side-combined
    groupBy per hash row, unioned — the shuffle carries at most
    depth·width·partitions partial counts.

    Returns (h, bucket, n). Estimates (``cms_estimate``) upper-bound true
    counts (classic CMS one-sided error ≤ e·N/width with prob 1-e^-depth).
    """
    toks = df.select(F.explode(tokens(text_col, pattern)).alias("__tok"))
    rows = []
    for j in range(depth):
        rows.append(
            toks.groupBy(
                F.lit(j).cast("long").alias("h"),
                _cms_bucket(F.col("__tok"), j, width).alias("bucket"),
            ).agg(F.count("*").alias("n"))
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the CMS: estimate = min over hash rows of the item's
    bucket count (missing bucket = 0). The sketch side is depth·width
    rows — broadcast; items explode to depth probe rows each."""
    probes = items.select(
        item_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("__h0"),
    ).select(item_col, F.col("__h0").cast("long").alias("h"))
    # per-row bucket must use ITS hash row seed: a CASE over the static
    # depth (tiny, codegen'd)
    bucket = F.lit(None).cast("long")
    for j in range(depth):
        bucket = F.when(
            F.col("h") == j, _cms_bucket(F.col(item_col).cast("string"), j, width)
        ).otherwise(bucket)
    probes = probes.withColumn("bucket", bucket)
    return (
        probes.join(F.broadcast(sketch), ["h", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_n"))
    )


def doc_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = WORD_RE,
) -> DataFrame:
    """Per-document novelty: the fraction of its DISTINCT bigrams that
    occur nowhere else in the corpus (document frequency 1). High
    novelty = fresh content; near-zero = template/boilerplate assembled
    from corpus-common phrases — a dedup-adjacent ranking signal that
    catches recombined text exact dedup misses.

    One explode pass; bigram df is a map-side-combined count keyed by
    (16-byte) hashed bigram; the join back moves (id, hash) pairs. All
    integer counts + one final ratio — engine-exact.
    """
    toks = tokens(text_col, pattern)
    d = df.select(F.col(id_col), toks.alias("__t")).where(F.size("__t") >= 2)
    bigram = F.transform(
        F.sequence(F.lit(1), F.size("__t") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("__t", i), F.element_at("__t", i + 1)
        ),
    )
    bg = d.select(
        id_col, F.explode(F.array_distinct(bigram)).alias("__b")
    ).withColumn("__h", F.xxhash64("__b")).drop("__b")
    dfreq = bg.groupBy("__h").agg(
        F.countDistinct(id_col).alias("__df")
    )
    return (
        bg.join(dfreq, "__h")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0)).alias(
                "n_unique"
            ),
        )
        .select(
            id_col,
            "n_bigrams",
            "n_unique",
            F.round(
                F.col("n_unique").cast("double") / F.col("n_bigrams"), 4
            ).alias("novelty"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    pattern: str = WORD_RE,
    scale: int = 6,
) -> DataFrame:
    """DSIR-style importance weights: score every document by how much
    it resembles a TARGET domain relative to the raw corpus — the
    published data-selection recipe (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): hashed n-gram bag
    features, per-feature log-likelihood ratio between a target model
    and the raw-source model, per-document sum.

    Model: unigrams + bigrams hash (md5, engine-portable) into
    ``buckets`` buckets; each side is a Laplace-smoothed bucket
    multinomial p(g) = (c(g)+1)/(N+B). Each bucket's log ratio
    ln p_target − ln p_raw quantizes once to micro-log BIGINT, so the
    per-document aggregation sums INTEGERS — order-independent and
    engine-exact (same contract as bigram_lm_scores).

    Scale shape: one exploded pass builds the gram stream; target and
    raw bucket counts come from ONE conditional aggregate over it
    (B-bounded rows, map-side combined); the B-row ratio table
    broadcasts back onto the stream; one per-doc sum. Nothing
    vocabulary-sized shuffles and nothing data-proportional hits the
    driver.

    Returns (id, n_grams, log_w_q, avg_log_w) — resample with
    ``operators/sampling.py::upsample_by_weight`` on exp(avg_log_w) or
    rank-select the top mass.
    """
    toks = tokens(text_col, pattern)
    d = df.select(
        F.col(id_col),
        target_pred.cast("int").alias("__t"),
        toks.alias("__w"),
    )
    bigram = F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.size("__w") - 1)),
        lambda i: F.concat_ws(
            " ", F.element_at("__w", i), F.element_at("__w", i + 1)
        ),
    )
    grams = d.select(
        id_col,
        "__t",
        F.explode(
            F.when(F.size("__w") >= 2, F.concat(F.col("__w"), bigram))
            .otherwise(F.col("__w"))
        ).alias("g"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("g"), F.lit("|dsir"))), 1, 8), 16, 10
    ).cast("long")
    stream = grams.select(id_col, "__t", (h % buckets).alias("b"))
    stream = stream.persist()
    totals = stream.agg(
        F.sum("__t").alias("nt"), F.count("*").alias("ns")
    ).first()
    if totals["nt"] is None:
        # empty corpus / all-NULL text: no grams at all — return an
        # empty scored frame instead of TypeError-ing on int(None)
        stream.unpersist()
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_grams"),
            F.lit(0).cast("long").alias("log_w_q"),
            F.lit(0.0).alias("avg_log_w"),
        ).where(F.lit(False))
    n_t, n_s = int(totals["nt"]), int(totals["ns"])
    bucket_stats = stream.groupBy("b").agg(
        F.sum("__t").alias("ct"), F.count("*").alias("cs")
    )
    unit = 10 ** scale
    lr_q = F.round(
        (
            F.log((F.col("ct") + 1.0) / float(n_t + buckets))
            - F.log((F.col("cs") + 1.0) / float(n_s + buckets))
        )
        * unit
    ).cast("long")
    ratio = bucket_stats.select("b", lr_q.alias("lrq"))
    out = (
        stream.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("lrq").alias("log_w_q"),
        )
        .select(
            id_col,
            "n_grams",
            "log_w_q",
            F.round(
                F.col("log_w_q") / F.col("n_grams") / float(unit), 6
            ).alias("avg_log_w"),
        )
    )
    out = out.localCheckpoint(eager=True)
    stream.unpersist()
    return out


def dsir_sql(
    table: str = "documents",
    target_where: str = "source = 'src0'",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    scale: int = 6,
) -> str:
    """DuckDB replay of :func:`dsir_importance` (same md5 buckets, same
    Laplace ratios, same micro-log quantization)."""
    unit = 10 ** scale
    return f"""
    WITH d AS MATERIALIZED (
        SELECT {id_col},
               CAST(CASE WHEN {target_where} THEN 1 ELSE 0 END AS INT) AS t,
               regexp_extract_all(lower({text_col}), '[a-z]+') AS w
        FROM {table}
    ),
    grams AS MATERIALIZED (
        SELECT {id_col}, t, unnest(
            CASE WHEN len(w) >= 2 THEN list_concat(w,
                list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
            ELSE w END) AS g
        FROM d
    ),
    stream AS MATERIALIZED (
        SELECT {id_col}, t,
               CAST(CAST('0x' || substr(md5(g || '|dsir'), 1, 8) AS UBIGINT)
                    % {buckets} AS BIGINT) AS b
        FROM grams
    ),
    tot AS MATERIALIZED (
        SELECT CAST(sum(t) AS BIGINT) AS nt, CAST(count(*) AS BIGINT) AS ns
        FROM stream
    ),
    ratio AS MATERIALIZED (
        SELECT b,
               CAST(round((ln((sum(t) + 1.0)
                            / ((SELECT nt FROM tot) + {buckets}))
                         - ln((count(*) + 1.0)
                            / ((SELECT ns FROM tot) + {buckets})))
                        * {unit}) AS BIGINT) AS lrq
        FROM stream GROUP BY b
    )
    SELECT {id_col},
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(lrq) AS BIGINT) AS log_w_q,
           round(CAST(sum(lrq) AS DOUBLE) / count(*) / {unit}, 6)
               AS avg_log_w
    FROM stream JOIN ratio USING (b)
    GROUP BY {id_col}
    """
