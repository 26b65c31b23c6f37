"""Engine-exact HyperLogLog distinct counting.

``approx_count_distinct`` is engine-private (Spark's HLL++ and DuckDB's
sketch produce different estimates), so it can only ever get rows-only
checks. This HLL is built from engine-portable primitives — md5 hashing,
integer bucket/rank extraction via binary-string length, one IEEE
harmonic sum — so Spark and DuckDB compute the IDENTICAL estimate and
the oracle verifies the sketch math itself, not just row counts.

Layout (classic Flajolet HLL, m = 256 registers):

- h = first 16 hex chars of md5(key || '|hll') → 64 bits;
- bucket = top 8 bits; remainder = low 56 bits;
- rho = 1-based position of the first set bit in the remainder
  (via ``57 - length(bin(remainder))`` — string length, no log2
  rounding hazards), 57 when the remainder is zero;
- registers: max rho per bucket (one map-combined aggregate, 256 rows);
- estimate: alpha_m * m^2 / sum(2^-M_j) with empty registers counting
  2^0, plus the standard small-range linear-counting correction.

Scale shape: one scan, one 256-row aggregate, a driver-side constant
fold — the textbook distributed-sketch plan. Standard error ~1.04/√m ≈
6.5% at m=256; raise ``b`` for tighter bounds.

Reference: Flajolet et al. 2007 (HyperLogLog); the reference repo's
distinct counting is exact-only (get_id_list, SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

B_BITS = 8
M = 1 << B_BITS
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def bucket_rho(key_col: str):
    """(bucket, rho) Column pair — the single definition of the HLL
    hash layout, shared by the batch, merged, and streaming variants
    (change B_BITS or the rho edge case HERE only)."""
    h16 = F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit("|hll"))), 1, 16
    )
    bucket = F.conv(F.substring(h16, 1, 2), 16, 10).cast("long")
    rem = F.conv(F.substring(h16, 3, 14), 16, 10).cast("long")
    rho = F.when(rem == 0, F.lit(57)).otherwise(
        F.lit(57) - F.length(F.bin(rem))
    )
    return bucket, rho


def estimate_expr():
    """Estimate Column over an aggregate row with ``s`` = Σ2^-mj over
    present registers and ``nb`` = register count: harmonic mean with
    empty registers counting 2^0, plus the small-range linear-counting
    correction. The single definition shared by every estimate path."""
    est_raw = F.lit(ALPHA * M * M) / (F.col("s") + (F.lit(M) - F.col("nb")))
    zeros = F.lit(M) - F.col("nb")
    return F.when(
        (est_raw <= 2.5 * M) & (zeros > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros),
    ).otherwise(est_raw)


def hll_estimate(df: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame (n_registers, estimate, exact_distinct,
    rel_err) — estimate and exact side by side so callers (and the
    oracle) can audit the sketch against truth."""
    regs = hll_registers(df, key_col)
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("s"),
        F.count("*").alias("nb"),
    )
    exact = df.select(key_col).distinct().count()
    est = estimate_expr()
    return agg.select(
        F.col("nb").cast("long").alias("n_registers"),
        F.round(est, 4).alias("estimate"),
        F.lit(exact).cast("long").alias("exact_distinct"),
        F.round(F.abs(est - exact) / exact, 4).alias("rel_err"),
    )


def hll_merged_estimate(
    df: DataFrame, key_col: str, slice_col: str
) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes HLL the 100 TB
    distinct-count: build one register table per slice (e.g. per day /
    per partition / per event type), union them with a bucket-wise max,
    and estimate from the merged registers. Because registers are maxima
    over the same hash function, the merged estimate is IDENTICAL to
    sketching the union directly — verified side by side here (merged
    vs direct, plus their equality as a column)."""
    bucket, rho = bucket_rho(key_col)
    per_slice = (
        df.select(F.col(slice_col).alias("sl"), bucket.alias("b"), rho.alias("rho"))
        .groupBy("sl", "b")
        .agg(F.max("rho").alias("mj"))
    )
    merged = per_slice.groupBy("b").agg(F.max("mj").alias("mj"))

    def estimate(regs: DataFrame):
        agg = regs.agg(
            F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("s"),
            F.count("*").alias("nb"),
        )
        return agg.select(F.round(estimate_expr(), 4).alias("estimate"))

    direct = (
        df.select(bucket.alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("mj"))
    )
    m_est = estimate(merged).select(F.col("estimate").alias("merged_estimate"))
    d_est = estimate(direct).select(F.col("estimate").alias("direct_estimate"))
    n_slices = df.select(slice_col).distinct().count()
    return (
        m_est.crossJoin(d_est)
        .select(
            F.lit(n_slices).cast("long").alias("n_slices"),
            "merged_estimate",
            "direct_estimate",
            (F.col("merged_estimate") == F.col("direct_estimate"))
            .cast("long")
            .alias("merge_lossless"),
        )
    )


def hll_merged_sql(table: str, key_col: str, slice_col: str) -> str:
    """DuckDB replay of :func:`hll_merged_estimate`."""
    reg = f"""
        SELECT CAST(CAST('0x' || substr(h16, 1, 2) AS UBIGINT) AS BIGINT) AS b,
               CASE WHEN CAST(CAST('0x' || substr(h16, 3, 14) AS UBIGINT)
                         AS BIGINT) = 0 THEN 57
                    ELSE 57 - length(bin(CAST(CAST('0x' || substr(h16, 3, 14)
                                          AS UBIGINT) AS BIGINT)))
               END AS rho, sl"""
    est = (
        f"round(CASE WHEN {ALPHA * M * M} / (s + ({M} - nb)) <= {2.5 * M}"
        f" AND ({M} - nb) > 0 THEN {float(M)} * ln({float(M)} / ({M} - nb))"
        f" ELSE {ALPHA * M * M} / (s + ({M} - nb)) END, 4)"
    )
    return f"""
    WITH h AS MATERIALIZED (
        SELECT substr(md5(CAST({key_col} AS VARCHAR) || '|hll'), 1, 16)
            AS h16, {slice_col} AS sl
        FROM {table}
    ),
    r AS MATERIALIZED ({reg} FROM h),
    per_slice AS (SELECT sl, b, max(rho) AS mj FROM r GROUP BY sl, b),
    merged AS (SELECT b, max(mj) AS mj FROM per_slice GROUP BY b),
    direct AS (SELECT b, max(rho) AS mj FROM r GROUP BY b),
    ma AS (SELECT sum(power(2.0, -mj)) AS s, CAST(count(*) AS BIGINT) AS nb
           FROM merged),
    da AS (SELECT sum(power(2.0, -mj)) AS s, CAST(count(*) AS BIGINT) AS nb
           FROM direct),
    ns AS (SELECT CAST(count(DISTINCT {slice_col}) AS BIGINT) AS n
           FROM {table})
    SELECT (SELECT n FROM ns) AS n_slices,
           (SELECT {est} FROM ma) AS merged_estimate,
           (SELECT {est} FROM da) AS direct_estimate,
           CAST(CASE WHEN (SELECT {est} FROM ma) = (SELECT {est} FROM da)
                THEN 1 ELSE 0 END AS BIGINT) AS merge_lossless
    """


def hll_sql(table: str, key_col: str) -> str:
    """DuckDB replay of :func:`hll_estimate` — identical hash, registers,
    and harmonic estimate."""
    return f"""
    WITH h AS (
        SELECT substr(md5(CAST({key_col} AS VARCHAR) || '|hll'), 1, 16) AS h16
        FROM {table}
    ),
    r AS (
        SELECT CAST(CAST('0x' || substr(h16, 1, 2) AS UBIGINT) AS BIGINT) AS b,
               CASE WHEN CAST(CAST('0x' || substr(h16, 3, 14) AS UBIGINT)
                         AS BIGINT) = 0 THEN 57
                    ELSE 57 - length(bin(CAST(CAST('0x' || substr(h16, 3, 14)
                                          AS UBIGINT) AS BIGINT)))
               END AS rho
        FROM h
    ),
    regs AS (SELECT b, max(rho) AS mj FROM r GROUP BY b),
    agg AS (
        SELECT sum(power(2.0, -mj)) AS s, CAST(count(*) AS BIGINT) AS nb
        FROM regs
    ),
    ex AS (SELECT CAST(count(DISTINCT {key_col}) AS BIGINT) AS exact
           FROM {table})
    SELECT nb AS n_registers,
           round(CASE WHEN {ALPHA * M * M} / (s + ({M} - nb)) <= {2.5 * M}
                       AND ({M} - nb) > 0
                 THEN {float(M)} * ln({float(M)} / ({M} - nb))
                 ELSE {ALPHA * M * M} / (s + ({M} - nb)) END, 4) AS estimate,
           (SELECT exact FROM ex) AS exact_distinct,
           round(abs(CASE WHEN {ALPHA * M * M} / (s + ({M} - nb)) <= {2.5 * M}
                           AND ({M} - nb) > 0
                     THEN {float(M)} * ln({float(M)} / ({M} - nb))
                     ELSE {ALPHA * M * M} / (s + ({M} - nb)) END
                     - (SELECT exact FROM ex)) / (SELECT exact FROM ex), 4)
               AS rel_err
    FROM agg
    """


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch (deterministic, mergeable, engine-exact)
# ---------------------------------------------------------------------------

def bottomk_sample(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 4096,
    salt: str = "qsk",
) -> DataFrame:
    """Deterministic bottom-k sample: the ``k`` rows whose
    ``md5(salt|key)`` is smallest. Because md5 is a fixed uniform hash
    of the KEY, this is a uniform random sample that is simultaneously

    - deterministic (retry/partitioning/engine stable — the repo's
      md5-not-rand convention),
    - MERGEABLE by construction: bottom-k of a union is the bottom-k of
      the concatenated bottom-k's (min-k semigroup) — so per-partition,
      per-day, or per-shard sketches union and re-truncate losslessly,
      the property KLL/t-digest need randomized compaction to get, and
    - engine-exact: SQL replica is ORDER BY hash LIMIT k.

    Quantile estimates read off the sample with the shared type-7 rule;
    sampling error is the classic bottom-k bound O(1/sqrt(k)) per
    quantile (k=4096 → ~1.6% typical). Scale shape: one scan; the
    global top-k by hash is a rank<=k filter, so WindowGroupLimit
    truncates map-side and only ~k rows per partition reach the single
    merge — the same rescued shape as every top-k in the repo
    (plan-gated). Returns (``value_col``, __qh) truncated to k rows.

    Determinism holds for NON-unique keys too (round-5 fix): duplicate
    keys hash identically, so the ordering tie-breaks on ``value_col``
    — without it the rank<=k boundary cut picked rows
    nondeterministically across partitions/engines. SQL replicas must
    ORDER BY h, v the same way.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    w = Window.orderBy(F.col("__qh").asc(), F.col(value_col).asc())
    return (
        df.select(F.col(value_col), h.alias("__qh"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def bottomk_quantiles(
    df: DataFrame,
    value_col: str,
    key_col: str,
    probs: tuple = (0.5, 0.9, 0.99),
    k: int = 4096,
    salt: str = "qsk",
) -> DataFrame:
    """Quantile estimates from the bottom-k sketch: one row per
    probability with the type-7 quantile over the k-row sample (exact
    cross-engine; Spark ``percentile`` ≡ DuckDB ``quantile_cont``).
    Output: (prob, estimate, sample_k)."""
    samp = bottomk_sample(df, value_col, key_col, k, salt)
    aggs = [
        F.round(
            F.expr(f"percentile({value_col}, {p})"), 6
        ).alias(f"__q{i}")
        for i, p in enumerate(probs)
    ]
    row = samp.agg(*aggs, F.count("*").cast("long").alias("__n"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("prob"),
                F.col(f"__q{i}").alias("estimate"),
            )
            for i, p in enumerate(probs)
        ]
    )
    return row.select(
        F.explode(pairs).alias("e"), F.col("__n").alias("sample_k")
    ).select("e.prob", "e.estimate", "sample_k")


def bottomk_merge(samples: list, k: int = 4096) -> DataFrame:
    """Merge bottom-k sketches: union the (value, __qh) samples and
    re-truncate to the globally smallest k hashes — exact: equals the
    sketch of the unioned raw data (pytest-pinned)."""
    from functools import reduce

    from pyspark.sql import Window

    u = reduce(lambda a, b: a.unionByName(b), samples)
    # same (hash, value) tie-break as bottomk_sample: merge == whole
    # stays exact even when duplicate keys tie on the hash
    val = next(c for c in u.columns if c != "__qh")
    w = Window.orderBy(F.col("__qh").asc(), F.col(val).asc())
    return (
        u.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _bottomk_hashes(df: DataFrame, key_col: str, k: int, salt: str) -> DataFrame:
    """The k smallest md5 hashes of a key SET (distinct keys): the KMV
    signature. Hashing before distinct is equivalent (md5 is injective
    on distinct key strings for any practical purpose and identical
    cross-engine); the global top-k is the WindowGroupLimit-rescued
    rank<=k shape used everywhere in this module."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    w = Window.orderBy(F.col("__qh").asc())
    return (
        df.select(h.alias("__qh"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def bottomk_jaccard(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    k: int = 1024,
    salt: str = "qsk",
) -> DataFrame:
    """KMV (k-minimum-values) Jaccard estimate between two key SETS —
    the classic bottom-k set-similarity sketch: J ≈ |{h ∈ S_k(A∪B) :
    h ∈ S_k(A) ∧ h ∈ S_k(B)}| / |S_k(A∪B)| where S_k is the set of k
    smallest md5 hashes. Deterministic (md5-not-rand convention →
    retry/partition/engine stable, SQL-replayable), MERGEABLE (each
    side's signature is a min-k semigroup — per-shard signatures union
    and re-truncate losslessly, so cross-dataset overlap checks never
    rescan a resident corpus: persist with :func:`write_kmv_sketch` /
    :func:`write_kmv_sketch_catalog` and compare saved signatures via
    :func:`bottomk_jaccard_from_sketches` /
    :func:`kmv_pairwise_jaccard`), and the standard error is the
    bottom-k O(1/sqrt(k)) bound.

    Output: one row (k_used, jaccard_est). Scale shape: one scan per
    side (map-combined distinct), WindowGroupLimit-rescued global
    top-k (~k rows per partition reach one merge), then k-row joins —
    nothing corpus-sized shuffles or reaches the driver.
    """
    sa = _bottomk_hashes(a, key_col, k, salt)
    sb = _bottomk_hashes(b, key_col, k, salt)
    return bottomk_jaccard_from_sketches(sa, sb, k)


def bottomk_jaccard_from_sketches(
    sa: DataFrame, sb: DataFrame, k: int = 1024
) -> DataFrame:
    """The KMV estimate from two PERSISTED signatures (``__qh`` frames
    from :func:`write_kmv_sketch` — or any union of per-shard
    signatures; the min-k semigroup means loading several shards' saved
    sketches of the same corpus and passing their union here is exactly
    the sketch of the whole corpus). This is the from-catalog path a
    100 TB curation run uses: both legs are ≤k-row parquet reads, the
    corpora themselves are never rescanned. Identical math (and
    pytest-pinned identical output) to :func:`bottomk_jaccard`.

    Either sketch may have been built with a LARGER k than requested:
    membership checks against a superset signature are exact because
    every hash in the truncated union is ≤ the k-th smallest of each
    side, so set membership ⇔ signature membership. The converse —
    a saved signature built with SMALLER k — silently biases the
    estimate low (the union's bottom-k reaches past each side's
    truncation), so catalog-written sketches carry their build k in a
    ``__k`` column and a smaller-than-requested value raises here."""
    from pyspark.sql import Window

    _require_sketch_k(sa, k, "bottomk_jaccard_from_sketches", "left")
    _require_sketch_k(sb, k, "bottomk_jaccard_from_sketches", "right")
    sa = sa.select("__qh")
    sb = sb.select("__qh")
    w = Window.orderBy(F.col("__qh").asc())
    su = (
        sa.unionByName(sb)
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    inter = su.join(sa, "__qh", "left_semi").join(sb, "__qh", "left_semi")
    return (
        su.agg(F.count("*").cast("long").alias("k_used"))
        .crossJoin(inter.agg(F.count("*").alias("__ni")))
        .select(
            "k_used",
            # Jaccard of two empty sets is undefined: NULL, not NaN
            F.when(
                F.col("k_used") > 0,
                F.round(
                    F.col("__ni").cast("double") / F.col("k_used"), 6
                ),
            ).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# Persisted mergeable sketch catalog (round 6)
# ---------------------------------------------------------------------------
# The sketches above are mergeable by construction (min-k semigroup /
# register max); these writers make that a reusable catalog: pay one scan
# per corpus, persist a k-row (or 256-row) signature, and answer every
# later cross-dataset question from the signatures alone.


def _require_sketch_k(
    s: DataFrame, k: int, caller: str, side: str,
    group_col: str | None = None,
) -> None:
    """Refuse biased estimates from under-built signatures: a sketch
    frame carrying a ``__k`` build marker below the requested k would
    undercount the union membership checks SILENTLY. A signature with
    FEWER rows than its build k captured the whole key set and stays
    exact at any requested k — only a full-at-build signature may have
    been truncated, so only that case raises (per group for catalogs).
    One agg over a signature-sized frame; frames without the marker
    (in-session ``_bottomk_hashes`` output) are trusted as
    built-at-request-k."""
    if "__k" not in s.columns:
        return
    keys = ([group_col] if group_col else []) + ["__k"]
    rows = s.groupBy(*keys).agg(F.count("*").alias("__n")).collect()
    for r in rows:
        built, n = r["__k"], r["__n"]
        if built is not None and built < k and n >= built:
            raise ValueError(
                f"{caller}: the {side} sketch"
                + (f" (group {r[group_col]!r})" if group_col else "")
                + f" was built with k={built} < requested k={k} and is "
                "full at its build size — estimates from a truncated "
                "signature are silently biased low. Re-save the sketch "
                f"with k >= {k}, or request k <= {built}."
            )


def write_kmv_sketch(
    df: DataFrame, path: str, key_col: str, k: int = 1024, salt: str = "qsk"
) -> None:
    """Persist the KMV bottom-k signature of ``df``'s key set as a
    single-file parquet (a ``__qh`` column plus the ``__k`` build
    marker, ≤k rows). One scan now; every later
    :func:`bottomk_jaccard_from_sketches` comparison reads k rows
    instead of the corpus. ``coalesce(1)`` is safe: at most k rows
    survive the WindowGroupLimit-rescued truncation."""
    _bottomk_hashes(df, key_col, k, salt).withColumn(
        "__k", F.lit(k).cast("long")
    ).coalesce(1).write.mode("overwrite").parquet(path)


def write_kmv_sketch_catalog(
    df: DataFrame,
    path: str,
    key_col: str,
    group_col: str,
    k: int = 1024,
    salt: str = "qsk",
) -> None:
    """Persist one KMV signature PER GROUP (per source / shard / day) as
    a Hive-partitioned parquet catalog — the cross-dataset curation
    primitive: every pairwise overlap among N corpora is answered from
    N×k saved rows (:func:`kmv_pairwise_jaccard`), never by rescanning
    corpora. One scan builds all signatures: the per-group bottom-k is
    a rank<=k filter on a ``partitionBy(group)`` window, so
    WindowGroupLimit truncates map-side and ~k rows per (group,
    partition) reach the shuffle."""
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    w = Window.partitionBy("__g").orderBy(F.col("__qh").asc())
    sk = (
        df.select(F.col(group_col).alias("__g"), h.alias("__qh"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
        .withColumnRenamed("__g", group_col)
        .withColumn("__k", F.lit(k).cast("long"))
    )
    sk.write.mode("overwrite").partitionBy(group_col).parquet(path)


def kmv_pairwise_jaccard(
    sketches: DataFrame, group_col: str, k: int = 1024
) -> DataFrame:
    """All pairwise Jaccard estimates among the groups of a persisted
    sketch catalog (:func:`write_kmv_sketch_catalog`): for each group
    pair (a < b), the KMV estimate over the merged-then-retruncated
    union of the two saved signatures — identical math to
    :func:`bottomk_jaccard` on the raw key sets (pytest-pinned).

    Output: (``group_a``, ``group_b``, k_used, jaccard_est), one row
    per unordered pair. Scale shape: the group list is
    catalog-sized (broadcast both sides of the pair grid — a
    BroadcastNestedLoopJoin over |groups| rows, never a shuffle
    cartesian); signature membership expands to ≤ |pairs|·2k rows; the
    per-pair truncation window partitions by (pair), each partition
    ≤2k rows. Nothing corpus-sized exists anywhere in the plan —
    the corpora were only scanned once, at catalog-write time."""
    from pyspark.sql import Window

    _require_sketch_k(
        sketches, k, "kmv_pairwise_jaccard", "catalog", group_col=group_col
    )
    sk = sketches.select(F.col(group_col).alias("__g"), "__qh")
    groups = sk.select("__g").distinct()
    pairs = (
        groups.select(F.col("__g").alias("group_a"))
        .crossJoin(F.broadcast(groups.select(F.col("__g").alias("group_b"))))
        .where(F.col("group_a") < F.col("group_b"))
    )
    memb_a = pairs.join(sk, F.col("group_a") == F.col("__g")).select(
        "group_a", "group_b", "__qh",
        F.lit(1).alias("__fa"), F.lit(0).alias("__fb"),
    )
    memb_b = pairs.join(sk, F.col("group_b") == F.col("__g")).select(
        "group_a", "group_b", "__qh",
        F.lit(0).alias("__fa"), F.lit(1).alias("__fb"),
    )
    memb = (
        memb_a.unionByName(memb_b)
        .groupBy("group_a", "group_b", "__qh")
        .agg(F.max("__fa").alias("__fa"), F.max("__fb").alias("__fb"))
    )
    w = Window.partitionBy("group_a", "group_b").orderBy(F.col("__qh").asc())
    trunc = (
        memb.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    return (
        trunc.groupBy("group_a", "group_b")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.sum(F.col("__fa") * F.col("__fb")).alias("__ni"),
        )
        .select(
            "group_a",
            "group_b",
            "k_used",
            F.round(
                F.col("__ni").cast("double") / F.col("k_used"), 6
            ).alias("jaccard_est"),
        )
    )


def kmv_probe_group(
    sketches: DataFrame,
    new_sketch: DataFrame,
    group_col: str,
    k: int = 1024,
) -> DataFrame:
    """Asymmetric catalog probe (r7, VERDICT r6 Next #5): estimate a
    NEW corpus's Jaccard overlap against EVERY group of a persisted
    :func:`write_kmv_sketch_catalog` — the sketch-catalog mirror of the
    dedup family's asymmetric incremental probes (``dedup.py``'s
    new-vs-resident band joins): when one new source arrives, the
    question is "how much does IT overlap each cataloged corpus", and
    recomputing all N·(N−1)/2 pairs (:func:`kmv_pairwise_jaccard`)
    wastes N× the work. ``new_sketch`` is a :func:`write_kmv_sketch`
    frame (or any ``__qh`` signature) of the new corpus.

    Per group the math is exactly :func:`bottomk_jaccard_from_sketches`
    (merge the two signatures, re-truncate to bottom-k, intersection
    share) — pytest-pinned equal to the full pairwise run's rows for
    this group. Build-k guards apply to both sides (a truncated
    under-built signature raises instead of biasing low).

    Output: one row per cataloged group — (``group_col``, k_used,
    jaccard_est), jaccard_est NULL when both signatures are empty.

    Scale shape: N×k catalog rows + k probe rows read — NO corpus is
    scanned. The probe signature (≤k rows) broadcasts onto the
    |groups|-row group list (BroadcastNestedLoopJoin, never a shuffle
    cartesian); membership is ≤ |groups|·2k rows; the re-truncation
    window partitions per group, each partition ≤2k rows. Nothing
    corpus-sized anywhere."""
    from pyspark.sql import Window

    _require_sketch_k(
        sketches, k, "kmv_probe_group", "catalog", group_col=group_col
    )
    _require_sketch_k(new_sketch, k, "kmv_probe_group", "probe")
    sk = sketches.select(F.col(group_col).alias("__g"), "__qh")
    nw = new_sketch.select("__qh")
    groups = sk.select("__g").distinct()
    memb_cat = sk.select(
        "__g", "__qh", F.lit(1).alias("__fa"), F.lit(0).alias("__fb")
    )
    memb_new = groups.crossJoin(F.broadcast(nw)).select(
        "__g", "__qh", F.lit(0).alias("__fa"), F.lit(1).alias("__fb")
    )
    memb = (
        memb_cat.unionByName(memb_new)
        .groupBy("__g", "__qh")
        .agg(F.max("__fa").alias("__fa"), F.max("__fb").alias("__fb"))
    )
    w = Window.partitionBy("__g").orderBy(F.col("__qh").asc())
    trunc = memb.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    return (
        trunc.groupBy("__g")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.sum(F.col("__fa") * F.col("__fb")).alias("__ni"),
        )
        .select(
            F.col("__g").alias(group_col),
            "k_used",
            F.when(
                F.col("k_used") > 0,
                F.round(F.col("__ni").cast("double") / F.col("k_used"), 6),
            ).alias("jaccard_est"),
        )
    )


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """The (b, mj) HLL register table for ``df``'s key set — the
    persistable/mergeable half of :func:`hll_estimate` (≤256 rows)."""
    bucket, rho = bucket_rho(key_col)
    return (
        df.select(bucket.alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("mj"))
    )


def write_hll_registers(df: DataFrame, path: str, key_col: str) -> None:
    """Persist the HLL registers of ``df``'s key set (≤256-row parquet).
    Saved register tables from any number of corpora/shards/days union
    losslessly (register max), so distinct-count questions over any
    combination of saved corpora read back register rows only."""
    hll_registers(df, key_col).coalesce(1).write.mode("overwrite").parquet(
        path
    )


def hll_estimate_from_registers(regs: DataFrame) -> DataFrame:
    """Estimate distinct count from (possibly unioned) saved register
    tables: bucket-wise max merge, then the shared harmonic estimate —
    identical to sketching the union of the underlying corpora
    directly (register-max mergeability, pytest-pinned). One row
    (n_registers, estimate); input is register-table-sized, nothing
    else is read."""
    merged = regs.groupBy("b").agg(F.max("mj").alias("mj"))
    agg = merged.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("s"),
        F.count("*").alias("nb"),
    )
    return agg.select(
        F.col("nb").cast("long").alias("n_registers"),
        F.round(estimate_expr(), 4).alias("estimate"),
    )
