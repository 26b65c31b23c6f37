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
    bucket, rho = bucket_rho(key_col)
    regs = (
        df.select(bucket.alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("mj"))
    )
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
    rescan a resident corpus), and the standard error is the bottom-k
    O(1/sqrt(k)) bound.

    Output: one row (k_used, jaccard_est). Scale shape: one scan per
    side (map-combined distinct), WindowGroupLimit-rescued global
    top-k (~k rows per partition reach one merge), then k-row joins —
    nothing corpus-sized shuffles or reaches the driver.
    """
    sa = _bottomk_hashes(a, key_col, k, salt)
    sb = _bottomk_hashes(b, key_col, k, salt)
    from pyspark.sql import Window

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
            F.round(F.col("__ni").cast("double") / F.col("k_used"), 6).alias(
                "jaccard_est"
            ),
        )
    )
