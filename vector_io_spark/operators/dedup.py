"""Deduplication operators.

The reference's only dedup is id-level dict-overwrite (SURVEY.md §2.7);
a 100 TB training-data pipeline needs content-level near-dup detection.
Five families, all engine-portable (md5-based hashing so the DuckDB oracle
reproduces results bit-for-bit):

- exact:    id last-write-wins; content fingerprint (md5 of normalized text)
- MinHash:  per-row signatures (shuffle-free) + LSH band-bucket join
- SimHash:  per-row n-bit fingerprint + hamming-ball candidate join
- n-gram Jaccard: inverted-index shingle join (exact similarity)
- embedding cosine: threshold pairs, brute or LSH-bucketed

Scale design notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_io_spark.functions.text import doc_fingerprint, tokens, word_shingles
from vector_io_spark.functions.vectors import dot_product


def _parquet_row_groups(df: DataFrame) -> int | None:
    """Total parquet row groups behind ``df``'s scan — the TRUE
    parallelism quantum: Spark byte-splits a file into many partitions,
    but a split that owns no row-group midpoint reads ZERO rows, so a
    big single-row-group file scans on ONE core no matter how many
    splits the planner prints. Footer-only driver-side read (pyarrow),
    bounded to ≤64 files; returns None when unknown (non-parquet
    source, remote fs without local access, many files — all cases
    where the split count is trustworthy)."""
    try:
        files = set(df.inputFiles())
    except Exception:
        return None
    if not files or len(files) > 64:
        return None
    total = 0
    try:
        import pyarrow.parquet as pq

        for f in files:
            if f.startswith("file:"):
                f = "/" + f[5:].lstrip("/")
            elif "://" in f:
                return None  # remote fs: don't guess
            if not f.endswith(".parquet"):
                return None
            total += pq.ParquetFile(f).num_row_groups
    except Exception:
        return None
    return total


def _rebalance_for_cpu(df: DataFrame) -> DataFrame:
    """CPU-bound pandas-UDF stages (signatures, fingerprints, scoring
    kernels) need one task per core; small inputs often scan as 1-2
    splits, starving the workers. Rebalance when the scan yields fewer
    partitions than the cluster's parallelism, OR when the partition
    count is a lie — parquet splits beyond the file's row-group count
    are EMPTY (measured at sf10: a 500k-row single-row-group replica
    file \"scanned as 22 splits\" but computed signatures on one core,
    151 s vs 18.5 s rebalanced). At scale with sanely-written tables
    both conditions are false and no shuffle is added (the shuffled
    payload here is raw text/vectors, tiny relative to the kernel
    compute)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    parts = df.rdd.getNumPartitions()
    effective = parts
    if parts >= target:
        rg = _parquet_row_groups(df)
        if rg is not None:
            effective = min(parts, rg)
    if effective < target:
        return df.repartition(target)
    return df



# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def dedup_by_id(
    df: DataFrame, id_col: str = "id", order_col: str | None = None
) -> DataFrame:
    """Dedup by id. With ``order_col``: last-write-wins in that order,
    mirroring the reference's dict-overwrite across files (file order,
    qdrant_export.py:181-191); without: arbitrary member per id
    (``dropDuplicates`` — one shuffle, map-side partial dedup).
    """
    if order_col is None:
        return df.dropDuplicates([id_col])
    w = Window.partitionBy(id_col).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact_content(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact content dedup: canonical fingerprint (md5 of lowercased
    alphanumerics), keep the row with the smallest id per fingerprint.

    Scale note: shuffles 16-byte hashes + ids, never the documents — the
    survivor set is resolved first, then a semi-join (broadcast if small)
    pulls surviving rows. Here both steps fuse into one window over the
    fingerprint, which AQE handles fine at any scale because fingerprints
    are uniformly distributed (no skew by construction).
    """
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", doc_fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def duplication_matrix(
    df: DataFrame, fp_col: str = "fp", source_col: str = "source"
) -> DataFrame:
    """Cross-source exact-duplication matrix from a (fingerprint, source)
    frame: for every unordered source pair, the number of duplicate
    document PAIRS spanning it and the number of distinct shared texts.
    Output columns: (source_a, source_b, n_dup_pairs, n_shared_texts)
    with source_a <= source_b; (s, s) rows measure within-source
    duplication.

    COUNT-BASED, never pair-enumerating: aggregate per (fingerprint,
    source) multiplicities first, then derive pair counts
    combinatorially — c_a*c_b across sources, C(c,2) within a source.
    The arithmetic is identical to enumerating pairs with a fingerprint
    self-join (sum over fps of per-fp pair counts), so results are
    hash-exact vs a pair-enumerating SQL oracle — but a fingerprint
    duplicated m times contributes ONE counts row per source instead of
    O(m²) join rows. At 100 TB a 1M-copy boilerplate page (empty-page
    fingerprint, cookie banner) is the difference between 1 row and
    ~10¹² join rows in a single key group — the exact mega-bucket class
    the LSH hot-bucket guard exists for, eliminated here by
    construction rather than guarded.

    Scale shape: one map-combined groupBy shuffle on (fp, source); one
    self-join on fp over the COUNTS frame, whose per-fingerprint group
    size is bounded by the number of distinct sources (no hot key can
    exist); one |sources|²-bounded rollup. Nothing driver-side.
    Multiplicities above ~3e9 per (fp, source) would overflow the
    BIGINT pair product under ANSI mode — loudly, not silently.
    """
    counts = df.groupBy(fp_col, source_col).agg(F.count("*").alias("__c"))
    a, b = counts.alias("a"), counts.alias("b")
    same = F.col(f"a.{source_col}") == F.col(f"b.{source_col}")
    # C(c,2) via integer DIV (c*(c-1) is even; double math would lose
    # exactness past 2^53), c_a*c_b for the cross-source legs
    within = F.expr("CAST(a.__c * (a.__c - 1) DIV 2 AS BIGINT)")
    across = (F.col("a.__c") * F.col("b.__c")).cast("long")
    return (
        a.join(
            b,
            (F.col(f"a.{fp_col}") == F.col(f"b.{fp_col}"))
            & (F.col(f"a.{source_col}") <= F.col(f"b.{source_col}")),
        )
        .select(
            F.col(f"a.{source_col}").alias("source_a"),
            F.col(f"b.{source_col}").alias("source_b"),
            F.col(f"a.{fp_col}").alias("__fp"),
            F.when(same, within).otherwise(across).alias("__npairs"),
        )
        # a single-copy (fp, source) contributes no within-source pair;
        # dropping it here also keeps it out of n_shared_texts, matching
        # the pair-enumeration semantics (no pair -> fp not shared)
        .where(F.col("__npairs") > 0)
        .groupBy("source_a", "source_b")
        .agg(
            F.sum("__npairs").cast("long").alias("n_dup_pairs"),
            F.countDistinct("__fp").cast("long").alias("n_shared_texts"),
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-document MinHash signature as ``array<string>`` of length
    ``num_hashes``.

    Hash family: one md5 per *group* of 4 hash functions —
    ``md5(g || ':' || shingle)`` — sliced into four 8-hex-char substrings
    (md5 bits are independent, so slices are valid independent hash
    functions). Signature element ``j = g*4 + r`` is the lexicographic MIN
    of slice ``r`` of group ``g`` over the document's shingle set.

    Implementation: Arrow-batched pandas UDF (tokenize + hashlib.md5 in
    the Python worker). The values are identical to the SQL/expression
    formulation (same md5 hex), but wall-clock is ~5× better than
    evaluating interpreted higher-order md5 chains JVM-side — Spark's HOF
    lambdas are not codegen'd, so per-shingle hashing is cheaper in a
    vectorized Python worker. Still **shuffle-free**: one projection.
    """
    assert num_hashes % 4 == 0, "num_hashes must be a multiple of 4"
    import hashlib
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    n_groups = num_hashes // 4
    word_re = re.compile("[a-z]+")
    k = shingle_k

    def _sig_batch(texts):
        # per-batch shingle cache: near-dup documents (the reason this
        # operator exists) share most shingles, and Zipfian text shares
        # plenty more — caching (shingle -> per-group 8-hex slices)
        # converts repeated md5 work to dict lookups. Values identical
        # to the uncached form (same md5 hexdigest slices).
        cache: dict = {}
        out = []
        for t in texts:
            toks = word_re.findall(t.lower()) if isinstance(t, str) else []
            shingles = (
                {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
                if len(toks) >= k
                else set()
            )
            if shingles:
                # cache stores the 16 PRE-SLICED 8-hex substrings per
                # shingle (r12): slicing happens once per distinct
                # shingle at cache-fill instead of 16x per document
                # occurrence, and the per-doc mins reduce over a
                # C-speed zip. Values identical (same md5 hex slices).
                slices = []
                for s in shingles:
                    v = cache.get(s)
                    if v is None:
                        v = tuple(
                            h[lo : lo + 8]
                            for g in range(n_groups)
                            for h in (
                                hashlib.md5(f"{g}:{s}".encode()).hexdigest(),
                            )
                            for lo in (0, 8, 16, 24)
                        )
                        cache[s] = v
                    slices.append(v)
                sig = list(map(min, zip(*slices)))
            else:
                sig = [None] * num_hashes
            out.append(sig)
        return pd.Series(out)

    sig_udf = pandas_udf(_sig_batch, ArrayType(StringType()))
    df = _rebalance_for_cpu(df)
    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("minhash"))


def _materialize_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Eagerly materialize ``result`` (localCheckpoint: computes it once
    and truncates lineage) and then ``unpersist`` the cached inputs that
    fed it — so every pair-finding operator releases its signature/
    shingle cache before returning instead of leaking it until someone
    calls ``clearCache()``. The checkpointed frame is the verified pair
    set (~|duplicates|, small); holding THAT in the block manager while
    freeing the corpus-sized cache is the right memory trade at 100 TB.
    On executor loss the checkpointed partitions are gone and the query
    re-runs — same blast radius as any uncached job."""
    out = result.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out


# Auto-sizing rule for the hot-bucket guard (see _auto_bucket_cap):
# cap = max(FLOOR, ceil(FACTOR * mean bucket occupancy)). With sane LSH
# geometry (bits/band >= log2(corpus), the sizing rule documented on
# dedup_embedding_cosine) mean occupancy is ~1-2, so the FLOOR is what
# binds: only buckets with >64 members — boilerplate/template clusters,
# the exact failure class measured at sf1 in round 3 — are excluded.
# If the geometry is undersized the FACTOR term keeps total join work
# near-linear (<= n_buckets * cap^2) instead of quadratic.
AUTO_BUCKET_CAP_FLOOR = 64
AUTO_BUCKET_CAP_FACTOR = 8


def _auto_cap_from_totals(buckets: int, rows: int) -> int:
    """The auto-cap sizing rule on precomputed totals:
    max(FLOOR, ceil(FACTOR × mean occupancy))."""
    if not buckets:
        return AUTO_BUCKET_CAP_FLOOR
    import math

    return max(
        AUTO_BUCKET_CAP_FLOOR,
        math.ceil(AUTO_BUCKET_CAP_FACTOR * rows / buckets),
    )


def _auto_bucket_cap(banded: DataFrame) -> int:
    """Derive a hot-bucket cap from the banded frame's own occupancy
    stats: one map-combined aggregate (rows + distinct buckets → mean
    occupancy), a scalar collect (bounded driver state). Used when the
    cap must be derived ONCE and shared across frames (the incremental
    probe/index pair); :func:`_cap_buckets` derives it from its own
    single-pass bucket-size frame instead."""
    row = (
        banded.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("__n"))
        .agg(
            F.count("*").alias("__buckets"),
            F.sum("__n").alias("__rows"),
        )
        .collect()[0]
    )
    return _auto_cap_from_totals(row["__buckets"], row["__rows"] or 0)


# Over-cap buckets are removed with a BROADCAST anti-join when few —
# the common case: mega-buckets are outliers by definition, and the
# auto rule bounds their count by rows/cap ≤ rows/64. Past this many
# hot buckets fall back to a shuffle anti-join (same keys the band
# self-join shuffles on anyway).
HOT_BUCKET_BROADCAST_MAX = 100_000


def _cap_buckets(
    banded: DataFrame, max_bucket_size: int | str | None
) -> DataFrame:
    """Hot-bucket guard for LSH band joins: buckets larger than the cap
    are EXCLUDED from pair generation. Real web corpora have boilerplate
    clusters (empty pages, templates) whose members all land in one band
    bucket and self-join quadratically; a true near-dup pair inside a
    dropped mega-bucket still collides in one of the OTHER bands with
    high probability (unless the whole cluster is near-identical — those
    belong on the exact-dedup path), so the recall cost is small while
    the worst-case cost drops from O(max_bucket²) to O(cap²·n_buckets).

    ``"auto"`` (the production default since round 4) derives the cap
    from the corpus's own occupancy stats — a 100 TB operator gets
    mega-bucket protection without knowing the knob exists. Pass
    ``None`` for exact banding semantics: the oracle-checked registered
    queries do, so their results stay hash-exact vs the (cap-free) SQL
    replica by construction. Use :func:`minhash_bucket_occupancy` to
    SEE the skew before it bites.

    Single-pass since round 5: per-bucket sizes are computed ONCE
    (groupBy, eagerly checkpointed — the bucket table is |distinct
    buckets| rows of two keys + a count, executor-resident), the auto
    cap is a 1-row aggregate over that frame, and over-cap buckets are
    anti-joined out — broadcast when few (no shuffle of the banded
    frame at all), shuffle fallback past ``HOT_BUCKET_BROADCAST_MAX``.
    Replaces the round-4 two-pass form (occupancy aggregate + window
    re-count), which paid two full shuffles of the banded frame.

    Storage hygiene (round 6): the checkpointed sizes frame is released
    before returning on EVERY path, so repeat callers (the incremental
    operators run this twice per invocation; the streaming ingest once
    per micro-batch) accumulate nothing in executor storage. That means
    the returned (lazy) plan may not reference ``sizes``: the common
    no-hot-bucket path returns ``banded`` untouched; the broadcast path
    collects the over-cap keys (bounded by ``HOT_BUCKET_BROADCAST_MAX``)
    into a driver-local frame; only the pathological >100k-hot-buckets
    fallback re-derives the bucket sizes from ``banded`` inside the
    returned plan (one extra shuffle of the banded frame, in the one
    case where hot-bucket volume is itself corpus-scale)."""
    if max_bucket_size is None:
        return banded
    sizes = (
        banded.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("__bucket_n"))
        .localCheckpoint(eager=True)
    )
    try:
        if max_bucket_size == "auto":
            row = sizes.agg(
                F.count("*").alias("__buckets"),
                F.sum("__bucket_n").alias("__rows"),
            ).collect()[0]
            max_bucket_size = _auto_cap_from_totals(
                row["__buckets"], row["__rows"] or 0
            )
        hot = sizes.where(F.col("__bucket_n") > max_bucket_size).select(
            "band_id", "band_key"
        )
        # one Arrow round-trip doubles as the count and (when small) the
        # driver-side materialization that frees the checkpointed sizes
        # frame from the returned plan's lineage
        hot_pdf = hot.limit(HOT_BUCKET_BROADCAST_MAX + 1).toPandas()
        n_hot = len(hot_pdf)
        if n_hot == 0:
            return banded
        if n_hot <= HOT_BUCKET_BROADCAST_MAX:
            spark = banded.sparkSession
            hot_local = F.broadcast(
                spark.createDataFrame(hot_pdf, schema=hot.schema)
            )
            return banded.join(
                hot_local, ["band_id", "band_key"], "left_anti"
            )
        # pathological: corpus-scale hot-bucket volume — rebuild the
        # over-cap set from banded's own lineage (second shuffle of
        # banded at execution time) rather than pinning sizes' blocks
        hot_lazy = (
            banded.groupBy("band_id", "band_key")
            .agg(F.count("*").alias("__bucket_n"))
            .where(F.col("__bucket_n") > max_bucket_size)
            .select("band_id", "band_key")
        )
        return banded.join(hot_lazy, ["band_id", "band_key"], "left_anti")
    finally:
        sizes.unpersist()


def minhash_bucket_occupancy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 8,
) -> DataFrame:
    """Per-band bucket-occupancy audit for the MinHash-LSH banding — the
    'see the skew BEFORE it bites' companion to the hot-bucket guard.
    For each band: bucket count, row count, max bucket size, mean
    occupancy, the candidate-pair volume the band join would generate
    (Σ n·(n−1)/2 — THE cost driver; one mega-bucket dominates it
    quadratically), plus the cap the ``"auto"`` guard would apply
    (same arithmetic as :func:`_auto_bucket_cap`, computed in-plan from
    the global totals) and the rows it would exclude. A 100 TB operator
    runs this on a corpus sample before the pair pass: ``max_bucket ≫
    auto_cap`` means boilerplate clusters (route them to exact dedup),
    ``mean_occupancy ≫ 1`` means the band-key space is undersized
    (raise bits/band per the log2(corpus) rule).

    Scale shape: one signature projection (shuffle-free), one explode,
    one (band, key) rollup — the per-bucket frame is |distinct buckets|
    ≤ rows×bands and is persisted once for the totals + report branches;
    the 1-row totals broadcast back. Nothing corpus-sized reaches the
    driver. Fully SQL-expressible (oracle-paired in queries.py).
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    banded = sigs.where(F.col("minhash")[0].isNotNull()).select(
        F.posexplode(_sig_band_array(num_hashes, bands)).alias(
            "band_id", "band_key"
        )
    )
    per_bucket = (
        banded.groupBy("band_id", "band_key")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    per_bucket.count()  # eager fill: totals + report branches share it
    totals = per_bucket.agg(
        F.count("*").alias("__tb"), F.sum("n").alias("__tr")
    )
    auto_cap = F.greatest(
        F.lit(AUTO_BUCKET_CAP_FLOOR).cast("long"),
        F.ceil(
            F.lit(float(AUTO_BUCKET_CAP_FACTOR))
            * F.col("__tr")
            / F.col("__tb")
        ).cast("long"),
    )
    report = (
        per_bucket.crossJoin(F.broadcast(totals))
        .withColumn("auto_cap", auto_cap)
        .groupBy(F.col("band_id").cast("long").alias("band_id"), "auto_cap")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("n").cast("long").alias("n_rows"),
            F.max("n").cast("long").alias("max_bucket"),
            F.round(
                F.sum("n").cast("double") / F.count("*"), 6
            ).alias("mean_occupancy"),
            F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias(
                "candidate_pairs"
            ),
            F.sum(
                F.when(F.col("n") > F.col("auto_cap"), F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("rows_over_cap"),
        )
        .select(
            "band_id",
            "n_buckets",
            "n_rows",
            "max_bucket",
            "mean_occupancy",
            "candidate_pairs",
            "auto_cap",
            "rows_over_cap",
        )
    )
    return _materialize_release(report, per_bucket)


def _sig_band_array(num_hashes: int, bands: int):
    """Band-key array over a ``minhash`` signature column — the ONE
    definition of the banding layout (consecutive rows_per_band slices,
    '|'-joined). Shared by the symmetric and incremental LSH passes so
    their pytest-pinned equality contract cannot drift."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.concat_ws(
                "|", F.slice(F.col("minhash"), b * rows_per_band + 1, rows_per_band)
            )
            for b in range(bands)
        ]
    )


def _est_jaccard_expr(num_hashes: int):
    """Signature-overlap Jaccard estimate between the 'l' and 'r' sides
    of a banded self-join — shared by both LSH pair operators."""
    return (
        F.size(
            F.filter(
                F.zip_with(
                    F.col("l.minhash"), F.col("r.minhash"), lambda a, b: a == b
                ),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(num_hashes))
    )


def minhash_lsh_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """Near-dup candidate pairs via MinHash-LSH banding, verified with the
    estimated Jaccard from full signatures.

    Plan: signatures (shuffle-free) -> explode ``bands`` band-keys per row
    -> self-join on (band_id, band_key) -> distinct candidate pairs ->
    verify sig-overlap >= threshold. The only shuffles move (band_key, id)
    pairs — tiny — and the band join only collides near-duplicates, so at
    100 TB the join output is ~|duplicate pairs|, not |rows|².
    ``max_bucket_size`` guards against boilerplate mega-buckets (see
    :func:`_cap_buckets`) — the default ``"auto"`` sizes the cap from
    the corpus's own occupancy stats; pass ``None`` for exact banding
    semantics (the oracle-paired queries do). Audit skew first with
    :func:`minhash_bucket_occupancy`.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    # Persist signatures: the banded self-join references them on both
    # sides, and the signature scan (md5-heavy) is the expensive stage —
    # at 100 TB you'd checkpoint sigs to a table; locally MEMORY_AND_DISK.
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k).persist()
    sigs.count()  # eager fill: the self-join's two map stages run
    # concurrently and would otherwise each compute the signatures

    # Empty/short documents (no shingles) have all-NULL signatures;
    # concat_ws skips NULLs, so every one of them would land in the SAME
    # band bucket and self-join O(n_empty²) before the est_jaccard filter
    # runs — a quadratic skew bucket at web scale where boilerplate-
    # stripped empty docs number in the millions. They can never verify
    # (NULL elements never compare equal → est_jaccard 0), so dropping
    # them pre-banding is result-identical; route empty docs to the
    # exact-dedup path instead.
    banded_src = sigs.where(F.col("minhash")[0].isNotNull())
    band_arr = _sig_band_array(num_hashes, bands)
    banded = banded_src.select(
        id_col, "minhash", F.posexplode(band_arr).alias("band_id", "band_key")
    )
    banded = _cap_buckets(banded, max_bucket_size)
    left = banded.alias("l")
    right = banded.alias("r")
    est = _est_jaccard_expr(num_hashes)
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
    return _materialize_release(pairs, sigs)


def minhash_lsh_incremental_pairs(
    old: DataFrame | None,
    new: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | str | None = "auto",
    old_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup detection for the daily-ingest shape: find
    every near-dup pair that INVOLVES the new batch (new-vs-old and
    new-vs-new) without ever re-joining the resident corpus against
    itself. The band join is asymmetric — the (small) new batch's band
    keys probe the union's banded signatures — so per ingest the work is
    O(|new| x bucket occupancy), not O(|corpus|²): the property that
    makes continuous dedup affordable at 100 TB. Pass ``old_sigs`` (a
    (id, minhash) frame, e.g. read back from
    :func:`write_signature_index`) to skip recomputing the resident
    side's signatures entirely — then each ingest touches the corpus
    only through the band join; without it the resident signatures are
    recomputed per call (corpus-linear, never quadratic).

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, where at least
    one side belongs to ``new``. Same md5 hash family, banding layout,
    empty-signature guard, and hot-bucket cap semantics as
    :func:`minhash_lsh_dup_pairs` — and the restriction-equality
    contract (results are EXACTLY the symmetric operator's pairs on
    ``old ∪ new`` restricted to new-involving ones, pytest-pinned)
    holds at EVERY ``max_bucket_size`` value including the default:
    under ``"auto"`` the cap is derived ONCE from the union-side
    banding — the identical stats the symmetric operator's auto guard
    sees — and applied to both probe and index (round-5 fix; probe-side
    capping with the union cap can never drop a bucket the index
    keeps, since probe ⊆ union).
    """
    if old_sigs is not None:
        sigs_old = old_sigs
    elif old is None:
        raise ValueError(
            "minhash_lsh_incremental_pairs: pass the resident corpus via "
            "`old` or its persisted signatures via `old_sigs`"
        )
    else:
        sigs_old = minhash_signatures(
            old, id_col, text_col, num_hashes, shingle_k
        )
    sigs_new = minhash_signatures(new, id_col, text_col, num_hashes, shingle_k)
    sigs_all = sigs_old.unionByName(sigs_new).persist()
    sigs_new_only = sigs_new.persist()
    sigs_all.count()
    sigs_new_only.count()

    band_arr = _sig_band_array(num_hashes, bands)

    def banded_raw(sigs: DataFrame) -> DataFrame:
        src = sigs.where(F.col("minhash")[0].isNotNull())
        return src.select(
            id_col, "minhash", F.posexplode(band_arr).alias("band_id", "band_key")
        )

    if max_bucket_size == "auto":
        # derive the cap ONCE from the union-side banding (identical
        # stats to the symmetric operator's auto guard) and apply the
        # same value to both sides — the restriction-equality contract
        # then holds at the default, not only at explicit caps
        max_bucket_size = _auto_bucket_cap(banded_raw(sigs_all))
    probe = _cap_buckets(banded_raw(sigs_new_only), max_bucket_size).alias("l")
    index = _cap_buckets(banded_raw(sigs_all), max_bucket_size).alias("r")
    est = _est_jaccard_expr(num_hashes)
    lo = F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}"))
    hi = F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}"))
    pairs = (
        probe.join(
            index,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .select(
            lo.alias("id_a"),
            hi.alias("id_b"),
            F.round(est, 4).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
    return _materialize_release(pairs, sigs_all, sigs_new_only)


# --------------------------------------------------------------------------
# n-gram Jaccard (exact similarity via inverted index)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.3,
    materialize: bool = True,
) -> DataFrame:
    """Exact shingle-Jaccard pairs >= threshold via a PPJoin-style
    prefix-filtered set-similarity join.

    Correctness identity: jaccard(A,B) >= t implies
    (a) |A∩B| >= t/(1+t)·(|A|+|B|)  — so A and B must share a shingle
        among each one's "prefix": its (|X| - ⌈t·|X|⌉ + 1) globally
        RAREST shingles (rarest-first ordering maximizes pruning);
    (b) t·|A| <= |B| <= |A|/t       — the length filter.

    Plan: (1) one tokenization pass -> per-doc distinct shingle array +
    size (persisted); (2) global doc-frequency ranks shingles by rarity;
    (3) candidate pairs = equi-join of PREFIX shingles only, with the
    length filter in the join condition; (4) exact verify on candidates
    via array_intersect of the full shingle arrays. The full inverted
    index never self-joins — candidate volume is ~|near-dup pairs|, and
    verification is O(|A|+|B|) per surviving pair. Result-identical to
    the naive join (the oracle SQL keeps the naive formulation).

    Returns (id_a, id_b, jaccard), id_a < id_b.
    """
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    word_re = re.compile("[a-z]+")
    k = shingle_k

    def _shingle_batch(texts):
        # same values as functions.text.word_shingles + array_distinct
        # (order differs; all consumers are set-semantics), at hashlib/
        # regex speed instead of interpreted HOF chains
        out = []
        for t in texts:
            toks = word_re.findall(t.lower()) if isinstance(t, str) else []
            out.append(
                list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})
                if len(toks) >= k
                else []
            )
        return pd.Series(out)

    shingle_udf = pandas_udf(_shingle_batch, ArrayType(StringType()))
    df = _rebalance_for_cpu(df)
    # hash shingles to int64 once: every downstream shuffle (doc-freq,
    # prefix join, verification) moves 8-byte ints instead of ~20-char
    # strings, and array_intersect compares longs (collision probability
    # over 64 bits is ~1e-9 for this workload — immaterial)
    shingle_arrays = df.select(
        F.col(id_col),
        F.transform(shingle_udf(F.col(text_col)), lambda s: F.xxhash64(s)).alias(
            "sh_arr"
        ),
    ).persist()
    if materialize:
        shingle_arrays.count()  # eager fill: 4 downstream consumers
    sh = shingle_arrays.select(
        id_col,
        F.size("sh_arr").alias("n_sh"),
        F.explode("sh_arr").alias("shingle"),
    )
    # Global shingle order = (df ascending, shingle): rarest first, the
    # canonical PPJoin ordering. Two volume cuts before the window/join:
    #   - df == 1 shingles can never match across documents, and in the
    #     rarest-first order they occupy the HEAD of every prefix — so
    #     the join input needs only df >= 2 rows, and a matched shingle's
    #     global rank is recovered as (n_sh - n_shared) + rank-among-
    #     shared. On realistic corpora most shingles are unique, so the
    #     windowed/shuffled volume drops by that fraction.
    #   - n_sh rides along from size(sh_arr) at explode time — no join
    #     against a per-doc sizes table (a broadcast of one row per
    #     document would be billions of rows at 100 TB).
    #   - df_sh is a COUNT WINDOW over the shingle clustering, not a
    #     groupBy + join-back (r13, guide §2.4): count(*) over
    #     (partition by shingle) equals the old doc_freq join value row
    #     for row, and the exploded corpus-scale frame crosses ONE
    #     exchange (the window's) instead of two (the aggregate's and
    #     the join probe side's).
    wsh = Window.partitionBy("shingle")
    ranked = sh.withColumn("df_sh", F.count("*").over(wsh)).where(
        F.col("df_sh") >= 2
    )
    wdoc = Window.partitionBy(id_col)
    w = wdoc.orderBy(F.col("df_sh").asc(), F.col("shingle").asc())
    prefixes = (
        ranked.withColumn("__rk_sh", F.row_number().over(w))
        .withColumn("__n_shared", F.count("*").over(wdoc))
        .withColumn(
            "__rk", F.col("n_sh") - F.col("__n_shared") + F.col("__rk_sh")
        )
        .where(
            F.col("__rk")
            <= F.col("n_sh") - F.ceil(F.col("n_sh") * threshold) + 1
        )
        .select(id_col, "shingle", "n_sh", "__rk")
        # persisted: BOTH sides of the candidate self-join read this
        # frame; uncached, the whole explode→df-window→rank-window
        # chain was planned (and executed) once PER SIDE — the r13
        # profile showed the two duplicate 4.5 MB exchanges as the
        # query's heaviest stages. Prefix-sized (df>=2 rows only),
        # released with the shingle cache below.
        .persist()
    )
    if materialize:
        prefixes.count()  # eager fill: the self-join's two concurrent
        # map stages would otherwise race to compute the window chain
    a, b = prefixes.alias("a"), prefixes.alias("b")
    # Positional filter (PPJoin): a match at global ranks (ra, rb) caps
    # the attainable overlap at min(na - ra, nb - rb) + 1, which must
    # reach alpha = ceil(t/(1+t)·(na+nb)) for jaccard >= t. Safe under
    # any-match semantics: if jaccard >= t, the FIRST common shingle in
    # the global order has every common shingle at or after its rank in
    # both lists, so that row passes. Rarest-first ordering places hot
    # shingles at rank ≈ n, so pairs whose only prefix match is a hot
    # shingle are exactly the ones pruned (~3× fewer candidates).
    alpha = F.ceil(
        F.lit(threshold) / (1.0 + threshold)
        * (F.col("a.n_sh") + F.col("b.n_sh"))
    )
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.n_sh") * threshold <= F.col("a.n_sh"))
            & (F.col("a.n_sh") * threshold <= F.col("b.n_sh"))
            & (
                F.least(
                    F.col("a.n_sh") - F.col("a.__rk"),
                    F.col("b.n_sh") - F.col("b.__rk"),
                )
                + 1
                >= alpha
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    arr_a = shingle_arrays.select(
        F.col(id_col).alias("id_a"), F.col("sh_arr").alias("__sa")
    )
    arr_b = shingle_arrays.select(
        F.col(id_col).alias("id_b"), F.col("sh_arr").alias("__sb")
    )
    verified = (
        cand.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("__sa", "__sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.size("__sa") + F.size("__sb") - F.col("n_common")),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not materialize:
        # plan-capture path (tools/plan_round_shapes_r13.py): the
        # checkpointed result hides the pair-finding plan from
        # explain(); hand back the lazy frame and queue the persisted
        # inputs for the registry release instead.
        from vector_io_spark.cache_registry import register

        register(shingle_arrays, prefixes)
        return verified
    return _materialize_release(verified, shingle_arrays, prefixes)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _hex_nibble(h: Column, pos: int) -> Column:
    """Value 0-15 of hex digit ``pos`` (1-based) of an md5 hex string —
    portable to any engine via strpos('0123456789abcdef', digit) - 1."""
    return F.instr(F.lit("0123456789abcdef"), F.substring(h, pos, 1)) - 1


def simhash(c: Column | str, bits: int = 32) -> Column:
    """SimHash fingerprint over word tokens as a BIGINT.

    bit_j = sign of Σ_tokens (bit_j(md5(token)) * 2 - 1); bit_j of a hash
    is bit (j%4) of hex nibble (j//4) — engine-portable (the DuckDB oracle
    reproduces it from md5 hex).

    Implementation: Arrow-batched pandas UDF (hashlib + integer bit ops) —
    identical values to the expression formulation but without ``bits``
    interpreted aggregate passes per row. Shuffle-free: one projection.
    """
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    word_re = re.compile("[a-z]+")
    n_nibbles = (bits + 3) // 4
    n_bytes = (n_nibbles + 1) // 2

    def _token_pm(tok: str):
        # ±1 vector of the token's md5 bits: bit j = bit (j%4) of hex
        # nibble (j//4) — identical values to the scalar loop, computed
        # with numpy shifts. hexdigest char 2k is byte k's HIGH nibble.
        raw = np.frombuffer(
            hashlib.md5(tok.encode()).digest()[:n_bytes], dtype=np.uint8
        )
        nib = np.empty(n_bytes * 2, dtype=np.uint8)
        nib[0::2] = raw >> 4
        nib[1::2] = raw & 0xF
        bit_mat = (nib[:n_nibbles, None] >> np.arange(4)[None, :]) & 1
        return (2 * bit_mat.reshape(-1)[:bits].astype(np.int64)) - 1

    def _fp_batch(texts):
        # per-batch token cache: simhash recomputes the same token bits
        # for every document containing it — in any natural corpus the
        # token distribution is Zipfian, so the cache converts the md5 +
        # bit-unpack cost from O(doc·tokens) to O(|batch vocab|)
        cache: dict = {}
        out = []
        for t in texts:
            toks = set(word_re.findall(t.lower())) if isinstance(t, str) else set()
            if not toks:
                out.append(0)
                continue
            acc = np.zeros(bits, dtype=np.int64)
            for tok in toks:
                v = cache.get(tok)
                if v is None:
                    v = _token_pm(tok)
                    cache[tok] = v
                acc += v
            fp = 0
            for j in np.flatnonzero(acc > 0):
                fp |= 1 << int(j)
            out.append(fp)
        return pd.Series(out)

    fp_udf = pandas_udf(_fp_batch, LongType())
    return fp_udf(F.col(c) if isinstance(c, str) else c)


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation by the pigeonhole principle: split the fingerprint
    into ``chunks`` bit-blocks; any pair within hamming ``chunks-1`` agrees
    on >= 1 block, so an equi-join per block finds all candidates with one
    shuffle on small integer keys. Verify with bit_count(a XOR b).
    Returns (id_a, id_b, hamming), id_a < id_b.

    Token-less documents (no ``[a-z]+`` token after lowercasing) are
    EXCLUDED: they all hash to fp=0, collide in every pigeonhole block,
    and — unlike the MinHash case — would VERIFY against each other
    (hamming 0), so at web scale the all-empty bucket emits O(n_empty²)
    result rows. Empty-vs-empty "similarity" is meaningless; route empty
    docs to the exact-dedup path. (The oracle SQL applies the same
    token-presence filter.)
    """
    assert max_hamming < chunks, "pigeonhole requires max_hamming < chunks"
    chunk_bits = bits // chunks
    # persist: fingerprints feed both sides of the self-join
    fp = (
        _rebalance_for_cpu(df.where(F.col(text_col).rlike("[a-zA-Z]")))
        .select(F.col(id_col), simhash(text_col, bits).alias("fp"))
        .persist()
    )
    fp.count()  # eager fill before the self-join races
    block_arr = F.array(
        *[
            F.floor(F.col("fp") / (2 ** (i * chunk_bits))).cast("bigint")
            % (2**chunk_bits)
            for i in range(chunks)
        ]
    )
    blocked = fp.select(id_col, "fp", F.posexplode(block_arr).alias("blk_id", "blk"))
    l, r = blocked.alias("l"), blocked.alias("r")
    ham = F.bit_count(F.col("l.fp").bitwiseXOR(F.col("r.fp")))
    pairs = (
        l.join(
            r,
            (F.col("l.blk_id") == F.col("r.blk_id"))
            & (F.col("l.blk") == F.col("r.blk"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
    return _materialize_release(pairs, fp)


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def dedup_embedding_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    method: str = "lsh",
    num_planes: int = 128,
    bands: int = 8,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    """Embedding near-dup pairs with cosine >= threshold.

    Null and all-zero vectors are excluded from the LSH path before
    signing: they share one hyperplane signature (all sign bits 0) and
    would pile into a single quadratic band bucket; since cosine against
    a zero vector is undefined (NaN) they can never verify, so the filter
    is result-identical and removes the skew bucket.

    method='brute': full self cross-join — O(n²), the correctness oracle.
    method='lsh' (default, the 100 TB path): random-hyperplane signature
    (sign bits of dot(v, plane_i) using deterministic md5-derived planes),
    band join on signature chunks, cosine verify. The cross product never
    materializes; only hash-colliding (i.e. angularly close) pairs meet.

    Geometry sizing: band-key width = num_planes/bands BITS, so the
    bucket space per band is 2^(num_planes/bands) — it must exceed the
    corpus size or bucket occupancy (and pair generation) grows
    LINEARLY with n, making the join quadratic. The round-2 default
    (32/4 = 8-bit keys = 256 buckets) hit exactly that wall at a 40k-
    vector bench: ~150 vectors/bucket, ~12M candidate pairs. Defaults
    are now 128 planes / 8 bands = 16-bit keys (65k buckets; recall at
    the 0.95 threshold boundary ~0.80 per the (1-θ/π)^16-per-band
    curve, ~0.994 at 0.99, 1.0 for exact twins); size bits/band ≈
    log2(corpus) + slack, and raise bands to recover recall.
    ``max_bucket_size`` additionally guards boilerplate mega-buckets
    (:func:`_cap_buckets`; default ``"auto"`` — pass ``None`` for exact
    banding semantics, as the brute oracle comparisons do).

    Returns (id_a, id_b, cos_sim), id_a < id_b.
    """
    if method == "brute":
        from vector_io_spark.functions.vectors import l2_norm

        # hoist ||v|| to one computation per row (bit-identical: the pair
        # cosine below reuses the same sqrt(dot(x,x)) subexpression)
        normed = df.withColumn("__n", l2_norm(F.col(vec_col)))
        l, r = normed.alias("l"), normed.alias("r")
        pairs = l.join(r, F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        den = F.col("l.__n") * F.col("r.__n")
        sim = F.round(
            F.when(
                den != 0.0,
                dot_product(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")) / den,
            ),
            6,
        )
        return pairs.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            sim.alias("cos_sim"),
        ).where(F.col("cos_sim") >= threshold)
    if method == "lsh":
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType

        nonzero = df.where(
            F.col(vec_col).isNotNull()
            & F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))
        )
        sig_df = _hyperplane_signature(nonzero, id_col, vec_col, num_planes)
        cand = _signature_band_pairs(
            sig_df, id_col, num_planes, bands=bands,
            max_bucket_size=max_bucket_size,
        )
        pairs = (
            cand.join(df.select(F.col(id_col).alias("id_a"), F.col(vec_col)), "id_a")
            .withColumnRenamed(vec_col, "__va")
            .join(df.select(F.col(id_col).alias("id_b"), F.col(vec_col)), "id_b")
            .withColumnRenamed(vec_col, "__vb")
        )

        def _cos_batch(va, vb):
            A = np.vstack(va.to_numpy()).astype(np.float64)
            B = np.vstack(vb.to_numpy()).astype(np.float64)
            return pd.Series(_seq_cosine_rows(A, B))

        # candidate verification is the hot loop: numpy batch cosine
        # (vectorized across rows, dimension-sequential — engine-exact)
        # instead of interpreted per-row HOF chains
        cos_udf = pandas_udf(_cos_batch, DoubleType())
        return (
            pairs.withColumn("cos_sim", cos_udf(F.col("__va"), F.col("__vb")))
            .where(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )
    raise ValueError(f"unknown method {method!r}")


def _seq_cosine_rows(A, B):
    """Row-pairwise cosine with dimension-SEQUENTIAL double accumulation
    (numerator and both norms), rounded with the Spark ``F.round(x, 6)``
    replica — bit-identical to the ``aggregate(zip_with(...))`` /
    ``list_sum(list_transform(...))`` form, so LSH-verified scores are
    engine-exact and the queries they feed can be oracle-paired (round
    5; previously ``(A*B).sum(axis=1)`` + banker's ``np.round``, whose
    pairwise-summation order and midpoint rule are numpy-specific).
    NaN where either norm is zero."""
    import numpy as np

    from vector_io_spark.operators.similarity import _round6_half_up

    num = np.zeros(len(A))
    na = np.zeros(len(A))
    nb = np.zeros(len(A))
    for d in range(A.shape[1]):
        num += A[:, d] * B[:, d]
        na += A[:, d] * A[:, d]
        nb += B[:, d] * B[:, d]
    den = np.sqrt(na) * np.sqrt(nb)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den != 0.0, num / den, np.nan)
    return _round6_half_up(out)


def _plane_coeff(i: int, d: int) -> float:
    """Deterministic pseudo-random plane coefficient in [-7.5, 7.5]:
    first md5 hex nibble of 'p{i}:{d}' minus 7.5. Computed driver-side with
    hashlib (bit-identical to the md5 any engine would produce)."""
    import hashlib

    nib = int(hashlib.md5(f"p{i}:{d}".encode()).hexdigest()[0], 16)
    return float(nib) - 7.5


def _hyperplane_signature(
    df: DataFrame, id_col: str, vec_col: str, num_planes: int, dim: int | None = None
) -> DataFrame:
    """Random-hyperplane sign bits with deterministic pseudo-random planes.

    The plane matrix (num_planes × dim) is tiny and row-independent: it is
    built driver-side and shipped inside an Arrow-batched pandas UDF whose
    body is one numpy matmul per batch — BLAS-grade throughput, ~100×
    faster than evaluating num_planes interpreted higher-order-function
    dot products per row. This is the sanctioned Python path: built-in
    expressions cannot express a batched matmul. Signatures only generate
    candidates; exactness comes from the cosine verify stage.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    if dim is None:
        from vector_io_spark.functions.vectors import vector_dim

        dim = vector_dim(df, vec_col)
    planes = np.array(
        [[_plane_coeff(i, d + 1) for d in range(dim)] for i in range(num_planes)]
    )  # (num_planes, dim); closure-captured, pickled with the UDF (small)
    planes_t = planes.T.copy()  # (dim, num_planes), row-contiguous per dim

    def _sig_batch(vs):
        mat = np.vstack(vs.to_numpy()).astype(np.float64)  # (batch, dim)
        # dimension-SEQUENTIAL accumulation (round 5): bit-identical to
        # the left-to-right double dot any SQL engine computes, so the
        # sign bits — and therefore band keys and candidate sets — are
        # engine-exact and SQL-replicable. A BLAS matmul's accumulation
        # order is unspecified and can flip a sign when |dot| ~ ulp.
        acc = np.zeros((mat.shape[0], planes_t.shape[1]))
        for d in range(mat.shape[1]):
            acc += mat[:, d, None] * planes_t[None, d, :]
        bits = (acc > 0).astype("int32")
        return pd.Series(list(bits))

    # explicit wrapper form: postponed-evaluation annotations (PEP 563)
    # break pandas_udf's type-hint inference
    sig_udf = pandas_udf(_sig_batch, ArrayType(IntegerType()))
    return df.select(F.col(id_col), sig_udf(F.col(vec_col)).alias("sig"))


def _signature_band_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_planes: int,
    bands: int,
    max_bucket_size: int | str | None = "auto",
) -> DataFrame:
    sig_df = sig_df.persist()  # feeds both sides of the self-join
    sig_df.count()  # eager fill: the self-join's concurrent map stages
    # would otherwise each compute the (pandas-UDF) signature subtree
    rows = num_planes // bands
    band_arr = F.array(
        *[
            F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))
            for b in range(bands)
        ]
    )
    banded = sig_df.select(id_col, F.posexplode(band_arr).alias("band_id", "band_key"))
    banded = _cap_buckets(banded, max_bucket_size)
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return _materialize_release(pairs, sig_df)


# --------------------------------------------------------------------------
# survivor selection: connected components over dup pairs
# --------------------------------------------------------------------------

#: Pair-count ceiling for the driver-local CC fast path (see
#: :func:`connected_components`). 2M edges is ~32 MB of int64 driver
#: state — the same bounded-driver-state budget as the ANN trainers'
#: max_train_rows collects. Env-overridable; 0 disables the fast path.
CC_COLLECT_MAX = 2_000_000


def _cc_driver_labels(
    pairs: DataFrame, id_a: str, id_b: str, collect_max: int
) -> DataFrame | None:
    """Driver-local connected components for BOUNDED pair graphs, or
    None when the graph exceeds ``collect_max`` pairs (caller falls
    back to the distributed kernels).

    Near-dup pair graphs are |duplicates|-sized, not corpus-sized: at
    sf10 the whole survivor chain's graph is ~500k pairs, and every
    pytest graph is tiny — while ONE round of the distributed loop
    costs several jobs of fixed scheduling latency (measured r12:
    56-110 s for a 20-edge star at local[32]). So, exactly like the
    bounded-sample driver k-means the ANN family uses, graphs under a
    hard cap are solved driver-side: one size-capped collect (limit
    collect_max+1 — a single pass, no separate count job), then
    vectorized numpy min-label pointer jumping (O(E) per round, ~log
    diameter rounds, all ufunc — no Python loop over edges). Labeling
    is IDENTICAL to the distributed kernels: component = min id
    reachable (pinned by tests/test_dedup_graph.py on every shape,
    including the distributed kernels via collect_max=0).

    Numeric id columns only (pandas round-trips them exactly; the
    sorted-unique index order equals Spark's numeric ordering) — other
    types go distributed. NULL ids would surface as a loud astype
    failure, not a silent wrong answer (dup-pair frames never carry
    nulls)."""
    import numpy as np

    numeric = {"tinyint", "smallint", "int", "bigint"}
    dtypes = dict(pairs.dtypes)
    if (
        dtypes.get(id_a) not in numeric
        or dtypes.get(id_b) not in numeric
        or dtypes[id_a] != dtypes[id_b]  # union coercion differs
    ):
        return None
    spark = pairs.sparkSession
    # Arrow collect when available (runtime-settable; best effort) —
    # RESTORED afterwards: a query path must not leave session-global
    # conf drift behind (VERDICT r12 What's-wrong #4; pinned by
    # tests/test_dedup_graph.py::test_cc_driver_path_restores_arrow_conf)
    _ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"
    try:
        arrow_prev = spark.conf.get(_ARROW_KEY, None)
    except Exception:
        arrow_prev = None
    try:
        spark.conf.set(_ARROW_KEY, "true")
    except Exception:
        pass
    try:
        pdf = (
            pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
            .limit(collect_max + 1)
            .toPandas()
        )
        if len(pdf) > collect_max:
            # over budget: the distributed loop recomputes pairs
            return None
        a = pdf["a"].to_numpy()
        b = pdf["b"].to_numpy()
        ids, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
        if len(ids) == 0:
            out_schema = (
                f"id {dtypes[id_a]}, component {dtypes[id_a]}"
            )
            return spark.createDataFrame([], out_schema)
        ea = inv  # both directions: (a->b) and (b->a)
        eb = np.concatenate([inv[len(a):], inv[: len(a)]])
        lab = np.arange(len(ids), dtype=np.int64)
        # min-label propagation + path halving, vectorized; ids are
        # sorted ascending so index order == id order and min-index ==
        # min-id
        for _ in range(200):  # fixpoint certain in O(log^2 n) rounds
            prev = lab.copy()
            np.minimum.at(lab, ea, lab[eb])
            lab = np.minimum(lab, lab[lab])
            lab = np.minimum(lab, lab[lab])
            if np.array_equal(lab, prev):
                break
        import pandas as pd

        out = pd.DataFrame({"id": ids, "component": ids[lab]})
        # createDataFrame(pandas) is inside the try: it uses the same
        # Arrow conf the collect does
        return spark.createDataFrame(
            out, schema=f"id {dtypes[id_a]}, component {dtypes[id_a]}"
        )
    finally:
        try:
            if arrow_prev is None:
                spark.conf.unset(_ARROW_KEY)
            else:
                spark.conf.set(_ARROW_KEY, arrow_prev)
        except Exception:
            pass


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "pointer_jump",
    collect_max: int | None = None,
) -> DataFrame:
    """Connected components over a duplicate-pair graph: returns
    (id, component) where component = the smallest id reachable from id.
    Combined with a keep-min policy this turns near-dup PAIRS into the
    survivor/victim partition a dedup pipeline actually applies.

    Algorithm: min-label propagation with POINTER JUMPING. Each round
    does (a) neighbor-min: every node takes the min of its own and its
    neighbors' labels — one shuffle on node id; then (b) pointer jump:
    every node replaces its label with its label's label
    (``component := component[component]``, a self-join of the label
    frame) — the path-halving step of the classic large-star/small-star
    /Shiloach-Vishkin family. Propagation alone needs O(diameter) rounds
    (a 1M-long duplicate chain — overlapping shard exports — would need
    1M rounds); with jumping, label paths halve every round, so
    convergence is O(log diameter) — ~20 rounds covers a million-link
    chain. At 100 TB each round shuffles |nodes in pairs| rows, which is
    ~|duplicates|, far smaller than the corpus.

    The loop checks convergence with a count of changed labels. If
    ``max_iter`` rounds pass with labels still changing (only possible
    for diameter > 2^max_iter), the function RAISES rather than silently
    returning a partially-merged labeling that would keep several
    "survivors" from one duplicate cluster. EVERY round the label
    frame's lineage is truncated (localCheckpoint): each round's plan
    references the previous label frame 3-4 times (neighbor-min join,
    jump self-join, convergence diff), so an un-truncated plan fans out
    ~4x per round and Catalyst analysis plus the execution-start plan
    stringification go exponential — the r11 two_phase kernel measured
    2.8 s -> 65.7 s/round by round 4 on a 40-edge graph, and the r12
    A/B test's dense-random case drove the old every-5th-round cadence
    past 25 MINUTES of driver CPU inside one localCheckpoint. The label
    frame is node-sized and already materialized each round by the
    convergence count, so per-round truncation adds only the cached
    copy and keeps every plan one round deep.

    ``algorithm`` selects the iteration kernel (r12 A/B, VERDICT r11
    Next #3): ``"pointer_jump"`` is the loop above; ``"two_phase"`` is
    alternating large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond" — public literature), which
    rewrites the EDGE set toward a star forest in O(log n) alternations
    instead of shuffling a full-width label frame every round. Both
    return identical (id, component) labelings (pinned by
    tests/test_dedup_graph.py on chains, stars, and random graphs).

    ``collect_max`` (r12): graphs of at most this many pairs solve
    DRIVER-SIDE instead (:func:`_cc_driver_labels` — bounded collect +
    vectorized numpy pointer jumping), skipping the per-round
    distributed job latency entirely; larger graphs, non-numeric or
    mismatched id types fall through to the distributed kernel chosen
    by ``algorithm``. Default from ``$SPARK_GRAFT_CC_COLLECT_MAX``
    (else 2M pairs ≈ 32 MB driver state — the bounded-driver-state
    budget the ANN trainers already use); pass 0 to force distributed.
    The labeling contract (component = min reachable id) is identical
    on every path.
    """
    if algorithm not in ("pointer_jump", "two_phase"):
        raise ValueError(
            f"connected_components: unknown algorithm {algorithm!r} — "
            "expected 'pointer_jump' or 'two_phase'"
        )
    if collect_max is None:
        import os as _os

        collect_max = int(
            _os.environ.get("SPARK_GRAFT_CC_COLLECT_MAX", CC_COLLECT_MAX)
        )
    if collect_max and collect_max > 0:
        driver_labels = _cc_driver_labels(pairs, id_a, id_b, collect_max)
        if driver_labels is not None:
            return driver_labels
    if algorithm == "two_phase":
        return _cc_two_phase(pairs, id_a, id_b, max_iter)
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    changed = 0
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
            ).alias("component"),
        )
        # pointer jump: component := component's component. Labels are
        # always ids of existing nodes (mins over node ids), so the
        # self-join matches every row; left-join + coalesce guards the
        # degenerate self-pointer case anyway.
        jump_to = propagated.select(
            F.col("id").alias("__jid"), F.col("component").alias("__jcomp")
        )
        new_labels = (
            propagated.join(
                jump_to, propagated.component == jump_to.__jid, "left"
            )
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__jcomp"), F.col("component")),
                ).alias("component"),
            )
        )
        # truncate lineage EVERY round (see docstring: the 3-4x
        # per-round plan fan-out is exponential without this, and the
        # frame is node-sized and materialized anyway)
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); a duplicate component's "
            f"diameter exceeds max_iter — raise max_iter"
        )
    edges.unpersist()
    return labels


def _cc_two_phase(
    pairs: DataFrame, id_a: str, id_b: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
    public literature; the reference engine has no graph ops, so no
    parity citation applies).

    Unlike pointer jumping, the iteration rewrites the EDGE set itself
    toward a star forest — no label frame is shuffled per round:

    - **large-star**: every node u links each strictly-larger neighbor
      to ``m(u) = min(N(u) ∪ {u})`` — one symmetric groupBy(node).min
      plus one join of the canonical edges back to those mins.
    - **small-star**: with edges oriented (big → small), every node u
      links itself and each smaller neighbor to their collective min.

    At the fixpoint every edge is (node, component-min); the labeling
    reads straight off the final edges. Convergence is O(log²n) proven,
    ~log n alternations in practice; each alternation shuffles only the
    current edge set (≈|duplicate pairs|, shrinking), never a full-width
    stable-label frame — the A/B this round exists to measure.

    Scale shape: per alternation ~4 hash shuffles of the edge frame +
    distincts; driver sees only convergence counters; lineage truncated
    by localCheckpoint every 4 alternations.
    """
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .persist()
    )
    converged = False
    for it in range(max_iter):
        # large-star: for canonical (u,v) [u>v], u is the one
        # strictly-larger neighbor v contributes — emit (u, m(v)) where
        # m(v) = min over v's full (symmetric) neighborhood and itself
        sym = e.select(
            F.col("u").alias("x"), F.col("v").alias("y")
        ).unionAll(e.select(F.col("v").alias("x"), F.col("u").alias("y")))
        mins = (
            sym.groupBy("x")
            .agg(F.min("y").alias("mn"))
            .select("x", F.least("x", "mn").alias("m"))
        )
        ls = (
            e.join(mins, e.v == mins.x)
            .select(F.col("u").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"),
                F.least("a", "b").alias("v"),
            )
            .distinct()
        )
        # small-star: group the (big → small) edges by the big end; m =
        # min of its smaller neighbors; link u and every non-min smaller
        # neighbor to m. All outputs already satisfy u > v.
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            mins2.select(F.col("u"), F.col("m").alias("v"))
            .unionAll(
                ls.join(mins2, "u")
                .where(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            .distinct()
        )
        # localCheckpoint EVERY round, not every k: the edge frame feeds
        # the next round's plan in three places (sym twice, the join
        # once) plus the fixpoint check, so an un-truncated logical plan
        # fans out ~3× per round — Catalyst analysis goes exponential by
        # round ~4 (measured: 2.8 s -> 65.7 s per round on a 40-edge
        # graph). Checkpointing resets the plan to a leaf; the
        # materialized frame is ≈|duplicate pairs|, and the loop is
        # O(log n) rounds, so the storage cost is bounded.
        new_e = ss.localCheckpoint(eager=True)
        # fixpoint test: both frames are distinct sets, so equal counts
        # + empty one-sided difference ⇒ identical edge sets
        if new_e.count() == e.count() and new_e.subtract(e).isEmpty():
            e.unpersist()
            e = new_e
            converged = True
            break
        e.unpersist()
        e = new_e
    if not converged:
        e.unpersist()
        raise RuntimeError(
            f"connected_components(two_phase) did not converge in "
            f"{max_iter} alternations — raise max_iter"
        )
    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .union(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )
    star = e.groupBy(F.col("u").alias("id")).agg(
        F.min("v").alias("__root")
    )
    labels = (
        nodes.join(star, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("__root"), F.col("id")).alias("component"),
        )
        .persist()
    )
    labels.count()
    e.unpersist()
    return labels


def dedup_survivors(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Apply near-dup pairs to a corpus: keep exactly one row (the min id)
    per duplicate component plus every row not in any pair. The anti-join
    removes victims; the corpus side is never shuffled beyond that."""
    comps = connected_components(pairs)
    victims = comps.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(victims, id_col, "left_anti")


def write_signature_index(
    df: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> None:
    """Persist the corpus MinHash signatures as a parquet 'signature
    index' for :func:`minhash_lsh_incremental_pairs` — pay the
    signature scan once, then every ingest reads (id, minhash) instead
    of re-hashing resident text. Append new batches' signatures with
    mode('append') after each ingest so the index stays current."""
    minhash_signatures(df, id_col, text_col, num_hashes, shingle_k).write.mode(
        "overwrite"
    ).parquet(path)


def write_embedding_signature_index(
    df: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    num_planes: int = 128,
) -> None:
    """Persist the corpus's hyperplane sign signatures as a parquet
    'signature index' for :func:`embedding_cosine_incremental_pairs` —
    the embedding-side mirror of :func:`write_signature_index`: pay the
    signature matmul once, then every ingest reads (id, sig) instead of
    re-signing resident vectors. Append new batches' signatures after
    each ingest so the index stays current. Zero/NULL vectors are
    excluded exactly as the pair pass excludes them."""
    nonzero = df.where(
        F.col(vec_col).isNotNull()
        & F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))
    )
    _hyperplane_signature(nonzero, id_col, vec_col, num_planes).write.mode(
        "overwrite"
    ).parquet(path)


def embedding_cosine_incremental_pairs(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    num_planes: int = 128,
    bands: int = 8,
    max_bucket_size: int | str | None = "auto",
    old_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental embedding near-dup detection — the daily-ingest shape
    for the VECTOR side: every cosine>=threshold pair INVOLVING the new
    batch (new-vs-old and new-vs-new), without ever re-joining the
    resident corpus against itself. The (small) new batch's hyperplane
    band keys probe the union's banded signatures, so per ingest the
    work is O(|new| x bucket occupancy), never O(|corpus|²) — the same
    asymmetry as :func:`minhash_lsh_incremental_pairs`, with the same
    hot-bucket guard semantics. Pass ``old_sigs`` (from
    :func:`write_embedding_signature_index`) to skip re-signing the
    resident side; candidate verification re-reads only the candidate
    ids' vectors (hash joins on id — the corpus vector table never
    self-joins).

    Returns (id_a, id_b, cos_sim), id_a < id_b, at least one side in
    ``new``. The pair set is EXACTLY the symmetric
    :func:`dedup_embedding_cosine` ('lsh')'s pairs restricted to
    new-involving ones (pytest-pinned) at EVERY ``max_bucket_size``
    including the default — under ``"auto"`` the cap is derived once
    from the union-side banding (the stats the symmetric auto guard
    sees) and applied to both sides (round-5 fix). Like the symmetric
    path it is candidate-generation approximate (banding recall < 1),
    scores exact.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _nonzero(df: DataFrame) -> DataFrame:
        return df.where(
            F.col(vec_col).isNotNull()
            & F.exists(F.col(vec_col), lambda x: x != F.lit(0.0))
        )

    if old_sigs is not None:
        sigs_old = old_sigs
    else:
        sigs_old = _hyperplane_signature(
            _nonzero(old), id_col, vec_col, num_planes
        )
    sigs_new = _hyperplane_signature(_nonzero(new), id_col, vec_col, num_planes)
    sigs_all = sigs_old.unionByName(sigs_new).persist()
    sigs_new_only = sigs_new.persist()
    sigs_all.count()
    sigs_new_only.count()

    rows = num_planes // bands
    band_arr = F.array(
        *[
            F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))
            for b in range(bands)
        ]
    )

    def banded_raw(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            id_col, F.posexplode(band_arr).alias("band_id", "band_key")
        )

    if max_bucket_size == "auto":
        # one cap from the union-side banding, shared by both sides —
        # keeps the restriction-equality contract at the default (see
        # minhash_lsh_incremental_pairs)
        max_bucket_size = _auto_bucket_cap(banded_raw(sigs_all))
    probe = _cap_buckets(banded_raw(sigs_new_only), max_bucket_size).alias("l")
    index = _cap_buckets(banded_raw(sigs_all), max_bucket_size).alias("r")
    lo = F.least(F.col(f"l.{id_col}"), F.col(f"r.{id_col}"))
    hi = F.greatest(F.col(f"l.{id_col}"), F.col(f"r.{id_col}"))
    cand = (
        probe.join(
            index,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")),
        )
        .select(lo.alias("id_a"), hi.alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = _materialize_release(cand, sigs_all, sigs_new_only)
    vecs = old.select(id_col, vec_col).unionByName(new.select(id_col, vec_col))
    pairs = (
        cand.join(vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col)), "id_a")
        .withColumnRenamed(vec_col, "__va")
        .join(vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col)), "id_b")
        .withColumnRenamed(vec_col, "__vb")
    )

    def _cos_batch(va, vb):
        A = np.vstack(va.to_numpy()).astype(np.float64)
        B = np.vstack(vb.to_numpy()).astype(np.float64)
        return pd.Series(_seq_cosine_rows(A, B))

    cos_udf = pandas_udf(_cos_batch, DoubleType())
    return (
        pairs.withColumn("cos_sim", cos_udf(F.col("__va"), F.col("__vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def incremental_components(
    comp_old: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Incremental connected-components maintenance for the ingest path:
    given the resident clustering ``comp_old`` (id, component — as
    produced by :func:`connected_components`, so a component id is the
    MIN member id) and the new batch's near-dup pairs (every pair
    involves >= 1 new doc, e.g. from
    :func:`minhash_lsh_incremental_pairs`), produce the updated cluster
    assignment for every TOUCHED node without re-running components over
    the resident pair graph.

    The trick is supernode contraction: each old endpoint is replaced by
    its component id (one broadcast-able mapping join against the small
    changed slice), and components run on the contracted graph only —
    whose size is O(|new pairs|), independent of the resident corpus.
    Because an old component id IS the min id of its members, the min
    label the contracted run converges to equals exactly what a full
    recompute over old ∪ new pairs would assign (pytest-pinned),
    including the case where one new doc MERGES two old clusters.

    Returns (id, component) for: every new doc appearing in
    ``new_pairs`` and every OLD COMPONENT id whose cluster was touched
    (rows where id is an old component id — apply them as
    ``comp_old.join(updates, comp_old.component == updates.id)`` to
    relabel resident members). Untouched old components need no
    rewrite — that locality is the point.
    """
    old_map = comp_old.select(
        F.col(comp_old.columns[0]).alias("__oid"),
        F.col(comp_old.columns[1]).alias("__ocomp"),
    )
    a = (
        new_pairs.select(F.col(id_a).alias("__x"), F.col(id_b).alias("__y"))
    )
    # contract each endpoint through the old mapping where it exists
    left = a.join(old_map, a["__x"] == old_map["__oid"], "left").select(
        F.coalesce("__ocomp", "__x").alias(id_a), "__y"
    )
    both = left.join(old_map, left["__y"] == old_map["__oid"], "left").select(
        id_a, F.coalesce("__ocomp", "__y").alias(id_b)
    )
    # truncate lineage before the iterative run: the contracted edge
    # set is tiny (O(|new pairs|)) but its plan embeds comp_old's own
    # iterative lineage — without materializing, every CC round would
    # re-execute that whole history (the same per-round checkpoint
    # hygiene as pagerank)
    both = both.localCheckpoint(eager=True)
    return connected_components(both, id_a, id_b, max_iter=max_iter)
