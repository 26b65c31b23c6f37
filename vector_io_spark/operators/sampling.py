"""Deterministic sampling operators for training-data mixes.

A 100 TB pre-training pipeline spends much of its life building *data
mixes*: downsample over-represented sources, upsample scarce high-quality
ones, and do both reproducibly so a re-run (or a resumed run) selects the
same rows. Spark's ``df.sample`` is seeded per-partition, so its output
changes whenever partitioning changes — useless for reproducible mixes.

These operators derive the keep/copy decision from ``md5(key || seed)``
instead: the decision is a pure per-row function of the row's key, stable
under repartitioning, AQE re-planning, task retries and cluster size, and
reproducible bit-for-bit by any engine with md5 (the DuckDB oracle
verifies exactly that).

Scale notes: all three operators are narrow per-row transforms — no
shuffle, no driver state, no sketch. They run inside whole-stage codegen
at scan speed, and compose with scan-time column pruning (the md5 only
reads the key column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO_32 = float(2**32)


def hash_uniform_hex(key: Column, seed: str) -> Column:
    """First 8 hex chars of ``md5(key || '|' || seed)`` — a uniform draw
    over [0, 2^32) encoded as fixed-width lowercase hex.

    Fixed-width hex orders lexicographically exactly as its numeric value,
    so fraction thresholds can be compared as string literals — no base
    conversion, and the whole predicate stays inside codegen.
    """
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit("|" + seed))), 1, 8
    )


def hash_uniform(key: Column, seed: str) -> Column:
    """The same draw as :func:`hash_uniform_hex`, as a double in [0, 1).

    Exact in both engines: the 32-bit integer is exactly representable in
    a double, and dividing by 2^32 is a power-of-two scale (no rounding).
    """
    return F.conv(hash_uniform_hex(key, seed), 16, 10).cast("double") / F.lit(
        _TWO_32
    )


def _threshold_hex(fraction: float) -> str | None:
    """fraction -> 8-hex keep-threshold; None means "keep everything"."""
    if fraction >= 1.0:
        return None
    return format(max(int(fraction * 2**32), 0), "08x")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep a row iff its key's uniform draw falls below ``fraction``.

    Unlike ``df.sample``, membership depends only on (key, seed): stable
    across partitioning, retries, and engines.
    """
    thr = _threshold_hex(fraction)
    if thr is None:
        return df
    return df.where(hash_uniform_hex(F.col(key_col), seed) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "strata",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mix primitive
    (e.g. ``{"en": 0.3, "de": 1.0}`` keeps 30% of English, all German).

    The fractions map is a driver-side literal compiled into one CASE
    expression; strata absent from the map get ``default_fraction``.
    A narrow filter: no shuffle, no join, codegen'd.
    """
    u = hash_uniform_hex(F.col(key_col), seed)

    def keep(fraction: float) -> Column:
        thr = _threshold_hex(fraction)
        return F.lit(True) if thr is None else (u < F.lit(thr))

    cond: Column | None = None
    for stratum, fraction in fractions.items():
        branch = F.col(strata_col) == F.lit(stratum)
        cond = (
            F.when(branch, keep(fraction))
            if cond is None
            else cond.when(branch, keep(fraction))
        )
    default = keep(default_fraction)
    cond = default if cond is None else cond.otherwise(default)
    return df.where(cond)


def upsample_by_weight(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    seed: str = "upsample",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Materialize a weighted mix: emit each row ``floor(w)`` times plus
    one more with probability ``frac(w)`` (so E[copies] = w exactly).
    Weights < 1 downsample, > 1 upsample — one operator covers both
    directions of mix adjustment.

    The Bernoulli draw is the deterministic hash uniform, so the
    materialized mix is reproducible row-for-row. Narrow explode, no
    shuffle; output volume is sum(w), decided per-row.
    """
    w = F.col(weight_col).cast("double")
    u = hash_uniform(F.col(key_col), seed)
    copies = (
        F.floor(w).cast("int")
        + F.when(u < (w - F.floor(w)), F.lit(1)).otherwise(F.lit(0))
    )
    seq = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(copy_col, F.explode(seq))


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: the hash uniform is cut
    at the cumulative weights, so each key lands in exactly one split and
    always the same one — across runs, partitionings, and engines.

    Weights must sum to ~1; the final split takes the residual interval
    (so rounding never leaves a row unassigned). Narrow projection, no
    shuffle.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_uniform_hex(F.col(key_col), seed)
    names = list(weights)
    cum = 0.0
    expr: Column | None = None
    for name in names[:-1]:
        cum += weights[name]
        thr = _threshold_hex(min(cum, 1.0))
        branch = F.lit(True) if thr is None else (u < F.lit(thr))
        expr = (
            F.when(branch, F.lit(name))
            if expr is None
            else expr.when(branch, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def leakage_safe_split(
    df: DataFrame,
    key_col: str,
    dup_pairs: DataFrame,
    weights: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: duplicate-pair edges are collapsed to connected components
    and the split hash is taken over the COMPONENT id, so every member
    of a duplicate cluster lands in the same split. Rows in no cluster
    hash on their own key (identical to :func:`assign_split`).

    Why it matters: hash-splitting raw ids puts two near-identical
    documents in train and test with probability ~2·p·(1-p) each — at
    web scale that is millions of leaked eval documents. Splitting on
    the cluster id makes leakage structurally impossible for any pair
    the dedup stage found.

    Scale shape: components are ~|duplicates| (far smaller than the
    corpus); the label frame joins the corpus on the key — AQE
    broadcasts it when small, hash-joins otherwise. No other shuffle is
    added on top of :func:`assign_split`'s zero.
    """
    from vector_io_spark.operators.dedup import connected_components

    comp = connected_components(dup_pairs).withColumnsRenamed(
        {"id": key_col, "component": "__component"}
    )
    keyed = df.join(comp, key_col, "left").withColumn(
        "__gk", F.coalesce(F.col("__component"), F.col(key_col))
    )
    return assign_split(keyed, "__gk", weights, seed=seed, split_col=split_col).drop(
        "__gk", "__component"
    )


def weighted_reservoir_topk(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    group_cols: list[str] | None = None,
    seed: str = "wres",
    key_out: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws u from the md5 hash uniform and ranks
    by ln(u)/w — the top-k per group is a weight-proportional sample,
    reproducible across retries, engines and partitionings (unlike
    ``df.sample``'s partition-seeded RNG).

    One window pass (shuffle on ``group_cols``); no collect, no state.
    The E-S key is rounded to 10 dp so engine log ulp differences can't
    reorder ranks, and ties (astronomically rare with 32-bit uniforms)
    break on the sample key ascending.
    """
    w = F.col(weight_col).cast("double")
    # (h + 0.5) / 2^32 ∈ (0, 1): never 0 (ln(0) = -inf) and engine-exact.
    # The draw is THE module's hash_uniform_hex — one definition, so the
    # samplers and their oracle replicas cannot drift.
    u = (
        F.conv(hash_uniform_hex(F.col(key_col), seed), 16, 10).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    es = F.round(F.log(u) / w, 10)
    part = group_cols or []
    win = (
        Window.partitionBy(*part).orderBy(
            F.col(key_out).desc(), F.col(key_col).asc()
        )
    )
    return (
        df.where(w > 0)
        .withColumn(key_out, es)
        .withColumn("__rk", F.row_number().over(win))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
