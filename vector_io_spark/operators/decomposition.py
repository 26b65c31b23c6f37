"""Distributed second-moment statistics and PCA / whitening projection.

Reference behavior contract: the reference engine exposes dense-vector
re-embedding and quantization but no decomposition; this module is part
of the training-data-pipeline extension surface (dimensionality
reduction before ANN indexing / clustering, covariance drift checks).

Scale shape (the only one that works at 100 TB):

- The SUFFICIENT STATISTICS (n, Σx, Σxxᵀ) are computed distributed in a
  single pass — ``mapInPandas`` emits one partial-moment row per Arrow
  batch (a few thousand rows total no matter the corpus size), and the
  partials collapse via one tiny shuffle of (index, value) pairs.
  The corpus itself is never collected, never shuffled, read once.
- The d×d covariance (4096 doubles at d=64) and its eigendecomposition
  live on the DRIVER — O(d²)/O(d³) work that no cluster should shard.
- The projection back over the corpus is a shuffle-free Arrow-batched
  matmul against the closure-broadcast (d×k) component matrix.

Exactness: ``covariance_pairs`` quantizes values to fixed-point BIGINTs
(``scale`` decimal digits) so every cross-row sum is an INTEGER —
order-independent, bit-identical in any engine — and only the final
normalization divides in doubles. Overflow guard: |v|·10^scale must stay
under ~3·10⁹ per element for the worst-case 2⁶³ bound at 10¹² rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 4,
    ddof: int = 0,
) -> DataFrame:
    """Upper-triangle covariance entries ``(i, j, cov)`` (1-based, i<=j)
    of a vector column, exact in fixed point.

    Each value is quantized to ``round(v * 10^scale)`` (BIGINT); the
    moment sums are integer-exact, so the result is deterministic and
    engine-portable. One explode pass (i), one conditional self-zip via
    the original array (j >= i), one groupBy — shuffle volume is
    |rows|·d(d+1)/2 small (i, j, prod) tuples partial-aggregated
    map-side before the exchange.
    """
    q = F.transform(
        F.col(vec_col),
        lambda v: F.round(v.cast("double") * (10 ** scale)).cast("long"),
    )
    d = df.where(F.col(vec_col).isNotNull()).select(q.alias("__q"))
    # posexplode i, then pair with the j >= i suffix of the same array:
    # emits the upper triangle only (d(d+1)/2 per row, not d²)
    ex = d.select(
        F.posexplode("__q").alias("__i0", "__vi"), F.col("__q")
    ).select(
        (F.col("__i0") + 1).alias("i"),
        "__vi",
        F.posexplode(F.slice(F.col("__q"), F.col("__i0") + 1, F.size("__q"))).alias(
            "__j0", "__vj"
        ),
    )
    sums = (
        ex.select(
            "i",
            (F.col("i") + F.col("__j0")).alias("j"),
            F.col("__vi"),
            F.col("__vj"),
            (F.col("__vi") * F.col("__vj")).alias("__pp"),
        )
        .groupBy("i", "j")
        .agg(
            F.count("*").alias("__n"),
            F.sum("__vi").alias("__si"),
            F.sum("__vj").alias("__sj"),
            F.sum("__pp").alias("__spp"),
        )
    )
    denom = F.col("__n") - F.lit(ddof)
    unit = float(10 ** scale) ** 2
    return sums.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.round(
            (
                F.col("__spp").cast("double")
                - F.col("__si").cast("double")
                * F.col("__sj").cast("double")
                / F.col("__n")
            )
            / denom
            / F.lit(unit),
            8,
        ).alias("cov"),
    )


def covariance_pairs_sql(table: str, vec_col: str, scale: int = 4, ddof: int = 0) -> str:
    """DuckDB oracle for :func:`covariance_pairs` — identical fixed-point
    integer sums, identical final normalization."""
    unit = float(10 ** scale) ** 2
    return f"""
    WITH q AS (
        SELECT list_transform({vec_col},
                   v -> CAST(round(CAST(v AS DOUBLE) * {10 ** scale})
                             AS BIGINT)) AS qv
        FROM {table} WHERE {vec_col} IS NOT NULL
    ),
    ex AS (
        SELECT i.i AS i, j.j AS j, qv[i.i] AS vi, qv[j.j] AS vj
        FROM q,
             LATERAL (SELECT unnest(range(1, len(qv) + 1)) AS i) i,
             LATERAL (SELECT unnest(range(i.i, len(qv) + 1)) AS j) j
    )
    SELECT i, j,
           round((CAST(sum(vi * vj) AS DOUBLE)
                  - CAST(sum(vi) AS DOUBLE) * CAST(sum(vj) AS DOUBLE)
                    / count(*))
                 / (count(*) - {ddof}) / {unit}, 8) AS cov
    FROM ex GROUP BY i, j
    """


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    scale: int = 4,
):
    """Fit a PCA model from the DISTRIBUTED covariance — the driver only
    ever sees the d(d+1)/2 aggregated covariance entries (collect is
    O(d²), corpus-size independent) plus the d-vector mean.

    Returns ``(mean, components, eigvals)`` numpy arrays; ``components``
    is (d, k), columns = top-k eigenvectors, deterministic sign (largest
    |entry| made positive, ties broken toward the lower index).
    """
    import numpy as np

    rows = covariance_pairs(df, vec_col, scale=scale).collect()
    d = max(r["j"] for r in rows)
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    mean_row = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.posexplode(F.col(vec_col)).alias("__i", "__v")
        )
        .groupBy("__i")
        .agg(F.avg(F.col("__v").cast("double")).alias("m"))
        .collect()
    )
    mean = np.zeros(d)
    for r in mean_row:
        mean[r["__i"]] = r["m"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    vals = vals[order]
    # deterministic sign: flip so the largest-|v| entry is positive
    for c in range(comps.shape[1]):
        col = comps[:, c]
        pivot = int(np.argmax(np.abs(col)))
        if col[pivot] < 0:
            comps[:, c] = -col
    return mean, comps, vals


def pca_project(
    df: DataFrame,
    mean,
    components,
    eigvals=None,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project vectors onto the fitted components (optionally whitened:
    each component divided by sqrt(eigval + eps), unit output variance).
    Shuffle-free Arrow-batched matmul against the closure-broadcast
    (d, k) matrix — the only per-row cost is one BLAS GEMM per batch.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    proj = np.asarray(components, dtype=np.float64)
    if whiten:
        scale_vec = 1.0 / np.sqrt(np.asarray(eigvals, dtype=np.float64) + eps)
        proj = proj * scale_vec[None, :]
    mu = np.asarray(mean, dtype=np.float64)

    def _proj(vs):
        mat = np.vstack(vs.to_numpy()).astype(np.float64)
        out = (mat - mu) @ proj
        return pd.Series(list(np.round(out, 6)))

    udf = pandas_udf(_proj, ArrayType(DoubleType()))
    return df.withColumn(out_col, udf(F.col(vec_col)))


def label_separation(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 4,
    dist_scale: int = 6,
) -> DataFrame:
    """Per-class embedding-space diagnostics: how tight is each class and
    how far is its nearest neighbor class — the fast centroid-based
    proxy for silhouette analysis (true silhouette is all-pairs; this is
    one corpus pass + a |labels|² driver-free comparison).

    Per label: n, mean intra-class distance-to-own-centroid, distance to
    the NEAREST other centroid, and their ratio (Davies-Bouldin-style —
    lower = better separated).

    Exactness: centroids come from fixed-point integer sums (exact at
    any parallelism, rounded to 8 dp); per-point distances are
    sequential-double row arithmetic quantized to 10^-dist_scale before
    the per-label mean. Centroid table is |labels| rows — broadcast;
    the corpus shuffles once (per-label partial sums).
    """
    q = F.transform(
        F.col(vec_col),
        lambda v: F.round(v.cast("double") * (10 ** scale)).cast("long"),
    )
    d = df.where(F.col(vec_col).isNotNull()).select(
        F.col(label_col).alias("label"), q.alias("__q")
    )
    sums = (
        d.select("label", F.posexplode("__q").alias("__i", "__v"))
        .groupBy("label", "__i")
        .agg(F.sum("__v").alias("__s"), F.count("*").alias("__n"))
    )
    unit = float(10 ** scale)
    cent = (
        sums.withColumn(
            "__c", F.round(F.col("__s") / F.col("__n") / unit, 8)
        )
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("__i", "__c"))).alias("__e"),
            F.first("__n").alias("n"),
        )
        .select(
            "label",
            "n",
            F.transform("__e", lambda e: e["__c"]).alias("centroid"),
        )
    )
    # point -> every centroid distance; own vs nearest-other
    pts = df.where(F.col(vec_col).isNotNull()).select(
        F.col(label_col).alias("__pl"), F.col(vec_col).alias("__pv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__pv"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dunit = float(10 ** dist_scale)
    scored = (
        pts.crossJoin(F.broadcast(cent.select("label", "centroid")))
        .select(
            "__pl",
            "label",
            F.round(F.sqrt(d2) * dunit).cast("long").alias("__d"),
        )
    )
    intra = (
        scored.where(F.col("__pl") == F.col("label"))
        .groupBy(F.col("__pl").alias("label"))
        .agg(
            F.round(F.sum("__d") / F.count("*") / dunit, 4).alias(
                "mean_intra_dist"
            )
        )
    )
    # centroid-to-centroid distances (|labels|² rows — trivial)
    ca = cent.select(F.col("label").alias("__la"), F.col("centroid").alias("__ca"))
    cb = cent.select(F.col("label").alias("__lb"), F.col("centroid").alias("__cb"))
    cd = F.aggregate(
        F.zip_with(F.col("__ca"), F.col("__cb"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    inter = (
        ca.crossJoin(cb)
        .where(F.col("__la") != F.col("__lb"))
        .select("__la", F.round(F.sqrt(cd), 4).alias("__cd"))
        .groupBy(F.col("__la").alias("label"))
        .agg(F.min("__cd").alias("nearest_other_centroid_dist"))
    )
    return (
        cent.select("label", "n")
        .join(intra, "label")
        .join(inter, "label")
        .select(
            "label",
            "n",
            "mean_intra_dist",
            "nearest_other_centroid_dist",
            F.round(
                F.col("mean_intra_dist")
                / F.col("nearest_other_centroid_dist"),
                4,
            ).alias("db_ratio"),
        )
    )
