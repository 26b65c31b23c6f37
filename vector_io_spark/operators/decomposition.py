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


def _cov_partials_kernel():
    """mapInPandas kernel: per task, integer Gram partials of the
    quantized vectors — n, Σx and Σxxᵀ accumulated PER VECTOR LENGTH
    (a row of length L contributes pair (i, j) iff j <= L, so summing
    per-length partials downstream reproduces the exploded pairing's
    ragged semantics exactly). Emits L·(L+1)/2 rows per (task, length)
    — corpus rows never shuffle."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        acc: dict[int, list] = {}  # L -> [n, s(L), G(L, L)]
        for pdf in batches:
            if not len(pdf):
                continue
            lens = pdf["__q"].map(len).to_numpy()
            for ln in np.unique(lens):
                if ln == 0:
                    continue
                x = np.vstack(
                    pdf["__q"][lens == ln].to_numpy()
                ).astype(np.int64)
                ent = acc.get(int(ln))
                if ent is None:
                    ent = acc[int(ln)] = [
                        0,
                        np.zeros(ln, dtype=np.int64),
                        np.zeros((ln, ln), dtype=np.int64),
                    ]
                ent[0] += len(x)
                ent[1] += x.sum(axis=0)
                ent[2] += x.T @ x
        for ln, (n, s, g) in acc.items():
            iu, ju = np.triu_indices(ln)
            yield pd.DataFrame(
                {
                    "i": iu + 1,
                    "j": ju + 1,
                    "n": n,
                    "sxi": s[iu],
                    "sxj": s[ju],
                    "spp": g[iu, ju],
                }
            )

    return fn


def covariance_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 4,
    ddof: int = 0,
) -> DataFrame:
    """Upper-triangle covariance entries ``(i, j, cov)`` (1-based, i<=j)
    of a vector column, exact in fixed point.

    Each value is quantized to ``round(v * 10^scale)`` (BIGINT, in
    Catalyst — the oracle-shared fixed-point contract); the moment sums
    are integer-exact, so the result is deterministic and
    engine-portable. r12 shape (matching the module docstring's design):
    one ``mapInPandas`` pass computes per-task integer Gram partials in
    numpy — tasks·d(d+1)/2 partial rows reach the combine instead of
    |rows|·d(d+1)/2 exploded (i, j, prod) tuples. The combine and the
    final double normalization are the same Catalyst expressions as the
    exploded formulation (kept as :func:`_covariance_pairs_exploded`,
    equality pinned by pytest), so results are bit-identical.
    """
    q = F.transform(
        F.col(vec_col),
        lambda v: F.round(v.cast("double") * (10 ** scale)).cast("long"),
    )
    d = df.where(F.col(vec_col).isNotNull()).select(q.alias("__q"))
    sums = (
        d.mapInPandas(
            _cov_partials_kernel(),
            schema="i long, j long, n long, sxi long, sxj long, spp long",
        )
        .groupBy("i", "j")
        .agg(
            F.sum("n").alias("__n"),
            F.sum("sxi").alias("__si"),
            F.sum("sxj").alias("__sj"),
            F.sum("spp").alias("__spp"),
        )
    )
    return _cov_normalize(sums, scale, ddof)


def _cov_normalize(sums: DataFrame, scale: int, ddof: int) -> DataFrame:
    """The shared final normalization: integer moment sums -> rounded
    double covariance (identical expression in both formulations)."""
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


def _covariance_pairs_exploded(
    df: DataFrame,
    vec_col: str = "embedding",
    scale: int = 4,
    ddof: int = 0,
) -> DataFrame:
    """Pre-r12 exploded formulation of :func:`covariance_pairs` — the
    SQL oracle's documented shape (covariance_pairs_sql mirrors it CTE
    for CTE), kept as the pytest equivalence reference."""
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
    return _cov_normalize(sums, scale, ddof)


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


# --------------------------------------------------------------------------
# Engine-exact PCA: fixed-point power iteration (round 5)
# --------------------------------------------------------------------------
#
# fit_pca's numpy eigh is float-accumulation-order specific, so queries
# built on it could only ever get rows-only correctness checks. The
# power-iteration path below is the ORACLE-GRADE alternative (the
# pq_exact.py pattern): every intermediate is either an exact integer
# (matvec over the fixed-point covariance — order-independent) or a
# double produced by a FIXED sequence of operations (sequential sums,
# one division, libm sqrt), then re-quantized — so Spark (driver-side
# integer loop over the distributed covariance) and an unrolled-CTE
# DuckDB replay produce bit-identical eigenvectors, eigenvalues, and
# whitened projections. Deterministic md5-derived init; fixed iteration
# count (convergence affects approximation quality, never determinism).
#
# Units: coordinates quantized at 10^scale (q = round(x*1e4), the
# covariance convention); covariance entries at C_SCALE (cov*1e8 ints);
# eigenvector entries at V_SCALE (1e5). Bounds (BIGINT-safe by
# construction, asserted loudly): |w_i| = |Σ_j C v| ≤ d·C·V ≈ 6e14;
# deflation products λ·v_i·v_j ≤ 1e8·1e10 = 1e18 < 2^63.

POWER_V_SCALE = 10 ** 5
POWER_C_SCALE = 10 ** 8


def _power_init(c: int, d: int) -> list[int]:
    """Deterministic init vector for component ``c``: first md5 hex
    nibble of 'pca|{c}|{i}' minus 8, i = 1..d (SQL replica:
    strpos('0123456789abcdef', substr(md5(...), 1, 1)) - 9)."""
    import hashlib

    return [
        int(hashlib.md5(f"pca|{c}|{i}".encode()).hexdigest()[0], 16) - 8
        for i in range(1, d + 1)
    ]


def power_pca_exact_components(
    cov_int: list[list[int]], k: int, iters: int,
    force_python: bool = False,
) -> list[tuple[list[int], int]]:
    """Top-k (eigenvector, eigenvalue) pairs by fixed-point power
    iteration with deflation on an integer covariance matrix (entries
    in ``POWER_C_SCALE`` units). Integer/double arithmetic whose every
    step is SQL-replayable (see module comment). Returns ``[(v, lam)]``
    with v entries in ``POWER_V_SCALE`` units and lam in
    ``POWER_C_SCALE`` units. Raises on a non-positive eigenvalue (the
    whitening divide needs lam > 0) or a bound overflow — loudly, never
    silently wrong.

    The O(d²) steps (matvec, deflation outer product) run as int64
    numpy whenever the BIGINT-safe bound provably holds for every
    intermediate (round 6 — pytest-pinned bit-equal to the pure-python
    loop; makes d=1024 practical, see BASELINE.md). Integer matmul in
    numpy is exact; the elementwise float steps (÷norm, ×scale,
    floor(+0.5)) are scalar-IEEE-identical to the python loop. The
    scalar double accumulations (norm, rayleigh numerator) STAY
    sequential python loops — their left-to-right order is the
    engine-exactness contract. ``force_python=True`` pins the
    reference path (used by the equality test)."""
    import math

    np = None
    if not force_python:
        try:
            import numpy as np
        except ImportError:  # pragma: no cover - numpy is baked in
            np = None

    d = len(cov_int)
    if np is not None:
        C = np.array(cov_int, dtype=np.int64)
    else:
        C = [row[:] for row in cov_int]
    out: list[tuple[list[int], int]] = []
    for c in range(k):
        v = _power_init(c, d)
        # C only changes at deflation (between components) — hoist its
        # bound out of the iteration loop (an O(d²) scan per step at
        # d=1024 would rival the matvec itself)
        max_c = int(np.abs(C).max()) if np is not None else 0
        for _ in range(iters + 1):  # last pass computes w for lambda
            if np is not None:
                max_v = max(abs(x) for x in v)
                if d * max_c * max_v < 2 ** 62:
                    # every partial sum bounded by Σ|terms| ≤ d·C·V
                    w = [
                        int(x)
                        for x in C @ np.array(v, dtype=np.int64)
                    ]
                else:
                    # can't prove int64 safety — exact big-int fallback
                    # (the post-hoc guard below keeps raise semantics)
                    w = [
                        sum(int(C[i][j]) * v[j] for j in range(d))
                        for i in range(d)
                    ]
            else:
                w = [
                    sum(C[i][j] * v[j] for j in range(d))
                    for i in range(d)
                ]
            if max(abs(x) for x in w) >= 2 ** 62:
                raise OverflowError(
                    "power_pca_exact: matvec exceeds the BIGINT-safe "
                    "bound — rescale the input"
                )
            acc = 0.0
            for wi in w:
                acc += float(wi) * float(wi)
            nrm = math.sqrt(acc)
            if nrm == 0.0:
                raise ValueError(
                    f"power_pca_exact: zero matvec at component {c} — "
                    "rank-deficient covariance; lower k"
                )
            v_next = [
                math.floor(float(wi) / nrm * POWER_V_SCALE + 0.5) for wi in w
            ]
            v_prev, v = v, v_next
        # lambda from the LAST (v_prev, w) pair: w = C @ v_prev
        num = 0.0
        for i in range(d):
            num += float(v_prev[i]) * float(w[i])
        den = sum(x * x for x in v_prev)
        lam = math.floor(num / float(den) + 0.5)
        if lam <= 0:
            raise ValueError(
                f"power_pca_exact: non-positive eigenvalue {lam} at "
                f"component {c} — the spectrum has < {k} positive "
                "directions; lower k"
            )
        v = v_prev
        out.append((v, lam))
        # deflation: C -= round(lam * v v^T / V_SCALE^2), BIGINT-safe
        vs2 = POWER_V_SCALE * POWER_V_SCALE
        max_v = max(abs(x) for x in v)
        if abs(lam) * max_v * max_v >= 2 ** 62:
            # the maximal product IS attained at (argmax, argmax) — the
            # python loop would raise on it, so raise identically here
            raise OverflowError(
                "power_pca_exact: deflation product exceeds the "
                "BIGINT-safe bound — rescale the input"
            )
        if np is not None:
            va = np.array(v, dtype=np.int64)
            p_mat = lam * np.outer(va, va)  # int64-safe: bound above
            # float(p)/vs2 then floor(+0.5): int64→float64 conversion
            # is round-to-nearest in numpy and python alike (exact
            # cross-engine past 2^53 — see memory: engine-exactness)
            C = C - np.floor(
                p_mat.astype(np.float64) / vs2 + 0.5
            ).astype(np.int64)
        else:
            for i in range(d):
                for j in range(d):
                    p = lam * v[i] * v[j]
                    C[i][j] -= math.floor(float(p) / vs2 + 0.5)
    return out


def _collect_cov_int(df: DataFrame, vec_col: str, scale: int = 4):
    """(cov_int matrix, dim): the distributed fixed-point covariance
    (covariance_pairs — the oracle-paired aggregation) collected and
    requantized to POWER_C_SCALE integer units. Driver state O(d²)."""
    import math

    rows = covariance_pairs(df, vec_col, scale=scale).collect()
    d = max(r["j"] for r in rows)
    C = [[0] * d for _ in range(d)]
    for r in rows:
        cval = math.floor(r["cov"] * POWER_C_SCALE + 0.5)
        C[r["i"] - 1][r["j"] - 1] = cval
        C[r["j"] - 1][r["i"] - 1] = cval
    return C, d


def power_pca_whiten_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 15,
    scale: int = 4,
) -> DataFrame:
    """Whitened top-k PCA projection, ENGINE-EXACT end to end: the
    covariance aggregates distributively in fixed point (one scan, the
    shuffle carries d(d+1)/2 partial moment sums); the eigen-solve is a
    driver-side integer power iteration on the d×d matrix (bounded
    state, corpus-independent); the projection is a shuffle-free
    codegen'd HOF expression over the scan with the components embedded
    as literals. Output columns y1..yk are round(score, 6) doubles that
    replay bit-for-bit in SQL (:func:`power_pca_exact_sql`).

    Scale shape: two scans (covariance + projection), both shuffle-free
    on the corpus side; nothing corpus-proportional reaches the driver.
    """
    import math

    C, d = _collect_cov_int(df, vec_col, scale)
    comps = power_pca_exact_components(C, k, iters)

    # per-dimension means of the quantized coordinates (exact integer
    # sums -> one double division, identical in any engine)
    qcol = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * (10 ** scale)).cast("long"),
    )
    nn = df.where(F.col(vec_col).isNotNull())
    mrows = (
        nn.select(F.posexplode(qcol).alias("__i", "__q"))
        .groupBy("__i")
        .agg(F.sum("__q").alias("__s"), F.count("*").alias("__n"))
        .collect()
    )
    m = [0.0] * d
    for r in mrows:
        m[r["__i"]] = float(r["__s"]) / r["__n"]

    m_lit = F.array(*[F.lit(x) for x in m])
    q_unit = float(10 ** scale)
    diff = F.transform(
        qcol, lambda q, i: q.cast("double") - F.element_at(m_lit, i + 1)
    )
    cols = [F.col(id_col)]
    for ci, (v, lam) in enumerate(comps):
        v_lit = F.array(*[F.lit(float(x)) for x in v])
        dot = F.aggregate(
            F.zip_with(diff, v_lit, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
        y = F.round(
            dot
            / F.lit(q_unit * POWER_V_SCALE)
            / F.sqrt(F.lit(float(lam)) / F.lit(float(POWER_C_SCALE))),
            6,
        )
        cols.append(y.alias(f"y{ci + 1}"))
    return nn.select(*cols)


def power_pca_exact_sql(
    table: str,
    vec_col: str,
    dim: int,
    k: int = 8,
    iters: int = 15,
    scale: int = 4,
    id_col: str = "vec_id",
) -> str:
    """Unrolled-CTE DuckDB replay of :func:`power_pca_whiten_project`
    (the pq_exact_sql pattern): the covariance CTE is the shared
    fixed-point aggregation, each power-iteration step is one integer
    matvec CTE + one quantized-normalize CTE, deflation subtracts the
    rounded rank-1 update, and the projection replays the sequential
    HOF dot. Every arithmetic step mirrors the python loop exactly."""
    vs = POWER_V_SCALE
    cs = POWER_C_SCALE
    parts = [
        f"WITH covp AS MATERIALIZED ({covariance_pairs_sql(table, vec_col, scale=scale, ddof=0)}),",
        f"""covu AS (
        SELECT i, j, CAST(floor(cov * {cs}e0 + 0.5) AS BIGINT) AS cval
        FROM covp),""",
        """cov_0 AS MATERIALIZED (
        SELECT i, j, cval FROM covu
        UNION ALL SELECT j AS i, i AS j, cval FROM covu WHERE i < j),""",
    ]
    for c in range(k):
        parts.append(
            f"""v_{c}_0 AS (
            SELECT CAST(t.i AS BIGINT) AS i,
                   CAST(strpos('0123456789abcdef',
                        substr(md5('pca|{c}|' || CAST(t.i AS VARCHAR)),
                               1, 1)) - 9 AS BIGINT) AS v
            FROM range(1, {dim} + 1) t(i)),"""
        )
        for t in range(iters + 1):
            parts.append(
                f"""w_{c}_{t} AS MATERIALIZED (
                SELECT c.i AS i, SUM(c.cval * v.v) AS w
                FROM cov_{c} c JOIN v_{c}_{t} v ON c.j = v.i
                GROUP BY c.i),"""
            )
            if t < iters:
                parts.append(
                    f"""v_{c}_{t + 1} AS (
                    SELECT w.i,
                           CAST(floor(CAST(w.w AS DOUBLE) / n.nrm * {vs}e0
                                      + 0.5) AS BIGINT) AS v
                    FROM w_{c}_{t} w CROSS JOIN (
                        SELECT sqrt(list_sum(list_transform(
                            list(CAST(w AS DOUBLE) ORDER BY i),
                            x -> x * x))) AS nrm
                        FROM w_{c}_{t}) n),"""
                )
        parts.append(
            f"""lam_{c} AS MATERIALIZED (
            SELECT CAST(floor(
                list_sum(list_transform(range(1, {dim} + 1),
                                        kk -> vl[kk] * wl[kk]))
                / CAST(den AS DOUBLE) + 0.5) AS BIGINT) AS lam
            FROM (
                SELECT list(CAST(v.v AS DOUBLE) ORDER BY v.i) AS vl,
                       list(CAST(w.w AS DOUBLE) ORDER BY v.i) AS wl,
                       SUM(v.v * v.v) AS den
                FROM v_{c}_{iters} v JOIN w_{c}_{iters} w ON v.i = w.i
            )),"""
        )
        if c < k - 1:
            parts.append(
                f"""cov_{c + 1} AS MATERIALIZED (
                SELECT c.i, c.j,
                       c.cval - CAST(floor(
                           CAST(l.lam * va.v * vb.v AS DOUBLE)
                           / {vs * vs}e0 + 0.5) AS BIGINT) AS cval
                FROM cov_{c} c
                JOIN v_{c}_{iters} va ON c.i = va.i
                JOIN v_{c}_{iters} vb ON c.j = vb.i
                CROSS JOIN lam_{c} l),"""
            )
    q_unit = float(10 ** scale)
    parts.append(
        f"""qrows AS MATERIALIZED (
        SELECT {id_col},
               list_transform({vec_col},
                   x -> CAST(round(CAST(x AS DOUBLE) * {10 ** scale}e0)
                             AS BIGINT)) AS q
        FROM {table} WHERE {vec_col} IS NOT NULL),"""
    )
    parts.append(
        f"""marr AS MATERIALIZED (
        SELECT list(m ORDER BY i) AS m FROM (
            SELECT kk AS i, CAST(SUM(q[kk]) AS DOUBLE) / COUNT(*) AS m
            FROM qrows, range(1, {dim} + 1) t(kk) GROUP BY kk)),"""
    )
    for c in range(k):
        parts.append(
            f"""vl_{c} AS (
            SELECT list(CAST(v AS DOUBLE) ORDER BY i) AS v
            FROM v_{c}_{iters}),"""
        )
    ys = ",\n           ".join(
        f"""round(list_sum(list_transform(range(1, {dim} + 1),
               kk -> (CAST(q.q[kk] AS DOUBLE) - m.m[kk]) * vv{c}.v[kk]))
               / {q_unit * vs}e0
               / sqrt(CAST(l{c}.lam AS DOUBLE) / {cs}e0), 6) AS y{c + 1}"""
        for c in range(k)
    )
    froms = " ".join(
        f"CROSS JOIN vl_{c} vv{c} CROSS JOIN lam_{c} l{c}" for c in range(k)
    )
    parts.append(
        f"""final AS (
        SELECT q.{id_col},
           {ys}
        FROM qrows q CROSS JOIN marr m {froms})
    SELECT * FROM final"""
    )
    return "\n".join(parts)
