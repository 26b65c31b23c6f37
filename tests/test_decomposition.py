"""PCA / whitening: covariance exactness, spectral properties, parity
with a single-node numpy reference on the same data."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_io_spark.operators.decomposition import (
    covariance_pairs,
    fit_pca,
    pca_project,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _dense_cov(emb_df):
    X = np.vstack(emb_df.toPandas()["embedding"].to_numpy()).astype(np.float64)
    # replicate the operator's fixed-point quantization exactly
    Q = np.round(X * 1e4)
    n = len(Q)
    s = Q.sum(axis=0)
    return (Q.T @ Q - np.outer(s, s) / n) / n / 1e8, X


def test_covariance_matches_quantized_numpy(emb):
    rows = covariance_pairs(emb, "embedding", scale=4).collect()
    ref, _ = _dense_cov(emb)
    for r in rows:
        assert r["cov"] == pytest.approx(
            round(ref[r["i"] - 1, r["j"] - 1], 8), abs=1e-8
        )
    d = ref.shape[0]
    assert len(rows) == d * (d + 1) // 2


def test_fit_pca_spectral_contract(emb):
    mean, comps, vals = fit_pca(emb, "embedding", k=8)
    # orthonormal columns, descending eigenvalues, deterministic sign
    assert np.allclose(comps.T @ comps, np.eye(8), atol=1e-8)
    assert all(np.diff(vals) <= 1e-12)
    for c in range(comps.shape[1]):
        assert comps[np.argmax(np.abs(comps[:, c])), c] > 0
    # eigenvalues match numpy's on the (quantized) covariance
    ref, _ = _dense_cov(emb)
    vals_ref = np.sort(np.linalg.eigvalsh(np.round(ref, 8)))[::-1][:8]
    assert np.allclose(vals, vals_ref, atol=1e-6)


def test_project_and_whiten(emb):
    mean, comps, vals = fit_pca(emb, "embedding", k=4)
    out = pca_project(emb, mean, comps, vals, out_col="p")
    W = np.vstack(out.select("p").toPandas()["p"].to_numpy())
    assert W.shape[1] == 4
    # projection reproduces numpy (X - mu) @ comps to rounding
    _, X = _dense_cov(emb)
    ref = np.round((X - mean) @ comps, 6)
    got = np.vstack(
        out.select("vec_id", "p").toPandas().sort_values("vec_id")["p"].to_numpy()
    )
    ref_sorted = ref[np.argsort(emb.toPandas()["vec_id"].to_numpy(), kind="stable")]
    assert np.allclose(got, ref_sorted, atol=1e-6)
    # whitening: unit variance per component on the training data
    wout = pca_project(emb, mean, comps, vals, out_col="w", whiten=True)
    Wv = np.vstack(wout.select("w").toPandas()["w"].to_numpy())
    assert np.allclose(Wv.var(axis=0, ddof=0), 1.0, atol=1e-3)


def test_fit_deterministic(emb):
    m1 = fit_pca(emb, "embedding", k=3)
    m2 = fit_pca(emb, "embedding", k=3)
    for a, b in zip(m1, m2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_label_separation_orders_cluster_quality(spark):
    """Tight well-separated synthetic clusters -> low db_ratio; an
    overlapping diffuse pair -> high ratio."""
    import numpy as np

    from vector_io_spark.operators.decomposition import label_separation

    rng = np.random.RandomState(3)
    rows = []
    # labels 0/1: tight clusters far apart; labels 2/3: overlapping blobs
    for i in range(60):
        rows.append((0, (np.array([10.0, 0.0]) + rng.normal(0, 0.1, 2)).tolist()))
        rows.append((1, (np.array([-10.0, 0.0]) + rng.normal(0, 0.1, 2)).tolist()))
        rows.append((2, (np.array([0.0, 0.3]) + rng.normal(0, 2.0, 2)).tolist()))
        rows.append((3, (np.array([0.0, -0.3]) + rng.normal(0, 2.0, 2)).tolist()))
    df = spark.createDataFrame(rows, "label long, embedding array<double>")
    got = {r["label"]: r for r in label_separation(df).collect()}
    assert got[0]["db_ratio"] < 0.05 and got[1]["db_ratio"] < 0.05
    assert got[2]["db_ratio"] > 1.0 and got[3]["db_ratio"] > 1.0
    assert all(got[l]["n"] == 60 for l in range(4))


def test_power_pca_exact_agrees_with_eigh_on_separated_spectrum(spark):
    """Round-5 contract for the engine-exact power-iteration PCA twin:
    on a spectrum with clear eigengaps the fixed-point power iteration
    must recover numpy eigh's top components (eigenvalues within a few
    percent, eigenvector |cosine| ~ 1) and its whitened projection must
    have ~unit variance per component — while every intermediate stays
    integer/fixed-sequence arithmetic (the property the DuckDB oracle
    replays; hash-equality itself is gated by oracle_check)."""
    from vector_io_spark.operators.decomposition import (
        power_pca_exact_components,
        power_pca_whiten_project,
    )

    rng = np.random.RandomState(7)
    d, n, k = 8, 500, 3
    # separated spectrum: scales 1.0, 0.6, 0.35 on random orthogonal
    # directions + small isotropic noise
    basis, _ = np.linalg.qr(rng.randn(d, d))
    scales = np.array([1.0, 0.6, 0.35])
    X = (rng.randn(n, 3) * scales[None, :]) @ basis[:, :3].T
    X += 0.02 * rng.randn(n, d)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )

    # integer covariance exactly as the operator builds it
    Q = np.round(X * 1e4)
    s = Q.sum(axis=0)
    cov = (Q.T @ Q - np.outer(s, s) / n) / n / 1e8
    cov_r = np.round(cov, 8)
    C_int = [
        [int(np.floor(cov_r[i, j] * 1e8 + 0.5)) for j in range(d)]
        for i in range(d)
    ]
    comps = power_pca_exact_components(C_int, k=k, iters=25)

    vals, vecs = np.linalg.eigh(cov_r)
    order = np.argsort(vals)[::-1]
    for c in range(k):
        v = np.array(comps[c][0], dtype=np.float64) / 1e5
        lam = comps[c][1] / 1e8
        ref_lam = vals[order[c]]
        ref_v = vecs[:, order[c]]
        assert abs(lam - ref_lam) / ref_lam < 0.05, (c, lam, ref_lam)
        cos = abs(float(v @ ref_v) / np.linalg.norm(v))
        assert cos > 0.99, (c, cos)

    proj = power_pca_whiten_project(
        df, "embedding", "vec_id", k=k, iters=25
    ).toPandas()
    for c in range(1, k + 1):
        var = proj[f"y{c}"].to_numpy().var()
        assert abs(var - 1.0) < 0.1, (c, var)


def test_power_pca_numpy_fast_path_bit_equal_to_python_loop():
    """Round-6 contract: the int64-numpy matvec/deflation fast path
    must be BIT-EQUAL to the pure-python reference loop (same integer
    matvecs, same sequential double norms, same floor(+0.5)
    requantization) — the property that lets the 'ENGINE-EXACT end to
    end' banner survive production embedding dims (d=1024 timing in
    BASELINE.md)."""
    from vector_io_spark.operators.decomposition import (
        POWER_C_SCALE,
        power_pca_exact_components,
    )

    for d, k, seed in [(16, 4, 3), (96, 6, 11)]:
        rng = np.random.RandomState(seed)
        # synthetic PSD covariance with a decaying spectrum, quantized
        # to POWER_C_SCALE ints exactly as _collect_cov_int would
        basis, _ = np.linalg.qr(rng.randn(d, d))
        scales = 1.0 / (1.0 + np.arange(d)) ** 0.7
        cov = (basis * scales[None, :]) @ basis.T
        C_int = [
            [
                int(np.floor(cov[i, j] * POWER_C_SCALE + 0.5))
                for j in range(d)
            ]
            for i in range(d)
        ]
        fast = power_pca_exact_components(C_int, k=k, iters=12)
        ref = power_pca_exact_components(
            C_int, k=k, iters=12, force_python=True
        )
        assert fast == ref, (d, k)


def test_covariance_gram_kernel_matches_exploded_formulation(spark):
    """r12 optimization pin: the mapInPandas integer-Gram formulation of
    covariance_pairs must be bit-identical to the exploded (i, j, prod)
    formulation (the SQL oracle's documented shape) — including on
    RAGGED vector lengths, where a length-L row contributes pair (i, j)
    iff j <= L, and on null vectors (filtered) and empty arrays."""
    from vector_io_spark.operators.decomposition import (
        _covariance_pairs_exploded,
        covariance_pairs,
    )

    rows = [
        (1, [0.11, -0.5, 0.25, 1.0]),
        (2, [0.4, 0.125, -0.33, 0.6]),
        (3, [1.5, -1.25, 0.0, 0.05]),
        (4, [0.21, 0.31]),          # ragged: only pairs with j <= 2
        (5, [0.9]),                 # ragged: only (1, 1)
        (6, None),                  # filtered
        (7, []),                    # contributes nothing
        (8, [-0.755, 0.005, 0.115, -0.95]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for ddof in (0, 1):
        want = sorted(
            (r["i"], r["j"], r["cov"])
            for r in _covariance_pairs_exploded(
                df, "embedding", scale=4, ddof=ddof
            ).collect()
        )
        got = sorted(
            (r["i"], r["j"], r["cov"])
            for r in covariance_pairs(
                df, "embedding", scale=4, ddof=ddof
            ).collect()
        )
        assert got == want, (ddof, got[:5], want[:5])
