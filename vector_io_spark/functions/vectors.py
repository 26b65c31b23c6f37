"""Vector-column expressions.

Everything here is built-in-expression based (higher-order functions:
``transform`` / ``zip_with`` / ``aggregate``) so Catalyst keeps it inside
whole-stage codegen — no Python in the hot path. Semantics mirror the
reference's tolerant row-at-a-time coercions (``extract_vector``,
vdf_import_cls.py:189-212) re-expressed as vectorized column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def coerce_vector_column(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Tolerantly coerce a column to ``array<float>``.

    Mirrors reference ``extract_vector`` (vdf_import_cls.py:189-212):
    accepts array<numeric> (cast elements), a stringified python list
    ("[0.1, 0.2]"), or utf-8 bytes of a stringified list. Unparseable
    values become NULL (the reference flags them ``abnormal_vector_format``
    and skips).

    Scale note: pure Catalyst expressions — ``transform`` for the cast,
    ``from_json`` for the string parse — so the coercion is codegen'd and
    runs at scan speed; no shuffle, no Python.
    """
    out = out or col
    dtype = dict(df.dtypes)[col]
    c = F.col(col)
    if dtype.startswith("array"):
        expr = F.transform(c, lambda x: x.cast("float"))
    elif dtype == "binary":
        expr = F.from_json(c.cast("string"), T.ArrayType(T.FloatType()))
    elif dtype == "string":
        expr = F.from_json(c, T.ArrayType(T.FloatType()))
    else:
        raise TypeError(f"cannot coerce column {col!r} of type {dtype} to vector")
    return df.withColumn(out, expr)


def vector_dim(df: DataFrame, col: str) -> int:
    """Dimension inference = length of the first non-null vector
    (reference ``resolve_dims``, vdf_import_cls.py:165-187).

    Runs as ``LIMIT 1`` over a filtered scan — Catalyst stops at the first
    matching row-group; O(1) regardless of table size.
    """
    row = (
        df.select(F.size(F.col(col)).alias("d"))
        .where(F.col(col).isNotNull())
        .limit(1)
        .collect()
    )
    return int(row[0]["d"]) if row else -1


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float> columns as a codegen'd expression.

    ``zip_with`` + ``aggregate`` keeps the whole computation JVM-side;
    accumulation in double for stability.

    Measured alternative (round 3, do not retry blindly): unrolling the
    sum into 64 ``get(a, j) * get(b, j)`` terms is bit-identical but 4×
    SLOWER (8.6 s -> 32 s on a 20k×64-query scan) — the giant expression
    exceeds the codegen method-size limit and falls back to interpreted
    evaluation. The HOF loop is the fast exact-order form.
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double")),
            F.lit(0.0),
            lambda acc, d: acc + d * d,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either norm is 0 (matches DuckDB
    list_cosine_similarity NaN-avoidance when rounded)."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != 0.0, num / den)


def normalize_vector(a: Column | str) -> Column:
    """Unit-normalize an array<float> column (zero vectors pass through)."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.when(n != 0.0, F.transform(a, lambda x: (x.cast("double") / n).cast("float"))).otherwise(a)


def quantize_embeddings(df: DataFrame, col: str, out: str, precision: str = "int8") -> DataFrame:
    """Embedding quantization float32 -> int8/uint8/binary (reference
    reembed.py:455-470,500-512 via sentence_transformers.quantize_embeddings).

    int8/uint8: per-dimension min/max calibration over the dataset (the
    sentence-transformers calibration strategy), then affine quantization.
    binary: sign bit per dimension packed into bytes.

    Scale note: calibration is one distributive aggregation (per-dim min/max
    via ``posexplode`` -> groupBy(pos), partial aggregation map-side); the
    quantization itself is a codegen'd ``transform``. For 100 TB, calibrate
    on a sample (``df.sample``) instead — ranges converge quickly.
    """
    if precision in ("int8", "uint8"):
        dims = (
            df.select(F.posexplode(F.col(col)).alias("pos", "val"))
            .groupBy("pos")
            .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
            .orderBy("pos")
            .collect()
        )
        mins = F.array(*[F.lit(float(r["mn"])) for r in dims])
        ranges = F.array(
            *[F.lit(float(r["mx"] - r["mn"]) or 1.0) for r in dims]
        )
        lo, hi = (-128, 127) if precision == "int8" else (0, 255)
        mcol, rcol = mins, ranges
        # size==0 would make sequence(0, -1) count DOWN to [0, -1] (the
        # char_ngrams gotcha) and index element_at(mins, 0) — emit an
        # empty array for empty vectors instead
        q = F.zip_with(
            F.col(col),
            F.sequence(F.lit(0), F.greatest(F.size(F.col(col)) - 1, F.lit(0))),
            lambda v, i: F.least(
                F.greatest(
                    F.round(
                        (v.cast("double") - F.element_at(mcol, i + 1))
                        / F.element_at(rcol, i + 1)
                        * 255
                        + F.lit(lo)
                    ),
                    F.lit(float(lo)),
                ),
                F.lit(float(hi)),
            ).cast("int"),
        )
        q = F.when(F.size(F.col(col)) > 0, q).otherwise(
            F.array().cast("array<int>")
        )
        return df.withColumn(out, q)
    if precision in ("binary", "ubinary"):
        # sign bits PACKED into bytes, MSB-first — np.packbits semantics,
        # matching sentence_transformers.quantize_embeddings exactly
        # (reembed.py:500-512): ubinary = packbits(v > 0) in 0..255,
        # binary = packbits - 128 as int8. Output length ceil(d/8): 8x
        # smaller than the unpacked 'bits' form. Pure codegen'd transform.
        src = F.col(col)
        n_bytes = F.ceil(F.size(src) / F.lit(8.0)).cast("int")

        def byte_expr(b):  # b: 0-based byte index Column
            total = F.lit(0)
            for j in range(8):
                bit = F.when(
                    F.coalesce(
                        F.try_element_at(src, (b * 8 + j + 1).cast("int")),
                        F.lit(0.0),
                    )
                    > 0,
                    F.lit(1 << (7 - j)),
                ).otherwise(F.lit(0))
                total = total + bit
            return total

        packed = F.transform(
            F.sequence(F.lit(0), n_bytes - F.lit(1)),
            lambda b: (
                byte_expr(b) - (128 if precision == "binary" else 0)
            ).cast("int"),
        )
        # n_bytes==0 would make sequence(0, -1) DESCEND to [0, -1] and
        # emit two spurious bytes — np.packbits of nothing is []
        packed = F.when(F.size(F.col(col)) > 0, packed).otherwise(
            F.array().cast("array<int>")
        )
        return df.withColumn(out, packed)
    if precision == "bits":
        # unpacked 0/1 per dimension (diagnostic form; 8x the storage of
        # 'binary' — prefer the packed forms for persisted data)
        bits = F.transform(F.col(col), lambda v: F.when(v > 0, F.lit(1)).otherwise(F.lit(0)))
        return df.withColumn(out, bits)
    raise ValueError(f"unknown precision {precision!r}")


def l1_distance(a: Column | str, b: Column | str) -> Column:
    """Manhattan (L1) distance — completes the standard metric enum
    (meta.STANDARD_METRICS); same codegen'd zip_with/aggregate shape."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def random_projection(
    a: Column | str, in_dims: int, out_dims: int, seed: str = "p"
) -> Column:
    """Johnson-Lindenstrauss-style dimensionality reduction: project an
    array<float> onto ``out_dims`` deterministic pseudo-random axes.

    Coefficient (j, d) is the first md5 nibble of ``"{seed}{j}:{d}"``
    minus 7.5 (mean-zero, same family as the simhash hyperplanes in
    operators/dedup.py) — computed driver-side with hashlib, bit-identical
    to the md5 of any engine, so projections are exactly reproducible
    (and DuckDB-verifiable). The coefficients ship as plan literals
    (out_dims × in_dims doubles); the per-row work is a codegen'd
    zip_with/aggregate chain — zero shuffle, scan speed.
    """
    import hashlib

    a = F.col(a) if isinstance(a, str) else a

    def coef(j: int, d: int) -> float:
        nib = int(hashlib.md5(f"{seed}{j}:{d}".encode()).hexdigest()[0], 16)
        return nib - 7.5

    axes = [
        F.array(*[F.lit(coef(j, d)) for d in range(in_dims)])
        for j in range(out_dims)
    ]
    return F.array(
        *[
            F.aggregate(
                F.zip_with(a, axis, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for axis in axes
        ]
    )


def minmax_scale_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "scaled",
) -> DataFrame:
    """Per-dimension min-max scaling to [0, 1] using DISTRIBUTED range
    stats: one posexplode→groupBy(dim) pass (shuffle carries dims ×
    partitions partials, corpus-size independent), the d-row stat table
    collapses to a single array row and broadcast-joins back, and the
    rescale is a zip_with — whole pipeline stays in Catalyst, exact
    per-element arithmetic (no cross-row float sums, so the result is
    engine-deterministic given identical inputs).

    Constant dimensions (max == min) scale to 0. Output rounded to 6 dp.
    """
    stats = (
        df.select(F.posexplode(F.col(vec_col)).alias("__p", "__v"))
        .groupBy("__p")
        .agg(
            F.min("__v").cast("double").alias("__lo"),
            F.max("__v").cast("double").alias("__hi"),
        )
    )
    packed = stats.agg(
        F.array_sort(
            F.collect_list(F.struct("__p", "__lo", "__hi"))
        ).alias("__s")
    ).select(
        F.transform("__s", lambda s: s["__lo"]).alias("__los"),
        F.transform("__s", lambda s: s["__hi"]).alias("__his"),
    )
    scaled = F.zip_with(
        F.zip_with(
            F.col(vec_col),
            F.col("__los"),
            lambda v, lo: v.cast("double") - lo,
        ),
        F.zip_with(
            F.col("__his"), F.col("__los"), lambda hi, lo: hi - lo
        ),
        lambda num, span: F.round(
            F.when(span > 0, num / span).otherwise(F.lit(0.0)), 6
        ),
    )
    return df.crossJoin(F.broadcast(packed)).withColumn(out_col, scaled).drop(
        "__los", "__his"
    )


def chebyshev_distance(a: Column | str, b: Column | str) -> Column:
    """Chebyshev (L∞) distance: max per-dimension absolute difference.
    array_max over a zip_with — unlike the summed metrics it needs NO
    accumulation order guarantee at all (max is commutative-associative
    exactly), so it is trivially engine-exact."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.array_max(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double")))
    )
