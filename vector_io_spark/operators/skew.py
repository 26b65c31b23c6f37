"""Skew-mitigation utilities.

AQE's skew-join handles most runtime skew; these explicit tools cover the
cases it can't: aggregations over hot keys and joins where one key holds a
double-digit percent of all rows (the classic power-law id).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys in ``big``: the big side gets a
    random salt 0..salt_buckets-1 appended to the key; the small side is
    exploded ×salt_buckets so every salted key finds its match. One hot
    key's rows now spread over ``salt_buckets`` reducers.

    Cost model: small side grows ×salt_buckets (fine — it's small), the
    big side's shuffle is unchanged in volume but uniform in distribution.
    Use when one key exceeds ~1/parallelism of all rows; otherwise let
    AQE's skew-join split do it for free.

    Only 'inner' and 'left' are supported: the salt scheme replicates the
    small side ×salt_buckets, so under 'right'/'full' an UNMATCHED small-
    side row would survive once per salt bucket (×salt_buckets duplicate
    null-padded output rows). Matched rows are fine under any `how`, but
    rather than silently corrupting outer results we reject them.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: outer "
            "variants would emit unmatched small-side rows once per salt bucket"
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: aggregate on (key, salt) first — spreading a
    hot key over ``salt_buckets`` partial groups — then combine partials
    per key. Only algebraic aggregates (sum/count/min/max) compose this
    way; avg must be expressed as sum+count by the caller.

    ``agg_exprs`` maps output column -> 'sum(col)' / 'count(*)' /
    'min(col)' / 'max(col)'.
    """
    partial_exprs = []
    final_exprs = []
    combines = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, expr in agg_exprs.items():
        fn = expr.split("(")[0].strip().lower()
        if fn not in combines:
            raise ValueError(
                f"two_phase_agg: unsupported aggregate {expr!r} — only "
                "algebraic sum/count/min/max compose over salt buckets "
                "(express avg as sum+count)"
            )
        if re.search(r"\(\s*distinct\b", expr, re.IGNORECASE):
            # count(distinct x) would pass the name check but OVERCOUNT
            # silently: a value landing in k salt buckets is counted k
            # times by the combine-phase sum
            raise ValueError(
                f"two_phase_agg: {expr!r} is not salt-decomposable — a "
                "distinct value spread over salt buckets is counted once "
                "PER BUCKET by the combining sum"
            )
        partial_exprs.append(F.expr(expr).alias(f"__p_{out}"))
        final_exprs.append(F.expr(f"{combines[fn]}(__p_{out})").alias(out))
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
