"""Sanitization / coercion rules (reference SURVEY.md §1.3).

The reference applies these row-at-a-time in ``cleanup_df`` (util.py:357-377),
``clean_value`` (util.py:480-490) and ``normalize_dict``
(qdrant_import.py:390-446). Here each rule is a Catalyst expression applied
per-column — vectorized, codegen'd, no Python.

Rules:
- float ±Inf -> NaN -> NULL (or 0.0 for the qdrant target profile)
- NaT / null timestamp -> epoch 0 (pd.Timestamp(0))
- bytes -> utf-8 decoded string
- JSON-string metadata -> parsed struct/map (``from_json``)
- binary image columns -> dropped with a warning (reference drops PIL
  image columns, util.py:363-367; see operators/multimodal.py for the
  engine's better-than-reference handling)
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_nan_inf(c: Column | str, nan_to_zero: bool = False) -> Column:
    """±Inf -> NaN -> NULL (util.py:373-375, clean_value util.py:480-490);
    with ``nan_to_zero`` (qdrant payload profile, qdrant_import.py:409-414)
    NaN/Inf -> 0.0 instead."""
    c = F.col(c) if isinstance(c, str) else c
    bad = F.isnan(c) | (c == float("inf")) | (c == float("-inf"))
    repl = F.lit(0.0) if nan_to_zero else F.lit(None)
    return F.when(bad, repl).otherwise(c)


def fill_nat_epoch(c: Column | str) -> Column:
    """NULL/NaT timestamp -> epoch 0 (cleanup_df, util.py:369-371)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.coalesce(c, F.timestamp_seconds(F.lit(0)))


def decode_bytes(c: Column | str) -> Column:
    """bytes -> utf-8 string (qdrant_import.py:421-423)."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("string")


def parse_json_metadata(c: Column | str, schema: str = "map<string,string>") -> Column:
    """Parse JSON-string metadata columns (normalize_dict,
    qdrant_import.py:421-432). Unparseable strings -> NULL."""
    c = F.col(c) if isinstance(c, str) else c
    return F.from_json(c, schema)


def cleanup_df(
    df: DataFrame,
    nan_to_zero: bool = False,
    drop_binary: bool = True,
    fill_timestamps: bool = True,
) -> DataFrame:
    """Whole-frame sanitization pass mirroring reference ``cleanup_df``
    (util.py:357-377): applies the per-type rules above to every column of
    the matching type. One projection — no shuffle, fully codegen'd.
    """
    exprs: list[Column] = []
    for name, dtype in df.dtypes:
        c = F.col(name)
        if dtype in ("double", "float"):
            exprs.append(clean_nan_inf(c, nan_to_zero).alias(name))
        elif dtype.startswith("timestamp") and fill_timestamps:
            exprs.append(fill_nat_epoch(c).alias(name))
        elif dtype == "binary" and drop_binary:
            warnings.warn(f"dropping binary column {name!r} (reference drops image columns)")
            continue
        else:
            exprs.append(c)
    return df.select(*exprs)


def scalar_metadata_only(df: DataFrame, keep: list[str] | None = None) -> DataFrame:
    """Chroma profile: metadata restricted to scalar str/int/float/bool;
    other-typed columns dropped (chroma_import.py:201-207)."""
    scalar_types = ("string", "int", "bigint", "smallint", "tinyint", "float", "double", "boolean")
    keep = keep or []
    cols = [n for n, t in df.dtypes if t in scalar_types or n in keep]
    return df.select(*cols)


def stringify_nonconforming(df: DataFrame, cols: list[str]) -> DataFrame:
    """Turbopuffer profile: non-conforming attribute values stringified
    (turbopuffer_import.py:123-139)."""
    out = df
    for name in cols:
        dtype = dict(df.dtypes)[name]
        if dtype.startswith("array"):
            out = out.withColumn(name, F.transform(F.col(name), lambda x: x.cast("string")))
        elif dtype not in ("string", "bigint", "int", "boolean"):
            out = out.withColumn(name, F.col(name).cast("string"))
    return out
