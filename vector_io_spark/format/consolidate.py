"""Schema unification + dataset consolidation.

The reference consolidates ragged parquet files by unioning column sets
with null padding (consolidate_parquet.py:77-91) and unifying schemas
incrementally (pa.unify_schemas, vdb_export_cls.py:88-93), which widens
compatible types. Spark's ``mergeSchema`` throws on type conflicts, so we
do an explicit widening pass:

- same type -> keep
- numeric vs numeric -> widest (tinyint<smallint<int<bigint<float<double)
- anything vs string -> string
- array<a> vs array<b> -> array<widen(a,b)>
- missing column -> null-padded (added by unionByName)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_ORDER = ["tinyint", "smallint", "int", "bigint", "float", "double"]


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    sa, sb = a.simpleString(), b.simpleString()
    if sa in _NUMERIC_ORDER and sb in _NUMERIC_ORDER:
        return [t for t in (a, b) if t.simpleString() == max(
            sa, sb, key=_NUMERIC_ORDER.index
        )][0]
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType), True)
    return T.StringType()


def unify_schemas(frames: list[DataFrame]) -> list[DataFrame]:
    """Cast every frame so shared columns have one widened type; missing
    columns are left absent (unionByName pads them with NULL)."""
    target: dict[str, T.DataType] = {}
    for df in frames:
        for field in df.schema.fields:
            target[field.name] = (
                _widen(target[field.name], field.dataType)
                if field.name in target
                else field.dataType
            )
    out = []
    for df in frames:
        exprs = []
        for name in df.columns:
            t = target[name]
            c = F.col(name)
            exprs.append(c.cast(t).alias(name) if df.schema[name].dataType != t else c)
        out.append(df.select(*exprs))
    return out


def consolidate(frames: list[DataFrame]) -> DataFrame:
    """Union ragged frames into one (column union, null padding, widened
    types) — the consolidation operator. Pure narrow ops: no shuffle; the
    output re-rotates into bounded files via maxRecordsPerFile at write
    time."""
    unified = unify_schemas(frames)
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), unified
    )
