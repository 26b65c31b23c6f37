"""Subset filters (reference SURVEY.md §2.3).

The reference applies these in pandas *after* reading whole files
(pinecone_import.py:188-218). Expressed declaratively here, Catalyst pushes
them into the Parquet scan (min/max + dictionary filters), so at 100 TB an
id-range read touches only the row-groups that can match.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_id_range(
    df: DataFrame, id_col: str, start: int | None, end: int | None
) -> DataFrame:
    """id BETWEEN range, with int cast (pinecone_import.py:197-213).

    ``try_cast`` (not ``cast``) because ids may be arbitrary strings and
    Spark 4 ANSI mode errors on bad casts; non-numeric ids fall out of the
    range, matching the reference's errors='coerce' semantics.
    """
    c = F.col(id_col).try_cast("long")
    out = df
    if start is not None:
        out = out.where(c >= start)
    if end is not None:
        out = out.where(c <= end)
    return out


def filter_id_in_list(df: DataFrame, id_col: str, ids: Iterable) -> DataFrame:
    """id ∈ literal list (small lists; for file-backed lists use
    ``semi_join_id_list`` which broadcasts)."""
    return df.where(F.col(id_col).isin(list(ids)))


def filter_nonnull_vector(df: DataFrame, vector_col: str) -> DataFrame:
    """Drop rows with null vectors (chroma_import.py:165-172,
    turbopuffer_import.py:111-118)."""
    return df.where(F.col(vector_col).isNotNull())


def limit_rows(df: DataFrame, max_num_rows: int | None) -> DataFrame:
    """Global row cap ``max_num_rows`` (§2.3). The reference threads a
    running counter across files; in Spark a single ``limit`` is pushed to
    the scan (stops reading once satisfied)."""
    return df if max_num_rows is None else df.limit(max_num_rows)
