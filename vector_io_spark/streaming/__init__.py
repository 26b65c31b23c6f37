"""Structured Streaming extension: incremental VDF export.

The reference is pure batch (SURVEY.md §2.10) — this module is the
forward-looking extension: a vector stream (new parquet files landing in a
directory, or any streaming source) is continuously sanitized, deduped
within the micro-batch, and appended to a VDF dataset with the catalog
kept current via foreachBatch.
"""

from vector_io_spark.streaming.incremental import (  # noqa: F401
    incremental_vdf_export,
)
