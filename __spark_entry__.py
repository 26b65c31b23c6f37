"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions, as (spark, sf_dir) callables.
``oracle_sql()`` — DuckDB-equivalent SQL per query (the correctness gate).
Implementations live in ``vector_io_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from vector_io_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact cosine top-10 similarity search over the embeddings
    table (broadcast queries, codegen'd dot products, windowed top-k)."""
    return QUERIES["ann_topk_bruteforce"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
