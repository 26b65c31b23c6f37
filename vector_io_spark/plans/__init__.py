"""Plan-inspection helpers: assert the physical plan has the properties a
100 TB deployment needs (pushdown, pruning, broadcast, no cartesian
products). Used by tests/test_plan_quality.py — correctness tests prove
operators right, these prove they'd still be FAST at 1000× the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    """Physical plan with each operator appearing exactly once (formatted
    mode repeats operators in the detail section — wrong for counting)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan advertises PushedFilters containing every
    fragment (predicate reached the scan -> row-group pruning at scale)."""
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, f"no pushed filters in plan:\n{plan}"
    for frag in fragments:
        assert frag in plan, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_read_schema_only(df: DataFrame, *columns: str) -> None:
    """Assert column pruning: the scan's ReadSchema contains exactly the
    expected columns (a scan reading extra columns at 100 TB is an I/O
    multiplier)."""
    plan = formatted_plan(df)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, f"no ReadSchema in plan:\n{plan}"
    read_cols = {
        part.split(":")[0].strip()
        for schema in schemas
        for part in schema.split(",")
        if part.strip()
    }
    expected = set(columns)
    assert read_cols <= expected, (
        f"scan reads {sorted(read_cols - expected)} beyond expected "
        f"{sorted(expected)}; plan:\n{plan}"
    )


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert at least one join is broadcast (small side never shuffles the
    big side)."""
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (every one is a
    full-data network pass at scale — fewer is better, zero is best)."""
    plan = simple_plan(df)
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def count_broadcast_joins(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin")


def codegen_stage_count(df: DataFrame) -> int:
    plan = simple_plan(df)
    return plan.count("WholeStageCodegen")
