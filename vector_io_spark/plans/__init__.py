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

    # bracket-depth parse of the struct body: a naive struct<([^>]*)>
    # regex truncates at the first '>' of any NESTED type (array<float>
    # — the common vector column), silently dropping every later column
    # from the check, and naive comma-splitting invents fake top-level
    # columns from nested struct fields.
    schemas = []
    marker = "ReadSchema: struct<"
    pos = 0
    while True:
        i = plan.find(marker, pos)
        if i < 0:
            break
        depth, j = 1, i + len(marker)
        while j < len(plan) and depth:
            if plan[j] == "<":
                depth += 1
            elif plan[j] == ">":
                depth -= 1
            j += 1
        schemas.append(plan[i + len(marker): j - 1])
        pos = j
    assert schemas, f"no ReadSchema in plan:\n{plan}"

    def top_level_fields(body: str):
        depth = 0
        field = []
        for ch in body:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                yield "".join(field)
                field = []
            else:
                field.append(ch)
        if field:
            yield "".join(field)

    read_cols = {
        part.split(":")[0].strip()
        for schema in schemas
        for part in top_level_fields(schema)
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


def _walk_jvm_plan(node, out: list) -> None:
    out.append(node)
    children = node.children()
    for i in range(children.size()):
        _walk_jvm_plan(children.apply(i), out)


def count_unpartitioned_windows(df: DataFrame) -> int:
    """Number of window operators with an EMPTY partition spec — each one
    moves its whole input to a single partition (the straggler pattern
    WindowGroupLimit can rescue only for rank<=k filters; ntile and
    percent_rank windows have no such rescue). Zero is the only
    acceptable count for data-proportional inputs at 100 TB."""
    nodes: list = []
    _walk_jvm_plan(df._jdf.queryExecution().sparkPlan(), nodes)
    n = 0
    for nd in nodes:
        name = nd.getClass().getSimpleName()
        if name in ("WindowExec", "WindowInPandasExec"):
            if nd.partitionSpec().isEmpty():
                n += 1
    return n


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    n = count_unpartitioned_windows(df)
    assert n == 0, (
        f"{n} unpartitioned (single-task) window(s) in plan:\n"
        f"{simple_plan(df)}"
    )


def assert_window_group_limit(df: DataFrame) -> None:
    """Assert Spark's WindowGroupLimit optimization fired: a global
    row_number().over(orderBy(...)) <= k top-k is only scale-safe because
    each map task pre-truncates to k rows before the single-partition
    window sees anything. If an expression change disqualifies the rank
    filter, the plan silently reverts to a full single-partition sort —
    this gate makes that loud."""
    plan = simple_plan(df)
    # Two equally scale-safe rescues exist: InferWindowGroupLimit
    # (map-side per-partition truncation to k) and
    # LimitPushDownThroughWindow (an outer LIMIT k rewrites the window
    # input to a distributed TakeOrderedAndProject). Either one keeps
    # the single-partition window's input at O(k).
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan, (
        f"neither WindowGroupLimit nor TakeOrderedAndProject fired — global "
        f"top-k would move the full input to one task; plan:\n{plan}"
    )
