"""Physical-plan assertions.

The scale contract of every operator (filters pushed to the scan, columns
pruned, small sides broadcast, no stray shuffles) is asserted in tests via
these helpers, so a regression that silently de-optimizes a plan fails CI —
the 100 TB behavior is encoded as a test, not a hope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter containing
    ``fragment`` (check `PushedFilters: [...]`)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """TOP-LEVEL columns actually read from the scan (column pruning
    check). Splits the ReadSchema struct at angle-bracket depth 0 only —
    a naive comma split would emit a nested struct/map's inner field
    names as phantom top-level columns."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" not in line:
            continue
        inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
        depth, field = 0, ""
        for ch in inner + ",":
            if ch == "," and depth == 0:
                if ":" in field:
                    cols.append(field.split(":", 1)[0].strip())
                field = ""
                continue
            depth += ch in "<("
            depth -= ch in ">)"
            field += ch
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges in the physical plan. Excludes
    BroadcastExchange (no data shuffle — the whole point of a broadcast)
    and reused exchanges; a bare 'Exchange' substring match would count
    every broadcast join as a shuffle."""
    plan = physical_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "Reused" not in line and "BroadcastExchange" not in line
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def global_window_inputs(df: DataFrame) -> list[set[str]]:
    """For every WindowExec with an EMPTY partition spec (the
    move-everything-to-one-task shape), the column names of its child's
    output — i.e. exactly what would flow through a single task. Lets
    tests pin 'the only global windows run over bounded metadata, never
    corpus rows'."""
    root = df._jdf.queryExecution().sparkPlan()
    out: list[set[str]] = []
    for node in _walk(root):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            attrs = node.child().output()
            out.append({attrs.apply(i).name() for i in range(attrs.size())})
    return out
