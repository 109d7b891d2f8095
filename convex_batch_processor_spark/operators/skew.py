"""Skew-mitigation operators.

AQE's skew-join splitting handles JOIN skew automatically; AGGREGATION
skew (one hot group key swamping a reducer) needs the classic salt
two-phase shape, provided here as a reusable operator. At 100 TB a hot key
(e.g. one dominant language or event_type) otherwise serializes the whole
stage behind one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
    salt_col: str = "_salt",
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials by key.
    The caller supplies RE-AGGREGATABLE expressions: ``aggs`` maps output
    column name -> phase-1 aggregate; phase 2 re-applies sum/max/min by
    name convention (sum for sums/counts, max/min preserved).

    Only decomposable aggregates (sum, count, min, max) are supported —
    exactly the ones that survive a two-phase split. The salt is derived
    from a hash of the full row's partition id + monotonic id, so it needs
    no data column.
    """
    salted = df.withColumn(salt_col, (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets)
    phase1 = salted.groupBy(*key_cols, salt_col).agg(
        *[expr.alias(f"_p1_{name}") for name, expr in aggs.items()]
    )
    # merge partials: sums/counts add, min/max re-apply.
    # Column.toString() drops the DISTINCT qualifier (countDistinct prints
    # as plain count and would silently overcount), so DISTINCT is probed
    # on the unresolved expression node itself.
    merged = []
    for name, expr in aggs.items():
        if _is_distinct(expr):
            raise ValueError(
                f"salted_agg cannot merge DISTINCT aggregates (per-salt distinct "
                f"counts overlap); got {expr._jc.toString()!r} for {name!r}"
            )
        fn_name = expr._jc.toString().lower()  # e.g. "sum(x)" / "count(1)"
        src = F.col(f"_p1_{name}")
        # match "min(" not "min": min_by/max_by print as "min_by(x, y)"
        # and are NOT decomposable (merging per-salt min_by partials with
        # a plain min returns the wrong row's value) — they must fall
        # through to the refuse-loudly branch
        if fn_name.startswith("min("):
            merged.append(F.min(src).alias(name))
        elif fn_name.startswith("max("):
            merged.append(F.max(src).alias(name))
        elif fn_name.startswith(
            # paren-anchored for the same reason: count_min_sketch( etc.
            # must not ride the "count" prefix into a sum-merge — the
            # cast-wrapped variants need the anchor too, or
            # "cast(count_min_sketch(..." rides "cast(count" into the
            # sum branch instead of the refuse-loudly error; count_if
            # partials ARE decomposable (a sum of indicators re-sums)
            ("sum(", "count(", "count_if(", "cast(sum(", "cast(count(", "cast(count_if(")
        ):
            merged.append(F.sum(src).alias(name))
        else:
            # avg/stddev etc. would merge WRONG — refuse loudly
            raise ValueError(
                f"salted_agg only supports decomposable aggregates "
                f"(sum/count/min/max); got {fn_name!r} for {name!r}"
            )
    return phase1.groupBy(*key_cols).agg(*merged)


def _is_distinct(expr: Column) -> bool:
    """True if the aggregate expression carries a DISTINCT qualifier
    anywhere in its unresolved tree.

    A cast-wrapped aggregate (``countDistinct(x).cast("long")``) has a Cast
    root with no ``isDistinct`` — and ``toString()`` DROPS the qualifier
    ("CAST(count(x) AS BIGINT)"), so a string search would wave it through
    and the sum-merge branch would silently overcount. Walk the node tree
    instead; any node whose distinctness cannot be positively determined
    makes the whole expression indeterminate → raise, never guess."""

    def probe(node) -> bool:
        distinct = None
        try:
            distinct = bool(node.isDistinct())
        except Exception:  # noqa: BLE001 — node type without the accessor
            pass
        if distinct:
            return True
        try:
            children = node.children()
            n = children.size()
        except Exception as e:  # noqa: BLE001
            if distinct is None:
                raise ValueError(
                    f"salted_agg cannot determine DISTINCT-ness of expression "
                    f"node {node.getClass().getName()}; refusing to merge it"
                ) from e
            return False
        return any(probe(children.apply(i)) for i in range(n))

    return probe(expr._jc.node())
