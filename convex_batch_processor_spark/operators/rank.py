"""Distributed exact global ranking — no corpus-scale single-partition sort.

``row_number() OVER (ORDER BY value, tiebreak)`` is exact but plans a
single-partition WindowExec: every row moves through one task. The
two-phase histogram form computes the identical rank scalably:

    rank(row) = (# rows whose value sorts strictly before row's value)
              + row_number within the row's value group (tiebreak order)

Phase 1 is one aggregation shuffle producing the VALUE HISTOGRAM —
``|distinct values|`` rows, value-bounded, not corpus-bounded (document
lengths ≤ max length; term frequencies collapse to ~O(√tokens) distinct
values under a Zipfian corpus). A running sum over that tiny table gives
each value its preceding-row count. Phase 2 ranks inside each value group
with a PARTITIONED window (scalable — hot groups are one value's ties,
spread by the partitioner), then adds the offset via an equi-join that AQE
sizes (broadcast at any realistic histogram size; no forced hint, so an
adversarial all-distinct value column degrades to a shuffle join, never to
an OOM).

The result is bit-identical to the global window whenever the tiebreak is
unique within a value group — the contract the callers (Zipf rank, ntile
curriculum buckets) satisfy with id tiebreaks. Used where the reference
has no counterpart; this is pure Spark scale work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    ascending: bool = True,
    out_col: str = "rnk",
) -> DataFrame:
    """``df`` + ``out_col`` = exact row_number over
    ``(value_col asc|desc, tiebreak_col asc)`` without a global sort.

    The only unpartitioned window runs over the value histogram
    (``(value, count)`` — two scalar columns, value-bounded cardinality);
    plan tests pin that contract.

    NULL values form their own histogram group and rank where Spark's
    row_number would put them (first for ascending, last for
    descending) — the join back is NULL-SAFE, so no row is dropped.
    """
    vorder = F.col(value_col).asc() if ascending else F.col(value_col).desc()
    hist = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    wh = Window.orderBy(vorder).rowsBetween(Window.unboundedPreceding, -1)
    before = hist.select(
        value_col,
        F.coalesce(F.sum("_cnt").over(wh), F.lit(0)).cast("long").alias("_before"),
    )
    wr = Window.partitionBy(value_col).orderBy(F.col(tiebreak_col).asc())
    return (
        df.withColumn("_rin", F.row_number().over(wr))
        # eqNullSafe: a plain equi-join would silently DROP every row
        # whose value is NULL (they still deserve a rank)
        .join(before.withColumnRenamed(value_col, "_hv"),
              F.col(value_col).eqNullSafe(F.col("_hv")))
        .drop("_hv")
        .withColumn(out_col, F.col("_before") + F.col("_rin"))
        .drop("_rin", "_before")
    )
