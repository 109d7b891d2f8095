"""Post-window round-4 additions, part 9 (round-5 rotation material):
catalog column-statistics profiling.

Registered last in queries/__init__.py (after llm15); oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

# the profiled surface: a static (table -> columns) map shared by the
# Spark side and the generated oracle so they cannot drift
_PROFILE_COLS: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    "lineitem": ["l_orderkey", "l_quantity", "l_discount", "l_returnflag"],
    "events": ["event_id", "user_id", "event_type", "value"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "label"],
}


def _profile_oracle() -> str:
    parts = []
    for table, cols in _PROFILE_COLS.items():
        for c in cols:
            parts.append(
                f"SELECT '{table}' AS table_name, '{c}' AS column_name, "
                f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
                f"CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT) AS n_null, "
                f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM {table}"
            )
    return " UNION ALL ".join(parts)


@register("catalog_stats_profile", oracle=_profile_oracle())
def catalog_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog column statistics: (rows, nulls, distinct) for every
    profiled column of every core table — the table-stats surface a cost
    model / data catalog (ANALYZE TABLE) maintains, and the first thing a
    new consumer of the dataset asks for.

    ONE pass per table: all of a table's per-column aggregates (null
    counts + distinct counts) run in a single aggregation job, then
    unpivot to (table, column, ...) rows driver-free via an inline
    explode of a struct array — at 100 TB that is T scans total, not
    T x C. (Multiple COUNT(DISTINCT)s expand the aggregate buffer per
    distinct column — the documented cost of exact NDV; swap in
    approx_count_distinct/HLL at petascale, as llmops.sketches does.)

    The profiled column map is one static dict rendered into BOTH the
    Spark plan and the oracle SQL, so the two cannot drift."""
    outs = []
    for table, cols in _PROFILE_COLS.items():
        df = load_table(spark, sf_dir, table)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs.append(F.count_if(F.col(c).isNull()).alias(f"z__{c}"))
            aggs.append(F.countDistinct(F.col(c)).alias(f"d__{c}"))
        one = df.agg(*aggs)
        structs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"z__{c}").alias("n_null"),
                    F.col(f"d__{c}").alias("n_distinct"),
                )
                for c in cols
            ]
        )
        outs.append(
            one.select(
                F.lit(table).alias("table_name"),
                F.col("n_rows"),
                F.explode(structs).alias("s"),
            ).select(
                "table_name",
                F.col("s.column_name").alias("column_name"),
                "n_rows",
                F.col("s.n_null").alias("n_null"),
                F.col("s.n_distinct").alias("n_distinct"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
