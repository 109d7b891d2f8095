"""Post-window round-4 additions, part 53 (round-5 rotation material):
v-optimal histogram construction — the query-optimizer infrastructure
operator (Jagadish et al., VLDB'98).

A v-optimal histogram partitions the sorted value domain into B
buckets minimizing total within-bucket variance (SSE) — the histogram
a cost-based optimizer wants for selectivity estimation. The classic
dynamic program E[i][k] = min_j E[j][k-1] + SSE(j+1..i) runs here on
the BOUNDED value histogram (the engine's recurring discipline: row
data is touched once for the (value, count) aggregate; the DP's
O(m^2 B) work lives on ~50 positions), with segment SSE in closed form
from exact integer prefix moments and every DP cell 9-dp-pinned so the
unrolled-CTE oracle replays the recursion exactly.

``voptimal_cost_curve`` emits E[m][k] for k = 1..B — the error-vs-
buckets curve that picks the bucket budget; ``equiwidth_vs_voptimal``
prices naive equal-width bucketing against the optimum.

Registered last in queries/__init__.py (after llm59); oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

_B = 6  # bucket budget

# (value, count) histogram with exact integer prefix moments; a j = 0
# sentinel row gives segments starting at the first position.
_PFX_SQL = """
    hist AS (
        -- NULL quantities carry no value information for a histogram and
        -- would shift every prefix position differently per engine
        -- (Spark windows sort NULLS FIRST, DuckDB NULLS LAST)
        SELECT CAST(l_quantity AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1),
    pos AS (
        SELECT v, c, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS i,
               CAST(SUM(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p1,
               CAST(SUM(c * v) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pv,
               CAST(SUM(c * v * v) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pv2
        FROM hist),
    pfx AS (
        SELECT i, p1, pv, pv2 FROM pos
        UNION ALL SELECT 0, 0, 0, 0),
    seg AS MATERIALIZED (
        SELECT a.i AS j, b.i AS i,
               round((CAST(b.pv2 - a.pv2 AS DOUBLE))
                     - ((CAST(b.pv - a.pv AS DOUBLE) * CAST(b.pv - a.pv AS DOUBLE))
                        / CAST(b.p1 - a.p1 AS DOUBLE)), 9) AS s9
        FROM pfx a JOIN pfx b ON b.i > a.i),
    mx AS (SELECT CAST(MAX(i) AS BIGINT) AS m FROM pos)
"""


def _dp_round_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS MATERIALIZED (
        SELECT seg.i, MIN(round({prev}.e + seg.s9, 9)) AS e
        FROM {prev} JOIN seg ON seg.j = {prev}.i
        GROUP BY 1)"""


_DP_CHAIN = ",\n    ".join(_dp_round_sql(f"e{k - 1}", f"e{k}") for k in range(2, _B + 1))

_CURVE_UNION = "\n    UNION ALL ".join(
    f"SELECT {k} AS n_buckets, e{k}.e AS sse FROM e{k} CROSS JOIN mx WHERE e{k}.i = mx.m"
    for k in range(1, _B + 1)
)


def _dp_tables(spark: SparkSession, sf_dir: str):
    """(hist, seg persisted, mx) — the bounded DP inputs shared by both
    queries."""
    li = load_table(spark, sf_dir, "lineitem")
    # NULL quantities excluded on BOTH sides: Spark's NULLS FIRST vs
    # DuckDB's NULLS LAST would otherwise shift every prefix moment
    hist = (
        li.filter(F.col("l_quantity").isNotNull())
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pos = hist.select(
        "v",
        "c",
        F.row_number().over(Window.orderBy("v")).cast("long").alias("i"),
        F.sum("c").over(wcum).cast("long").alias("p1"),
        F.sum(F.col("c") * F.col("v")).over(wcum).cast("long").alias("pv"),
        F.sum(F.col("c") * F.col("v") * F.col("v")).over(wcum).cast("long").alias(
            "pv2"
        ),
    )
    zero = pos.sparkSession.createDataFrame(
        [(0, 0, 0, 0)], "i long, p1 long, pv long, pv2 long"
    )
    pfx = pos.select("i", "p1", "pv", "pv2").unionByName(zero)
    a = pfx.select(
        F.col("i").alias("j"),
        F.col("p1").alias("ap1"),
        F.col("pv").alias("apv"),
        F.col("pv2").alias("apv2"),
    )
    b = pfx.select("i", "p1", "pv", "pv2")
    seg = (
        a.crossJoin(b)
        .filter(F.col("i") > F.col("j"))
        .select(
            "j",
            "i",
            F.round(
                (F.col("pv2") - F.col("apv2")).cast("double")
                - (
                    (
                        (F.col("pv") - F.col("apv")).cast("double")
                        * (F.col("pv") - F.col("apv")).cast("double")
                    )
                    / (F.col("p1") - F.col("ap1")).cast("double")
                ),
                9,
            ).alias("s9"),
        )
        .persist()  # every DP round reuses the bounded segment table
    )
    mx = pos.agg(F.max("i").alias("m"))
    return hist, seg, mx


def _dp_round(seg, e):
    prev = e.select(F.col("i").alias("j"), F.col("e").alias("pe"))
    return (
        seg.join(prev, "j")
        .groupBy("i")
        .agg(F.min(F.round(F.col("pe") + F.col("s9"), 9)).alias("e"))
    )


@register(
    "voptimal_cost_curve",
    oracle=f"""
    WITH {_PFX_SQL},
    e1 AS MATERIALIZED (SELECT i, s9 AS e FROM seg WHERE j = 0),
    {_DP_CHAIN}
    SELECT n_buckets, round(sse, 6) AS sse FROM ({_CURVE_UNION})
    """,
)
def voptimal_cost_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-optimal histogram cost curve: the minimum total within-bucket
    SSE achievable with k = 1..{_B} buckets over the quantity domain —
    the exact DP every selectivity-estimation histogram paper builds
    on, and the curve that justifies a bucket budget (diminishing
    returns are visible directly).

    Segment SSE is closed-form from exact integer prefix moments
    (sum, sum v, sum v^2); DP cells are 9-dp-pinned doubles; the
    recursion unrolls to {_B - 1} CTE rounds over the ~m^2/2 segment
    table.

    Scale: one corpus aggregation to the value histogram; the DP is
    m^2 B on ~50 positions — control-plane sized forever (a domain with
    millions of distinct values first collapses through a coarse
    histogram, as the literature prescribes)."""
    _hist, seg, mx = _dp_tables(spark, sf_dir)
    e = seg.filter(F.col("j") == 0).select("i", F.col("s9").alias("e"))
    curve = e.join(F.broadcast(mx), e["i"] == mx["m"]).select(
        F.lit(1).alias("n_buckets"), F.col("e").alias("sse")
    )
    for k in range(2, _B + 1):
        e = _dp_round(seg, e)
        curve = curve.unionByName(
            e.join(F.broadcast(mx), e["i"] == mx["m"]).select(
                F.lit(k).alias("n_buckets"), F.col("e").alias("sse")
            )
        )
    return curve.select("n_buckets", F.round(F.col("sse"), 6).alias("sse"))


@register(
    "equiwidth_vs_voptimal",
    oracle=f"""
    WITH {_PFX_SQL},
    e1 AS MATERIALIZED (SELECT i, s9 AS e FROM seg WHERE j = 0),
    {_DP_CHAIN},
    opt AS (
        SELECT e{_B}.e AS sse_opt FROM e{_B} CROSS JOIN mx WHERE e{_B}.i = mx.m),
    vr AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM hist),
    ew AS (
        SELECT least({_B} - 1,
                     CAST(floor((CAST(h.v - vr.lo AS DOUBLE) * {_B})
                                / CAST(vr.hi - vr.lo + 1 AS DOUBLE)) AS INTEGER))
                   AS bucket,
               CAST(SUM(h.c) AS BIGINT) AS n,
               CAST(SUM(h.c * h.v) AS BIGINT) AS sv,
               CAST(SUM(h.c * h.v * h.v) AS BIGINT) AS sv2
        FROM hist h CROSS JOIN vr GROUP BY 1),
    eqs AS (
        SELECT CAST(SUM(CAST(round(CAST(sv2 AS DOUBLE)
                   - ((CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                      / CAST(n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS DOUBLE)
               AS sse_equi
        FROM ew)
    SELECT round(opt.sse_opt, 6) AS sse_opt,
           round(eqs.sse_equi, 6) AS sse_equi,
           -- sse_opt is exactly 0 whenever the domain has <= bucket-budget
           -- distinct values (every value isolated); ANSI Spark would
           -- throw DIVIDE_BY_ZERO where DuckDB returns NULL, so both
           -- sides guard explicitly
           CASE WHEN round(opt.sse_opt, 6) > 0 THEN
               round(round(eqs.sse_equi, 6) / round(opt.sse_opt, 6), 9)
           END AS ratio
    FROM opt CROSS JOIN eqs
    """,
)
def equiwidth_vs_voptimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much better the v-optimal partition is than naive equal-width
    bucketing at the same budget ({_B} buckets): total SSE of each,
    plus the ratio — the number that justifies spending DP time on
    optimizer histograms.

    Equal-width SSE reuses the same closed-form moment identity per
    bucket (9-dp terms summed as exact decimals); the optimum is the
    k = {_B} point of the DP.

    Scale: identical to voptimal_cost_curve."""
    hist, seg, mx = _dp_tables(spark, sf_dir)
    e = seg.filter(F.col("j") == 0).select("i", F.col("s9").alias("e"))
    for _k in range(2, _B + 1):
        e = _dp_round(seg, e)
    opt = e.join(F.broadcast(mx), e["i"] == mx["m"]).select(
        F.round(F.col("e"), 6).alias("sse_opt")
    )
    vr = hist.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    bucket = F.least(
        F.lit(_B - 1),
        F.floor(
            ((F.col("v") - F.col("lo")).cast("double") * _B)
            / (F.col("hi") - F.col("lo") + 1).cast("double")
        ).cast("int"),
    )
    ew = (
        hist.crossJoin(F.broadcast(vr))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.col("c") * F.col("v")).cast("long").alias("sv"),
            F.sum(F.col("c") * F.col("v") * F.col("v")).cast("long").alias("sv2"),
        )
    )
    term = F.round(
        F.col("sv2").cast("double")
        - (
            (F.col("sv").cast("double") * F.col("sv").cast("double"))
            / F.col("n").cast("double")
        ),
        9,
    ).cast("decimal(28,9)")
    eqs = ew.agg(F.sum(term).cast("double").alias("sse_equi"))
    return (
        opt.crossJoin(F.broadcast(eqs))
        .select(
            F.col("sse_opt"),
            F.round(F.col("sse_equi"), 6).alias("sse_equi"),
            F.when(
                F.col("sse_opt") > 0,
                F.round(F.round(F.col("sse_equi"), 6) / F.col("sse_opt"), 9),
            ).alias("ratio"),
        )
    )
