"""Post-window round-4 additions, part 52 (round-5 rotation material):
Markov-chain attribution with removal effects.

The second industry-standard data-driven attribution model next to
Shapley (llm55): user journeys define a first-order Markov chain over
channel states; a channel's credit is its REMOVAL EFFECT — how much the
start-to-conversion probability drops when every path through that
channel is severed (its transition mass becomes loss, no
renormalization — the standard definition).

All five chains (full + one per removed channel) iterate TOGETHER on a
(variant, state) table: p_{{t+1}}(v, s) = Sum_s' T_v(s, s') p_t(v, s')
with conversion pinned at 1 — six synchronous rounds over a bounded
state space, the pagerank/kmeans control-plane pattern with 12-dp
decimal contributions and 9-dp state rounding, replayed by unrolled
CTEs. The finite horizon (6 hops) is part of the operator's definition
on both sides.

Registered last in queries/__init__.py (after llm58); oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

_HOPS = 6
_CONV = "purchase"
_REMOVABLE = ["view", "click", "signup", "error"]

# base journey transitions: start -> first event, then consecutive pairs;
# conversion is absorbing (no outgoing rows from it).
_TR_SQL = f"""
    seq AS (
        SELECT user_id, event_type,
               -- NULLS FIRST matches Spark's ASC default; DuckDB's
               -- NULLS LAST would put a NULL-ts event at the journey
               -- end instead of its start
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts NULLS FIRST, event_id)
                   AS prev
        FROM events),
    tr AS (
        SELECT coalesce(prev, 'start') AS src, event_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq
        WHERE coalesce(prev, 'start') <> '{_CONV}'
        GROUP BY 1, 2),
    tw AS (
        SELECT src, dst,
               round(CAST(n AS DOUBLE)
                     / CAST(CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
                            AS DOUBLE), 9) AS w
        FROM tr),
    variants AS (
        SELECT unnest(['none', {", ".join(f"'{c}'" for c in _REMOVABLE)}]) AS v),
    tv AS MATERIALIZED (
        SELECT v, src, dst, w FROM variants CROSS JOIN tw
        WHERE src <> v AND dst <> v),
    states AS MATERIALIZED (
        SELECT DISTINCT v, s FROM (
            SELECT v, src AS s FROM tv
            UNION ALL SELECT v, dst FROM tv))
"""


def _p_iter_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS MATERIALIZED (
        SELECT st.v, st.s,
               CASE WHEN st.s = '{_CONV}' THEN CAST(1.0 AS DOUBLE)
                    ELSE round(CAST(coalesce(sc.c, 0) AS DOUBLE), 9) END AS p
        FROM states st
        LEFT JOIN (
            SELECT tv.v, tv.src AS s,
                   SUM(CAST(round(tv.w * pp.p, 12) AS DECIMAL(18,12))) AS c
            FROM tv JOIN {prev} pp ON pp.v = tv.v AND pp.s = tv.dst
            GROUP BY 1, 2) sc
          ON sc.v = st.v AND sc.s = st.s)"""


_P_CHAIN = ",\n    ".join(_p_iter_sql(f"p{t - 1}", f"p{t}") for t in range(1, _HOPS + 1))


@register(
    "markov_removal_attribution",
    oracle=f"""
    WITH {_TR_SQL},
    p0 AS MATERIALIZED (
        SELECT v, s,
               CASE WHEN s = '{_CONV}' THEN CAST(1.0 AS DOUBLE) ELSE 0.0 END AS p
        FROM states),
    {_P_CHAIN},
    conv AS (
        SELECT v, p AS p_conv FROM p{_HOPS} WHERE s = 'start'),
    base AS (SELECT p_conv AS p_full FROM conv WHERE v = 'none')
    SELECT conv.v AS removed_channel, round(conv.p_conv, 9) AS p_conv,
           -- p_full = 0 (no journey converts within the hop budget) makes
           -- the removal effect undefined: NULL on both engines instead of
           -- an ANSI DIVIDE_BY_ZERO crash on the Spark side
           CASE WHEN conv.v = 'none' THEN 0.0
                WHEN base.p_full <> 0
                    THEN round(1.0 - (conv.p_conv / base.p_full), 9) END
               AS removal_effect
    FROM conv CROSS JOIN base
    """,
)
def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution: the probability of reaching
    conversion within {_HOPS} hops from 'start', for the full journey
    chain and for each single-channel-removed chain (severed mass is
    lost, per the standard model); a channel's removal effect
    1 - p_removed/p_full is its share of the conversion machinery.

    Transition weights are 9-dp probability rounds over exact counts;
    all five chains iterate together on the bounded (variant, state)
    table with 12-dp decimal contributions — six unrolled rounds, the
    pagerank recipe.

    Scale: one user-keyed window builds the transition aggregate; the
    iterations never touch row data again."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    tr = (
        seq.select(
            F.coalesce(F.col("prev"), F.lit("start")).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .filter(F.col("src") != _CONV)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    tw = tr.select(
        "src",
        "dst",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(wsrc).cast("long").cast("double"),
            9,
        ).alias("w"),
    )
    variants = spark.createDataFrame(
        [("none",)] + [(c,) for c in _REMOVABLE], "v string"
    )
    tv = (
        variants.crossJoin(tw)
        .filter((F.col("src") != F.col("v")) & (F.col("dst") != F.col("v")))
        .persist()  # every iteration reuses the bounded edge table
    )
    states = (
        tv.select("v", F.col("src").alias("s"))
        .unionAll(tv.select("v", F.col("dst").alias("s")))
        .distinct()
        .persist()
    )
    p = states.select(
        "v",
        "s",
        F.when(F.col("s") == _CONV, F.lit(1.0)).otherwise(F.lit(0.0)).alias("p"),
    )
    for _ in range(_HOPS):
        prev = p.select(
            F.col("v").alias("pv"), F.col("s").alias("pdst"), F.col("p").alias("pp")
        )
        contrib = (
            tv.join(
                prev, (F.col("pv") == tv["v"]) & (tv["dst"] == F.col("pdst"))
            )
            .select(
                tv["v"].alias("v"),
                tv["src"].alias("s"),
                F.round(tv["w"] * F.col("pp"), 12)
                .cast("decimal(18,12)")
                .alias("c"),
            )
            .groupBy("v", "s")
            .agg(F.sum("c").alias("c"))
        )
        p = states.join(contrib, ["v", "s"], "left").select(
            "v",
            "s",
            F.when(F.col("s") == _CONV, F.lit(1.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("c"), F.lit(0).cast("decimal(18,12)")).cast(
                        "double"
                    ),
                    9,
                )
            )
            .alias("p"),
        )
    conv = p.filter(F.col("s") == "start").select(
        "v", F.col("p").alias("p_conv")
    )
    base = conv.filter(F.col("v") == "none").select(
        F.col("p_conv").alias("p_full")
    )
    return conv.crossJoin(F.broadcast(base)).select(
        F.col("v").alias("removed_channel"),
        F.round(F.col("p_conv"), 9).alias("p_conv"),
        F.when(F.col("v") == "none", F.lit(0.0))
        .when(
            F.col("p_full") != 0,
            F.round(F.lit(1.0) - (F.col("p_conv") / F.col("p_full")), 9),
        )
        .alias("removal_effect"),
    )
