"""Round-3 late additions, registered LAST (outside the round-3 driver
window — the local gate covers them now; round 4's rotation front-loads
them for driver verdicts).

- dup_span_coverage: cross-document duplicate-span metric from the
  dedup literature (Lee et al. 2022, "Deduplicating Training Data Makes
  Language Models Better"): fraction of a doc's 8-token spans that occur
  in at least one other document — the observability step before an
  ExactSubstr-style dedup.
- winsorize_event_values: percentile-based outlier clamping report, the
  numeric-cleaning twin of the text quality rules. Spark ``percentile``
  and DuckDB ``quantile_cont`` both linear-interpolate over the sorted
  values and agree bit-for-bit on this data (verified), so the bounds
  join the oracle unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..llmops.dedup import tokens_col
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "dup_span_coverage",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               array_to_string(toks[CAST(i AS INT):CAST(i + 7 AS INT)], ' ') AS gram
        FROM t, unnest(range(1, len(toks) - 6)) AS r(i)
        WHERE len(toks) >= 8
    ),
    df AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1)
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
           CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS dup_frac
    FROM g JOIN df USING (gram) GROUP BY g.doc_id
    """,
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a doc's
    8-token spans (all positions, overlapping) that appear in ≥2 distinct
    documents. Inverted-index shape: explode spans → distinct-doc count
    per gram (vocabulary-bounded) → join back per position — the same
    gram-blocked plan as eval-set decontamination, never doc×doc."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col("text").alias("toks")).filter(
        F.size("toks") >= 8
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 7),
        lambda i: F.concat_ws(" ", F.slice("toks", i, 8)),
    )
    g = toks.select("doc_id", F.explode(grams).alias("gram"))
    nd = (
        g.distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    dup = (F.col("nd") >= 2).cast("long")
    return (
        g.join(nd, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(dup).alias("dup_spans"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_frac"),
        )
    )


@register(
    "winsorize_event_values",
    oracle="""
    WITH q AS (
        SELECT event_type, quantile_cont(value, 0.01) AS p01,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY 1
    )
    SELECT e.event_type, q.p01, q.p99,
           CAST(SUM(CASE WHEN e.value < q.p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN e.value > q.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN q USING (event_type)
    GROUP BY 1, 2, 3
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier clamping report per event type: exact p01/p99 bounds
    (linear-interpolated percentile — engine-identical, verified) and how
    many values each bound would clamp. Exact percentile implies a
    per-group sort: fine for bounded group counts; at 100 TB swap in
    approx_percentile and document the error budget (the approx_stats
    pattern in analytics2)."""
    ev = _t(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.sum((F.col("value") < F.col("p01")).cast("long")).alias("n_low"),
            F.sum((F.col("value") > F.col("p99")).cast("long")).alias("n_high"),
            F.count(F.lit(1)).alias("n"),
        )
    )
