"""operators/rank.histogram_rank — bit-equivalence to the global-window
rank it replaces, both directions, plus the no-global-corpus-window plan
contract (the query-level pins live in test_plans.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table
from convex_batch_processor_spark.operators.rank import histogram_rank


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("n_chars", "doc_id")


def test_histogram_rank_matches_global_window_asc(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    w = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    expect = docs.withColumn("rnk", F.row_number().over(w).cast("long"))
    got = histogram_rank(docs, "n_chars", "doc_id")
    assert got.count() == expect.count()
    assert (
        got.select("doc_id", "rnk")
        .exceptAll(expect.select("doc_id", "rnk"))
        .count()
        == 0
    )


def test_histogram_rank_matches_global_window_desc(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    expect = docs.withColumn("rnk", F.row_number().over(w).cast("long"))
    got = histogram_rank(docs, "n_chars", "doc_id", ascending=False)
    assert (
        got.select("doc_id", "rnk")
        .exceptAll(expect.select("doc_id", "rnk"))
        .count()
        == 0
    )


def test_histogram_rank_heavy_ties(spark):
    """One value owning most rows (the skew case the partitioned tiebreak
    window must absorb) still ranks exactly."""
    rows = [(1, i) for i in range(50)] + [(0, 100), (2, 101), (2, 102)]
    df = spark.createDataFrame(rows, "v int, id int")
    got = {
        r["id"]: r["rnk"]
        for r in histogram_rank(df, "v", "id").collect()
    }
    assert got[100] == 1  # v=0 first
    assert [got[i] for i in range(50)] == list(range(2, 52))  # the tie block
    assert (got[101], got[102]) == (52, 53)
