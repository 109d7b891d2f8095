"""applyInPandasWithState operator: per-key state accumulates across
micro-batches and final totals equal the batch aggregate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table, table_path
from convex_batch_processor_spark.streaming.stateful import running_totals_per_key


def test_stateful_running_totals_match_batch(spark, sf_dir, tmp_path):
    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    os.symlink(table_path(sf_dir, "events"), src_dir / "events.parquet")

    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .select("user_id", "value")
    )
    out = running_totals_per_key(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted row per key = final running totals
    rows = spark.sql(
        """SELECT user_id, total_count, total_value FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY total_count DESC) rn
               FROM state_out) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: (r.total_count, r.total_value) for r in rows}

    batch = load_table(spark, sf_dir, "events")
    expected = {
        r.user_id: (r.n, r.v)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, (n, v) in expected.items():
        gn, gv = got[uid]
        assert gn == n
        assert abs(gv - v) < 0.05  # float fold order differs slightly from SQL sum
