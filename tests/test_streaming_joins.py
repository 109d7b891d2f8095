"""Stream-stream interval join (errors → subsequent clicks within 2 h per
user) run as a real Structured Streaming job must equal the identical
batch plan — same builder, batch inputs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table, table_path
from convex_batch_processor_spark.streaming.joins import interval_join


def _split(events):
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return errors, clicks


def _rows(df_rows):
    return {(r.user_id, r.err_id, r.click_id) for r in df_rows}


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    os.symlink(table_path(sf_dir, "events"), src_dir / "events.parquet")

    stream = (
        spark.readStream.schema(spark.read.parquet(table_path(sf_dir, "events")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    joined = interval_join(
        *_split(stream), key="user_id", left_ts="err_ts", right_ts="click_ts",
        upper="2 hours", watermark="1 hour",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = _rows(spark.sql("SELECT * FROM ssj_out").collect())

    batch = _rows(
        interval_join(
            *_split(load_table(spark, sf_dir, "events")),
            key="user_id", left_ts="err_ts", right_ts="click_ts",
            upper="2 hours", watermark="1 hour",
        ).collect()
    )
    assert streamed == batch
    assert len(batch) > 0  # the fixture interval actually matches pairs


def test_interval_join_requires_distinct_ts_names(spark, sf_dir):
    import pytest

    events = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="distinct names"):
        interval_join(events, events, key="user_id", left_ts="ts", right_ts="ts")
