"""Stream-stream interval join (errors → subsequent clicks within 2 h per
user) run as a real Structured Streaming job must equal the identical
batch plan — same builder, batch inputs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table, table_path, normalize_ts
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
        .transform(lambda d: normalize_ts(d, "ts"))
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


def test_left_outer_interval_join_emits_unmatched_after_watermark(spark, tmp_path):
    """Outer stream-stream semantics: an error with NO click in its
    interval must still emit (null click side) — but only once the
    watermark PROVES no match can arrive. The final sentinel batch pushes
    the watermark past every open interval; without it the unmatched rows
    would sit in state forever."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)

    src = tmp_path / "src"
    src.mkdir()

    def stage(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))

    # user 1: error with a click 10 min later (matched)
    # user 2: error with no click at all (must emit with nulls)
    stage(
        [
            (1, 1, "error", t0),
            (2, 1, "click", t0 + 10 * m),
            (3, 2, "error", t0),
        ]
    )

    stream = spark.readStream.schema(schema).parquet(str(src))
    errors = stream.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = interval_join(
        errors, clicks, key="user_id", left_ts="err_ts", right_ts="click_ts",
        upper="30 minutes", watermark="10 minutes", how="leftOuter",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    # Sentinels far in the future finalize user 2's unmatched error. Two
    # subtleties this test exists to document: the join watermark is the
    # MIN across BOTH input streams (a sentinel on only one side leaves
    # the global watermark pinned by the other), and a new watermark takes
    # effect in the NEXT micro-batch — hence two sentinel rounds.
    stage([(98, 9, "error", t0 + 600 * m), (99, 9, "click", t0 + 600 * m)])
    q.processAllAvailable()
    stage([(100, 9, "error", t0 + 601 * m), (101, 9, "click", t0 + 601 * m)])
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM ssj_outer").collect()
    got = {(r.user_id, r.err_id, r.click_id) for r in rows}
    assert (1, 1, 2) in got          # matched pair
    assert (2, 3, None) in got       # unmatched error emitted with null click


def test_interval_join_outer_rows_keep_their_key(spark):
    """Review r6: under right/full outer, a right-only row has l.key
    NULL — the old drop(r.key) emitted it with NO key at all, so the
    consumer couldn't tell which key went unmatched. The coalesced key
    column must survive on both null-extended sides. (Batch mode: the
    builder is watermark-transparent, same plan as streaming.)"""
    from convex_batch_processor_spark.streaming.joins import interval_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "err")], "k int, l_ts string, l_what string"
    ).withColumn("l_ts", F.col("l_ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(2, "2024-01-01 10:05:00", "click")], "k int, r_ts string, r_what string"
    ).withColumn("r_ts", F.col("r_ts").cast("timestamp"))

    out = interval_join(left, right, "k", "l_ts", "r_ts", how="full_outer")
    rows = {r.k: r for r in out.collect()}
    assert set(rows) == {1, 2}  # both keys present, neither NULL
    assert rows[1].l_what == "err" and rows[1].r_what is None
    assert rows[2].r_what == "click" and rows[2].l_what is None
    assert out.columns == ["k", "l_ts", "l_what", "r_ts", "r_what"]


def test_interval_join_semi_and_anti_emit_left_side_only(spark):
    """ADVICE r7: semi/anti joins emit ONLY left-side columns — the
    coalesce/select projection referenced r-side columns that don't
    exist in their output and raised AnalysisException. The builder must
    return the bare join for these types (batch mode: the builder is
    watermark-transparent, same plan as streaming)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "err"),
         (2, "2024-01-01 11:00:00", "err")],
        "k int, l_ts string, l_what string",
    ).withColumn("l_ts", F.col("l_ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", "click")],
        "k int, r_ts string, r_what string",
    ).withColumn("r_ts", F.col("r_ts").cast("timestamp"))

    semi = interval_join(left, right, "k", "l_ts", "r_ts", how="left_semi")
    assert semi.columns == ["k", "l_ts", "l_what"]
    assert [r.k for r in semi.collect()] == [1]

    anti = interval_join(left, right, "k", "l_ts", "r_ts", how="left_anti")
    assert anti.columns == ["k", "l_ts", "l_what"]
    assert [r.k for r in anti.collect()] == [2]

    # Spark's join-type parsing is case/underscore-insensitive — the
    # guard must match it, not just the lowercase spellings
    upper = interval_join(left, right, "k", "l_ts", "r_ts", how="LEFT_SEMI")
    assert upper.columns == ["k", "l_ts", "l_what"]
    assert [r.k for r in upper.collect()] == [1]


def test_interval_join_rejects_shared_non_key_columns(spark, sf_dir):
    """Both sides' columns appear verbatim in the output projection; a
    shared non-key name would build fine and then fail far downstream
    with AMBIGUOUS_REFERENCE — the join must fail fast instead."""
    import pytest

    left = spark.createDataFrame(
        [], "user_id long, l_ts timestamp, value double"
    )
    right = spark.createDataFrame(
        [], "user_id long, r_ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="shared non-key"):
        interval_join(left, right, key="user_id", left_ts="l_ts",
                      right_ts="r_ts", upper="10 minutes",
                      watermark="10 minutes")


def test_interval_join_semi_anti_allow_shared_non_key_columns(spark):
    """ADVICE r8: semi/anti joins emit ONLY left-side columns, so a
    shared non-key name is harmless there — the fail-fast guard must not
    fire (it regressed previously-working semi/anti calls)."""
    import pytest
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 11:00:00", 2.0)],
        "k int, l_ts string, value double",
    ).withColumn("l_ts", F.col("l_ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 9.0)],
        "k int, r_ts string, value double",  # 'value' shared with left
    ).withColumn("r_ts", F.col("r_ts").cast("timestamp"))

    semi = interval_join(left, right, "k", "l_ts", "r_ts", how="LEFT_SEMI")
    assert semi.columns == ["k", "l_ts", "value"]
    assert [r.k for r in semi.collect()] == [1]

    anti = interval_join(left, right, "k", "l_ts", "r_ts", how="left_anti")
    assert anti.columns == ["k", "l_ts", "value"]
    assert [r.k for r in anti.collect()] == [2]

    # non-semi/anti types with shared names must still fail fast
    with pytest.raises(ValueError, match="shared non-key"):
        interval_join(left, right, "k", "l_ts", "r_ts", how="inner")
