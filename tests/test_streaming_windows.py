"""Streaming execution of the engine's event-time aggregations: the
tumbling-window query from the registry, run as a real Structured Streaming
job (readStream over the events parquet, watermark, memory sink,
AvailableNow) must produce exactly the batch result — micro-batch admission
must not change the aggregate (D1/D3 in streaming form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table, table_path, normalize_ts
from convex_batch_processor_spark.queries import QUERIES


def test_streaming_tumbling_window_equals_batch(spark, sf_dir, tmp_path):
    # file streaming sources need a directory; expose the single-file table
    # through a symlinked dir
    import os

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    os.symlink(table_path(sf_dir, "events"), src_dir / "events.parquet")

    stream = (
        spark.readStream.schema(spark.read.parquet(table_path(sf_dir, "events")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
    )
    # same ns->us normalization the catalog applies
    stream = stream.transform(lambda d: normalize_ts(d, "ts"))

    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in QUERIES["tumbling_window_counts"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_streaming_session_window_equals_batch_sessionize(spark, sf_dir, tmp_path):
    """The streaming form of ``sessionize_events``: session_window(ts, 30d)
    over a multi-file stream must reproduce the batch lag→running-sum
    sessionization exactly — including sessions whose events arrive in
    different micro-batches (state-store session merge)."""
    raw = spark.read.parquet(table_path(sf_dir, "events"))
    src_dir = tmp_path / "events_stream"
    # 4 files -> 4 micro-batches with maxFilesPerTrigger=1, so sessions
    # spanning files exercise cross-batch session merging
    raw.repartition(4).write.parquet(str(src_dir))

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .transform(lambda d: normalize_ts(d, "ts"))
    )
    agg = (
        stream.groupBy(F.session_window("ts", "30 days").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select("user_id", "n_events", "t_start", "t_end", "session_value")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.user_id, r.t_start): (r.n_events, r.t_end, r.session_value)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # batch twin keys sessions by (user_id, session_idx); session_window has
    # no idx, so compare on the natural session identity (user_id, t_start)
    batch = {
        (r.user_id, r.t_start): (r.n_events, r.t_end, r.session_value)
        for r in QUERIES["sessionize_events"].fn(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_approx_sketches_within_error_bounds(spark, sf_dir):
    """approx_count_distinct (HLL++, ~2-5% rsd) and percentile_approx stay
    near the exact values — the contract that lets them replace exact
    distinct/median at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    approx = {r.l_returnflag: r for r in QUERIES["approx_stats"].fn(spark, sf_dir).collect()}
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("d"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("med"),
        )
        .collect()
    }
    for flag, ex in exact.items():
        ap = approx[flag]
        assert abs(ap.approx_parts - ex.d) / ex.d < 0.1
        assert abs(ap.approx_median_price - ex.med) / ex.med < 0.1


def test_streaming_append_watermark_drops_late_events(spark, tmp_path):
    """Append mode + watermark late-data contract (§2.9 D-series in
    streaming form). Spark's guarantee is one-directional: a late row is
    only GUARANTEED dropped once its window's state has been evicted
    (docs: "data older than watermark may or may not be aggregated while
    state is live"). So the scenario is three micro-batches: (1) fill
    windows, (2) advance the watermark past their end — eviction emits
    them exactly once, (3) late rows for an evicted window arrive — they
    must be discarded, never re-opening or re-emitting the window."""
    import os
    import time

    day = 86400
    t0 = 1_600_000_000

    def rows(*secs):
        return spark.createDataFrame(
            [(1, s, 1.0) for s in secs], "user_id long, epoch long, value double"
        ).select("user_id", F.timestamp_seconds("epoch").alias("ts"), "value")

    src_dir = tmp_path / "late_stream"
    src_dir.mkdir()
    # batch 1: 2 events day 1, 3 events day 5
    rows(t0 + 10, t0 + 20, t0 + 4 * day, t0 + 4 * day + 5, t0 + 4 * day + 9).coalesce(
        1
    ).write.parquet(str(src_dir / "f1"))
    # batch 2: day 12 — watermark moves to day 10, evicting+emitting day 1/5
    rows(t0 + 11 * day).coalesce(1).write.parquet(str(src_dir / "f2"))
    # batch 3: 5 LATE day-1 events (evicted window) + 1 fresh day-13 event
    rows(t0 + 30, t0 + 40, t0 + 50, t0 + 60, t0 + 70, t0 + 12 * day).coalesce(
        1
    ).write.parquet(str(src_dir / "f3"))
    # FileStreamSource admits oldest-mtime first; stamp the DATA files so
    # maxFilesPerTrigger=1 yields f1 -> f2 -> f3
    now = time.time()
    for d, age in ((src_dir / "f1", 120), (src_dir / "f2", 60), (src_dir / "f3", 0)):
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                os.utime(d / fn, (now - age, now - age))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    agg = (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("win_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql("SELECT * FROM late_out").collect()
    win_of = lambda s: s - (s % day)  # noqa: E731
    # every window emitted at most once (late rows never re-emit a window)
    assert len({r.win_start for r in out}) == len(out)
    emitted = {r.win_start: r.n for r in out}
    # day-1 window: exactly once, WITHOUT the 5 late events
    assert emitted[win_of(t0)] == 2
    assert emitted[win_of(t0 + 4 * day)] == 3
    # day-12/13 windows never closed -> not emitted
    assert win_of(t0 + 11 * day) not in emitted
    assert win_of(t0 + 12 * day) not in emitted
