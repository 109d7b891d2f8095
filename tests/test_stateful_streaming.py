"""applyInPandasWithState operator: per-key state accumulates across
micro-batches and final totals equal the batch aggregate."""

from __future__ import annotations

import pytest

# slow tier: excluded from the default run (pytest.ini); run with -m ""
pytestmark = pytest.mark.slow

import os

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table, table_path
from convex_batch_processor_spark.streaming.stateful import (
    NULL_ID_SENTINEL,
    running_totals_per_key,
)


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


def test_gap_sessions_event_time_timeout(spark, tmp_path):
    """Session machine (applyInPandasWithState + EventTimeTimeout):
    in-batch gaps close sessions immediately; cross-batch continuations
    merge through the state store; the trailing open session emits exactly
    once when the WATERMARK passes last-event+gap; a session the watermark
    never passes stays un-emitted."""
    import time

    from convex_batch_processor_spark.streaming.stateful import gap_sessions_per_key

    minute = 60_000_000  # micros
    t0 = 1_700_000_000_000_000

    def file_rows(path, *rows):  # (user, ts_us, value)
        spark.createDataFrame(
            list(rows), "user_id long, ts_us long, value double"
        ).coalesce(1).write.parquet(path)

    src = tmp_path / "sess_src"
    src.mkdir()
    # batch 1: user1 session A (3 events); user2 two sessions in ONE batch
    # (in-batch gap of 35m > 30m closes the first immediately). Max event
    # +40m keeps the watermark at +30m — later batches are never late.
    file_rows(
        str(src / "f1"),
        (1, t0, 1.0),
        (1, t0 + 10 * minute, 2.0),
        (1, t0 + 20 * minute, 3.0),
        (2, t0 + 5 * minute, 10.0),
        (2, t0 + 40 * minute, 20.0),
    )
    # batch 2: user1 session B starts (2h after A -> A closes via timeout
    # once the watermark moves, B continues cross-batch into f3)
    file_rows(str(src / "f2"), (1, t0 + 140 * minute, 4.0))
    # batch 3: B's second event + a far-future sentinel that drags the
    # watermark past every other session's timeout
    file_rows(
        str(src / "f3"),
        (1, t0 + 150 * minute, 5.0),
        (99, t0 + 1000 * minute, 0.5),
    )
    now = time.time()
    for d, age in (("f1", 120), ("f2", 60), ("f3", 0)):
        for fn in os.listdir(src / d):
            if fn.endswith(".parquet"):
                os.utime(src / d / fn, (now - age, now - age))

    stream = (
        spark.readStream.schema("user_id long, ts_us long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "10 minutes")
    )
    out = gap_sessions_per_key(stream, gap_ms=30 * 60_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_state_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM sess_state_out").collect()
    sessions = {(r.user_id, r.t_start_us): (r.n_events, r.t_end_us, r.session_value) for r in rows}
    assert len(rows) == len(sessions)  # each session emitted exactly once
    # user1 A: 3 events closed by timeout after batch 2/3 watermark moves
    assert sessions[(1, t0)] == (3, t0 + 20 * minute, 6.0)
    # user1 B: cross-batch merge (f2+f3), closed by the sentinel's watermark
    assert sessions[(1, t0 + 140 * minute)] == (2, t0 + 150 * minute, 9.0)
    # user2: first session closed IN-BATCH by the 35-minute gap
    assert sessions[(2, t0 + 5 * minute)] == (1, t0 + 5 * minute, 10.0)
    # user2's second session: timeout at +70m <= final watermark (+990m) -> emitted
    assert sessions[(2, t0 + 40 * minute)] == (1, t0 + 40 * minute, 20.0)
    # the sentinel's own session: watermark never passes it -> still open
    assert (99, t0 + 1000 * minute) not in sessions


def test_scd2_stream_matches_batch_closed_intervals(spark, sf_dir, tmp_path):
    """Differential: streaming SCD2 over the events table (two time-split
    micro-batches) emits exactly the batch scd2_user_state query's CLOSED
    intervals (is_current = false); open versions stay in state."""
    import pyspark.sql.functions as F

    from convex_batch_processor_spark.catalog import load_table
    from convex_batch_processor_spark.queries import QUERIES
    from convex_batch_processor_spark.streaming.stateful import (
        scd2_closed_intervals_per_key,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_type",
        "event_id",
    )
    cut = ev.agg(F.expr("percentile(ts_us, 0.5)")).first()[0]

    src = tmp_path / "scd2_src"
    src.mkdir()
    # earlier-half file first (earlier mtime -> processed first); the time
    # split keeps per-key order across batches
    ev.filter(F.col("ts_us") <= cut).coalesce(1).write.parquet(str(src / "a"))
    ev.filter(F.col("ts_us") > cut).coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        scd2_closed_intervals_per_key(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("scd2_out")
        .option("checkpointLocation", str(tmp_path / "scd2_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r.user_id, r.version, r.state, r.valid_from_us, r.valid_to_us)
        for r in spark.sql("SELECT * FROM scd2_out").collect()
    }
    expected = {
        (r.user_id, r.version, r.state, r.from_us, r.to_us)
        for r in QUERIES["scd2_user_state"]
        .fn(spark, sf_dir)
        .filter(~F.col("is_current"))
        .select(
            "user_id",
            "version",
            "state",
            F.unix_micros("valid_from").alias("from_us"),
            F.unix_micros("valid_to").alias("to_us"),
        )
        .collect()
    }
    assert got == expected
    assert len(got) > 0


def _run_chart(spark, batches, tmp_path, name, **kw):
    """Write id-ordered batches as files, stream them one per trigger."""
    import pandas as pd  # noqa: F401

    from convex_batch_processor_spark.streaming.stateful import control_chart_per_key

    src = tmp_path / f"src_{name}"
    schema = "user_id long, event_id long, value double"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        control_chart_per_key(stream, **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {
        r.event_id: (r.mean_before, r.std_before, r.zscore, r.is_alert)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_control_chart_alerts_and_split_invariance(spark, tmp_path):
    """A spike after a stable history must alert; scores must be
    identical however the (id-ordered) stream is cut into batches; and
    nothing is emitted before min_history observations."""
    base = [(1, i, 10.0 + (0.2 if i % 2 else -0.2)) for i in range(1, 9)]
    spike = [(1, 9, 250.0), (1, 10, 10.1)]
    rows = base + spike

    one = _run_chart(spark, [rows], tmp_path, "chart_one", min_history=5)
    many = _run_chart(
        spark, [rows[:3], rows[3:7], rows[7:]], tmp_path, "chart_many", min_history=5
    )
    assert one == many
    assert set(one) == {6, 7, 8, 9, 10}  # first 5 observations build history
    assert one[9][3] is True  # the spike alerts
    assert all(not one[e][3] for e in (6, 7, 8))  # stable history stays quiet
    # after the spike enters history, the next normal point must NOT alert
    assert one[10][3] is False


def test_control_chart_zero_variance_history(spark, tmp_path):
    """Constant history (std = 0) must not divide by zero; z is pinned 0."""
    rows = [(2, i, 5.0) for i in range(1, 8)]
    out = _run_chart(spark, [rows], tmp_path, "chart_const", min_history=5)
    assert all(z == 0.0 and not alert for (_, _, z, alert) in out.values())


def _run_bucket(spark, batches, tmp_path, name, **kw):
    from convex_batch_processor_spark.streaming.stateful import token_bucket_per_key

    src = tmp_path / f"src_{name}"
    schema = "user_id long, event_id long, ts_us long"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        token_bucket_per_key(stream, **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {
        r.event_id: (r.allowed, r.tokens_after)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_token_bucket_admission_and_split_invariance(spark, tmp_path):
    """capacity 2, refill 0.5/s, events 1 s apart: burst drains the
    bucket, refill readmits exactly when a full token accrues; and the
    decision sequence is identical however the ordered stream is cut."""
    sec = 1_000_000
    rows = [(1, i, i * sec) for i in range(1, 9)]
    kw = dict(capacity=2.0, refill_per_s=0.5)
    one = _run_bucket(spark, [rows], tmp_path, "tb_one", **kw)
    many = _run_bucket(spark, [rows[:2], rows[2:5], rows[5:]], tmp_path, "tb_many", **kw)
    assert one == many
    # t=1: 2.0 -> allow (1.0); t=2: +0.5 = 1.5 -> allow (0.5);
    # t=3: 1.0 -> allow (0.0); t=4: 0.5 -> deny; t=5: 1.0 -> allow (0.0);
    # t=6: 0.5 deny; t=7: 1.0 allow; t=8: 0.5 deny
    assert [one[i][0] for i in range(1, 9)] == [
        True, True, True, False, True, False, True, False,
    ]


def test_token_bucket_out_of_order_timestamp_never_refunds(spark, tmp_path):
    """A late event with an EARLIER timestamp gets no refill credit
    (last_us is monotone) — time cannot run backwards for the bucket."""
    rows = [(2, 1, 10_000_000), (2, 2, 5_000_000), (2, 3, 10_500_000)]
    out = _run_bucket(
        spark, [rows], tmp_path, "tb_ooo", capacity=1.0, refill_per_s=1.0
    )
    assert out[1][0] is True
    assert out[2][0] is False  # no refill from the past
    assert out[3][0] is False  # only 0.5 s elapsed since last_us=10s


def test_token_bucket_fractional_refill_accrues_full_token(spark, tmp_path):
    """Review r6: ten 1-second refills at 0.1 tokens/s sum to
    0.9999999999999999 in binary floating point — the admission epsilon
    must treat that as the full token it nominally is (an exact >= 1.0
    comparison silently rejected exact-rate traffic)."""
    sec = 1_000_000
    rows = [(3, 1, 0)] + [(3, i, (i - 1) * sec) for i in range(2, 12)]
    out = _run_bucket(
        spark, [rows], tmp_path, "tb_frac", capacity=1.0, refill_per_s=0.1
    )
    assert out[1][0] is True  # burst drains the single token
    assert all(out[i][0] is False for i in range(2, 11))  # still accruing
    assert out[11][0] is True  # 10 x 0.1 nominally = 1.0 -> admit


def test_gap_sessions_late_event_lowers_session_start(spark, tmp_path):
    """Review r6: a cross-batch LATE event (within the watermark) that
    precedes the open session's first event must lower t_start_us — the
    batch sessionize twin reports the true earliest timestamp, and the
    merge previously only max'd the end."""
    import time as _time

    from convex_batch_processor_spark.streaming.stateful import gap_sessions_per_key

    minute = 60_000_000
    t0 = 1_700_000_000_000_000

    def file_rows(path, *rows):
        spark.createDataFrame(
            list(rows), "user_id long, ts_us long, value double"
        ).coalesce(1).write.parquet(path)

    src = tmp_path / "late_src"
    src.mkdir()
    # batch 1: session opens at +20m (watermark after batch: +10m)
    file_rows(str(src / "f1"), (1, t0 + 20 * minute, 1.0))
    # batch 2: LATE event at +19m — within the 10m watermark, same session
    file_rows(str(src / "f2"), (1, t0 + 19 * minute, 2.0))
    # batch 3: far-future sentinel closes the session via timeout
    file_rows(str(src / "f3"), (99, t0 + 1000 * minute, 0.5))
    now = _time.time()
    for d, age in (("f1", 120), ("f2", 60), ("f3", 0)):
        for fn in os.listdir(src / d):
            if fn.endswith(".parquet"):
                os.utime(src / d / fn, (now - age, now - age))

    stream = (
        spark.readStream.schema("user_id long, ts_us long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        gap_sessions_per_key(stream, gap_ms=30 * 60_000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_late_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for r in spark.sql("SELECT * FROM late_sess_out").collect() if r.user_id == 1]
    assert len(rows) == 1
    sess = rows[0]
    assert sess.n_events == 2
    assert sess.t_start_us == t0 + 19 * minute  # the late event's ts
    assert sess.t_end_us == t0 + 20 * minute


def test_gap_sessions_late_event_before_open_session_splits(spark, tmp_path):
    """A cross-batch LATE event (within the watermark) arriving more than
    gap BEFORE the open session's earliest event must form its own
    already-closed session — the batch sessionize twin splits there. The
    old append-only merge loop bridged ANY backward gap (ts - end is
    negative, never > gap), silently merging an hour-early event into a
    60s-gap session."""
    import time

    from convex_batch_processor_spark.streaming.stateful import gap_sessions_per_key

    minute = 60_000_000  # micros
    t0 = 1_700_000_000_000_000

    def file_rows(path, *rows):
        spark.createDataFrame(
            list(rows), "user_id long, ts_us long, value double"
        ).coalesce(1).write.parquet(path)

    src = tmp_path / "late_src"
    src.mkdir()
    # batch 1: open session at +120m; sentinel at +200m holds the
    # watermark at +140m, so a +60m event in batch 2 is NOT late-dropped
    file_rows(
        str(src / "f1"),
        (1, t0 + 120 * minute, 1.0),
        (99, t0 + 200 * minute, 0.25),
    )
    # batch 2: late event 60m BEFORE the open session start (gap 30m) —
    # must close as its own past session, not merge
    file_rows(str(src / "f2"), (1, t0 + 60 * minute, 2.0))
    # batch 3: far-future sentinel closes everything via the watermark
    file_rows(str(src / "f3"), (98, t0 + 2000 * minute, 0.5))
    now = time.time()
    for d, age in (("f1", 120), ("f2", 60), ("f3", 0)):
        for fn in os.listdir(src / d):
            if fn.endswith(".parquet"):
                os.utime(src / d / fn, (now - age, now - age))

    stream = (
        spark.readStream.schema("user_id long, ts_us long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withWatermark("ts", "60 minutes")
    )
    out = gap_sessions_per_key(stream, gap_ms=30 * 60_000)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_late_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM sess_late_out WHERE user_id = 1").collect()
    sessions = {r.t_start_us: (r.n_events, r.t_end_us, r.session_value) for r in rows}
    # two distinct sessions: the late past one AND the original open one
    assert sessions.get(t0 + 60 * minute) == (1, t0 + 60 * minute, 2.0)
    assert sessions.get(t0 + 120 * minute) == (1, t0 + 120 * minute, 1.0)


def _run_dedup_stream(spark, batches, tmp_path, name, op):
    """Write batches as one parquet file each, stream one per trigger
    through ``op``, return the memory-sink rows."""
    src = tmp_path / f"src_{name}"
    schema = "event_id long, ts timestamp, user_id long"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        op(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_dedup_within_watermark_drops_in_horizon_duplicates(spark, tmp_path):
    """Redelivered rows (same event_id, inside the watermark horizon) are
    dropped; the surviving set equals the batch dropDuplicates — the
    retried-addItems ingest contract."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import (
        dedup_within_watermark,
    )

    t = lambda m: datetime(2024, 1, 1, 10, m)  # noqa: E731
    first = [(i, t(i), 100 + i) for i in range(1, 6)]
    # a retry redelivers 2 and 3 (later ts, same key) and adds 6
    retry = [(2, t(7), 102), (3, t(8), 103), (6, t(9), 106)]
    rows = _run_dedup_stream(
        spark, [first, retry], tmp_path, "dedup_wm",
        lambda s: dedup_within_watermark(s, ["event_id"], "ts", "1 day"),
    )
    got = sorted((r.event_id, r.user_id) for r in rows)
    assert got == [(1, 101), (2, 102), (3, 103), (4, 104), (5, 105), (6, 106)]


def test_dedup_within_watermark_split_invariance(spark, tmp_path):
    """The surviving KEY set must not depend on how the source batches
    are split across micro-batches (duplicates always inside the
    horizon)."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import (
        dedup_within_watermark,
    )

    t = lambda m: datetime(2024, 1, 1, 12, m)  # noqa: E731
    all_rows = [
        (1, t(0), 1), (2, t(1), 2), (1, t(2), 3), (3, t(3), 4),
        (2, t(4), 5), (4, t(5), 6), (1, t(6), 7), (5, t(7), 8),
    ]
    op = lambda s: dedup_within_watermark(s, ["event_id"], "ts", "1 day")  # noqa: E731
    one = _run_dedup_stream(spark, [all_rows], tmp_path, "dedup_one", op)
    split = _run_dedup_stream(
        spark, [all_rows[:3], all_rows[3:6], all_rows[6:]], tmp_path,
        "dedup_split", op,
    )
    assert sorted(r.event_id for r in one) == [1, 2, 3, 4, 5]
    assert sorted(r.event_id for r in split) == sorted(r.event_id for r in one)
    # within one micro-batch the FIRST arrival wins (1 -> user 1)
    assert {r.event_id: r.user_id for r in one}[1] == 1


def test_dedup_audit_counts_and_first_wins(spark, tmp_path):
    """The audit operator emits every arrival with its running count:
    exactly one is_first row per key, duplicate totals match the input
    multiset, and the epoch-1 winner is stable under re-splitting of
    LATER epochs."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import dedup_audit_per_key

    t = lambda m: datetime(2024, 1, 2, 9, m)  # noqa: E731
    e1 = [(10, t(0), 5), (11, t(1), 6), (10, t(2), 7)]  # 10 dup within epoch
    e2 = [(10, t(3), 8), (11, t(4), 9), (12, t(5), 1)]
    rows = _run_dedup_stream(
        spark, [e1, e2], tmp_path, "dedup_audit", dedup_audit_per_key
    )
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r.event_id, []).append(r)
    assert {k: len(v) for k, v in by_key.items()} == {10: 3, 11: 2, 12: 1}
    for k, v in by_key.items():
        assert sorted(r.n_seen for r in v) == list(range(1, len(v) + 1))
        assert sum(r.is_first for r in v) == 1
        # every audit row carries the winner
        assert len({r.first_user_id for r in v}) == 1
    # within epoch 1, key 10's rows sort by user_id -> winner is user 5
    assert by_key[10][0].first_user_id == 5
    # the deduped stream is exactly the is_first rows
    assert sorted(r.event_id for r in rows if r.is_first) == [10, 11, 12]


def test_dedup_audit_null_user_id_counts_as_sentinel(spark, tmp_path):
    """ADVICE r9: a NULL user_id row must not crash the query (pandas
    surfaces it as NaN; int(NaN) raised ValueError). It still counts in
    the audit under the int64-MIN sentinel and sorts FIRST within its epoch
    (the pinned NULLS FIRST ordering), so it can win first-seen."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import dedup_audit_per_key

    t = lambda m: datetime(2024, 1, 4, 7, m)  # noqa: E731
    e1 = [(10, t(0), 7), (10, t(1), None), (11, t(2), 6)]
    e2 = [(10, t(3), 3)]
    rows = _run_dedup_stream(
        spark, [e1, e2], tmp_path, "dedup_audit_null", dedup_audit_per_key
    )
    k10 = sorted((r for r in rows if r.event_id == 10), key=lambda r: r.n_seen)
    # all three arrivals counted; the NULL (int64-MIN sentinel) sorts first in
    # epoch 1 and wins first-seen, carried by every audit row
    assert [r.n_seen for r in k10] == [1, 2, 3]
    assert {r.first_user_id for r in k10} == {NULL_ID_SENTINEL}
    assert [r.is_first for r in k10] == [True, False, False]
    assert [r.first_user_id for r in rows if r.event_id == 11] == [6]


def test_dedup_audit_state_survives_query_restart(spark, tmp_path):
    """The audit state (n_seen, first winner) must recover from the
    checkpoint across a query restart — a redelivery arriving after a
    crash still counts against the original, and the winner never
    flips. Memory sink can't recover checkpoints (NOTES), so this
    collects via foreachBatch across two availableNow runs."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import dedup_audit_per_key

    t = lambda m: datetime(2024, 1, 3, 8, m)  # noqa: E731
    schema = "event_id long, ts timestamp, user_id long"
    src = tmp_path / "dedup_restart_src"
    src.mkdir()
    spark.createDataFrame(
        [(10, t(0), 5), (10, t(1), 7), (11, t(2), 6)], schema
    ).coalesce(1).write.parquet(str(src / "a"))

    emitted: list = []

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        q = (
            dedup_audit_per_key(stream)
            .writeStream.foreachBatch(
                lambda df, eid: emitted.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "dedup_restart_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()  # epoch 1 builds state
    assert sorted((r.event_id, r.n_seen) for r in emitted) == [
        (10, 1), (10, 2), (11, 1)]
    spark.createDataFrame(
        [(10, t(9), 8), (12, t(10), 1)], schema
    ).coalesce(1).write.parquet(str(src / "b"))
    run()  # restart: recovered state continues the counts
    post = [r for r in emitted[3:]]
    got = {(r.event_id): (r.n_seen, r.first_user_id, r.is_first) for r in post}
    assert got[10] == (3, 5, False)  # counted against the ORIGINAL; winner stable
    assert got[12] == (1, 1, True)


def _run_topk_stream(spark, batches, tmp_path, name, k=3):
    """Write batches as one parquet file each, stream one per trigger
    through topk_per_key_stream, return the memory-sink rows."""
    from convex_batch_processor_spark.streaming.stateful import (
        topk_per_key_stream,
    )

    src = tmp_path / f"src_{name}"
    schema = "user_id long, event_id long, ts timestamp, value double"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        topk_per_key_stream(stream, k=k)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _replay_board(rows, k):
    """Reconstruct the final per-key board from the emitted admit log."""
    boards: dict = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.n_seen)):
        if r.admitted:
            b = boards.setdefault(r.user_id, [])
            b.append((r.value, r.event_id))
            b.sort(key=lambda t: (-t[0], t[1]))
            del b[k:]
    return boards


def test_topk_stream_matches_batch_topk(spark, tmp_path):
    """The final board reconstructed from the admit log equals the batch
    top-k over all arrivals (exactness of k-slot maintenance), and every
    arrival row is emitted with its running n_seen."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 5, 9, m)  # noqa: E731
    e1 = [(1, 10, t(0), 5.0), (1, 11, t(1), 7.0), (1, 12, t(2), 3.0),
          (2, 20, t(3), 1.0)]
    e2 = [(1, 13, t(4), 6.0), (1, 14, t(5), 2.0), (1, 15, t(6), 9.0),
          (2, 21, t(7), 4.0)]
    rows = _run_topk_stream(spark, [e1, e2], tmp_path, "topk_eq", k=3)
    assert len(rows) == 8
    boards = _replay_board(rows, 3)
    # batch truth: top-3 by (value desc, event_id asc)
    allrows = e1 + e2
    for uid in (1, 2):
        truth = sorted(
            ((v, eid) for u, eid, _ts, v in allrows if u == uid),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        assert boards[uid] == truth, uid
    # the value that never reached the board was not admitted
    by_eid = {r.event_id: r for r in rows}
    assert by_eid[14].admitted is False  # 2.0 vs board (9,7,6... ) at its time
    assert by_eid[12].admitted is True   # board not yet full at arrival
    # kth_value is NULL while the board is underfull
    assert by_eid[20].kth_value is None
    assert by_eid[15].kth_value == 6.0   # after 9.0 admits: board 9,7,6


def test_topk_stream_split_invariance(spark, tmp_path):
    """The admitted/kth sequence must not depend on how arrivals split
    across micro-batches when (ts, event_id) order is respected."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 6, 8, m)  # noqa: E731
    allrows = [
        (1, 30 + i, t(i), float(v))
        for i, v in enumerate([4, 8, 1, 6, 6, 9, 2, 7])
    ]
    one = _run_topk_stream(spark, [allrows], tmp_path, "topk_one", k=3)
    split = _run_topk_stream(
        spark, [allrows[:3], allrows[3:5], allrows[5:]], tmp_path,
        "topk_split", k=3,
    )
    key = lambda r: (r.event_id, r.admitted, r.kth_value, r.n_seen)  # noqa: E731
    assert sorted(map(key, one)) == sorted(map(key, split))


def test_topk_stream_null_value_counts_but_never_admits(spark, tmp_path):
    """A NULL value row is observed (n_seen advances) but cannot admit,
    and must not crash the updater."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 7, 7, m)  # noqa: E731
    e1 = [(1, 40, t(0), 5.0), (1, 41, t(1), None), (1, 42, t(2), 6.0)]
    rows = _run_topk_stream(spark, [e1], tmp_path, "topk_null", k=2)
    by_eid = {r.event_id: r for r in rows}
    assert by_eid[41].admitted is False and by_eid[41].value is None
    assert [by_eid[i].n_seen for i in (40, 41, 42)] == [1, 2, 3]
    assert by_eid[42].kth_value == 5.0  # board (6, 5) after eid 42


def test_topk_stream_state_survives_query_restart(spark, tmp_path):
    """The board recovers from the checkpoint across a restart: a value
    below the recovered kth is rejected, one above is admitted."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import (
        topk_per_key_stream,
    )

    t = lambda m: datetime(2024, 1, 8, 6, m)  # noqa: E731
    schema = "user_id long, event_id long, ts timestamp, value double"
    src = tmp_path / "topk_restart_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, 50, t(0), 9.0), (1, 51, t(1), 7.0)], schema
    ).coalesce(1).write.parquet(str(src / "a"))

    emitted: list = []

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        q = (
            topk_per_key_stream(stream, k=2)
            .writeStream.foreachBatch(
                lambda df, eid: emitted.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "topk_restart_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()  # board = (9, 7)
    spark.createDataFrame(
        [(1, 52, t(9), 6.0), (1, 53, t(10), 8.0)], schema
    ).coalesce(1).write.parquet(str(src / "b"))
    run()  # recovered board rejects 6.0, admits 8.0
    by_eid = {r.event_id: r for r in emitted}
    assert by_eid[52].admitted is False
    assert by_eid[53].admitted is True and by_eid[53].kth_value == 8.0
    assert by_eid[53].n_seen == 4


def test_topk_stream_null_ts_sorts_first_deterministically(spark, tmp_path):
    """A NULL-ts arrival must process FIRST within its epoch regardless
    of partition order (a raw tuple sort leaves NaT in place), and a
    (ts, event_id)-unique stream with NULL values must never reach a
    None-vs-float comparison."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 9, 5, m)  # noqa: E731
    # NULL-ts row carries the highest value: processed first -> it seeds
    # the board, so the later 4.0 row sees kth after it
    e1 = [(1, 61, t(1), 4.0), (1, 60, None, 9.0), (1, 62, t(2), None)]
    rows = _run_topk_stream(spark, [e1], tmp_path, "topk_nullts", k=2)
    by_eid = {r.event_id: r for r in rows}
    assert by_eid[60].n_seen == 1  # NULLS FIRST
    assert by_eid[61].n_seen == 2 and by_eid[61].admitted is True
    assert by_eid[62].n_seen == 3 and by_eid[62].admitted is False
    assert by_eid[61].kth_value == 4.0  # board (9, 4) once 61 lands


def test_topk_stream_null_key_group_emits_null_user_id(spark, tmp_path):
    """NULL-key rows form their own group and must not crash int(None);
    the emitted user_id is NULL."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 10, 4, m)  # noqa: E731
    e1 = [(None, 70, t(0), 5.0), (1, 71, t(1), 6.0)]
    rows = _run_topk_stream(spark, [e1], tmp_path, "topk_nullkey", k=2)
    by_eid = {r.event_id: r for r in rows}
    assert by_eid[70].user_id is None and by_eid[70].admitted is True
    assert by_eid[71].user_id == 1


def test_topk_stream_null_event_id_maps_to_sentinel(spark, tmp_path):
    """ADVICE r10: a NULL event_id surfaces as NaN in pandas and
    int(NaN) would kill the query — it must map to NULL_ID_SENTINEL
    (int64 MIN, the dedup_audit treatment; ADVICE r11 retired the old
    -1, which a producer could legitimately emit), still count in
    n_seen, and be able to admit under the board order."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 12, 2, m)  # noqa: E731
    e1 = [(1, 95, t(0), 5.0), (1, None, t(1), 7.0), (1, 96, t(2), 6.0)]
    rows = _run_topk_stream(spark, [e1], tmp_path, "topk_nulleid", k=2)
    by_eid = {r.event_id: r for r in rows}
    assert set(by_eid) == {95, NULL_ID_SENTINEL, 96}
    nul = by_eid[NULL_ID_SENTINEL]
    assert nul.admitted is True and nul.value == 7.0
    assert [by_eid[i].n_seen for i in (95, NULL_ID_SENTINEL, 96)] == [1, 2, 3]
    # final board: 7.0 (sentinel) and 6.0 beat 5.0
    assert _replay_board(rows, 2) == {1: [(7.0, NULL_ID_SENTINEL), (6.0, 96)]}


def test_topk_stream_null_event_id_ties_are_split_invariant(spark, tmp_path):
    """Two NULL-event_id arrivals tying on ts share the sentinel, so
    the within-epoch sort must fall through to the VALUE key — the
    admitted/kth sequence must not depend on Arrow batch order (i.e. on
    how the source files split)."""
    from datetime import datetime

    t0 = datetime(2024, 1, 13, 1, 0)
    a = (1, None, t0, 7.0)
    b = (1, None, t0, 5.0)
    one = _run_topk_stream(spark, [[a, b]], tmp_path, "topk_nulltie1", k=1)
    other = _run_topk_stream(spark, [[b, a]], tmp_path, "topk_nulltie2", k=1)
    key = lambda r: (r.value, r.admitted, r.kth_value, r.n_seen)  # noqa: E731
    assert sorted(map(key, one)) == sorted(map(key, other))
    # and the order is the pinned one: value NULLS-FIRST ascending ->
    # 5.0 processes first (admits), then 7.0 evicts it
    by_val = {r.value: r for r in one}
    assert by_val[5.0].n_seen == 1 and by_val[5.0].admitted is True
    assert by_val[7.0].n_seen == 2 and by_val[7.0].admitted is True


def test_topk_stream_boundary_tie_admits_smaller_event_id(spark, tmp_path):
    """A later arrival TYING the kth's value admits iff its event_id is
    smaller (the board's (value DESC, event_id ASC) total order) — so
    the final board equals the batch top-k even with ties at the
    boundary (admission by value alone would wrongly reject it)."""
    from datetime import datetime

    t = lambda m: datetime(2024, 1, 11, 3, m)  # noqa: E731
    e1 = [(1, 85, t(0), 7.0), (1, 83, t(1), 7.0), (1, 90, t(2), 7.0)]
    rows = _run_topk_stream(spark, [e1], tmp_path, "topk_tie", k=1)
    by_eid = {r.event_id: r for r in rows}
    assert by_eid[85].admitted is True     # board fills
    assert by_eid[83].admitted is True     # ties value, smaller id wins
    assert by_eid[90].admitted is False    # ties value, larger id loses
    assert _replay_board(rows, 1) == {1: [(7.0, 83)]}  # == batch top-1


# --- streaming strict-order funnel -------------------------------------------


def _run_funnel_stream(spark, batches, tmp_path, name):
    """Write batches as one parquet file each, stream one per trigger
    through funnel_stage_stream, return the memory-sink rows."""
    from convex_batch_processor_spark.streaming.stateful import (
        funnel_stage_stream,
    )

    src = tmp_path / f"src_{name}"
    schema = "user_id long, event_id long, ts timestamp, event_type string"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        funnel_stage_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _batch_funnel_stage(events):
    """Python replay of funnel_conversion's MIN-per-stage strict-> CTEs
    (queries/llm4.py): events = [(ts, event_type)]."""
    t_prev, stage = None, 0
    for want in ("view", "click", "purchase"):
        cand = [
            ts for ts, et in events
            if et == want and ts is not None
            and (t_prev is None or ts > t_prev)
        ]
        if not cand:
            break
        t_prev = min(cand)
        stage += 1
    return stage


def test_funnel_stream_matches_batch_funnel(spark, tmp_path):
    """The final stage per user equals the batch funnel_conversion
    semantics (greedy in-ts-order advancement == MIN-per-stage with
    strict >), including an equal-ts non-advance and out-of-order stage
    events."""
    from datetime import datetime

    t = lambda m: datetime(2024, 2, 1, 9, m)  # noqa: E731
    rows = [
        # user 1: full conversion, with a click BEFORE its view (ignored)
        (1, 1, t(0), "click"), (1, 2, t(1), "view"),
        (1, 3, t(2), "click"), (1, 4, t(3), "purchase"),
        # user 2: click ties the view ts exactly -> strict > rejects it;
        # a later click advances
        (2, 5, t(1), "view"), (2, 6, t(1), "click"), (2, 7, t(2), "click"),
        # user 3: non-stage noise only
        (3, 8, t(0), "signup"), (3, 9, t(1), "error"),
    ]
    got = _run_funnel_stream(spark, [rows], tmp_path, "funnel_eq")
    final = {}
    for r in sorted(got, key=lambda r: (r.user_id, r.n_seen)):
        final[r.user_id] = r.stage_after
    by_user: dict = {}
    for u, _e, ts, et in rows:
        by_user.setdefault(u, []).append((ts, et))
    for u, evs in by_user.items():
        assert final[u] == _batch_funnel_stage(evs), u
    # the tied click did NOT advance; the later one did
    by_eid = {r.event_id: r for r in got}
    assert by_eid[6].advanced is False and by_eid[7].advanced is True
    # the pre-view click emitted stage 0, not an advance
    assert by_eid[1].advanced is False and by_eid[1].stage_after == 0


def test_funnel_stream_split_invariance(spark, tmp_path):
    """The advanced/stage sequence must not depend on how arrivals split
    across micro-batches when (ts, event_id) order is respected."""
    from datetime import datetime

    t = lambda m: datetime(2024, 2, 2, 8, m)  # noqa: E731
    rows = [
        (1, 10, t(0), "view"), (1, 11, t(1), "click"),
        (1, 12, t(2), "purchase"), (1, 13, t(3), "view"),
        (2, 14, t(0), "view"), (2, 15, t(1), "purchase"),
    ]
    one = _run_funnel_stream(spark, [rows], tmp_path, "funnel_one")
    split = _run_funnel_stream(
        spark, [rows[:2], rows[2:4], rows[4:]], tmp_path, "funnel_split"
    )
    key = lambda r: (r.event_id, r.stage_after, r.advanced, r.n_seen)  # noqa: E731
    assert sorted(map(key, one)) == sorted(map(key, split))
    # skipping a stage never advances: user 2's purchase at stage 1
    by_eid = {r.event_id: r for r in one}
    assert by_eid[15].advanced is False and by_eid[15].stage_after == 1


def test_funnel_stream_null_hardening(spark, tmp_path):
    """NULL ts never advances (the batch MIN ignores NULLs) but counts;
    NULL event_id maps to the int64-MIN sentinel; NULL keys form their own
    group; NULL event_type is non-stage noise."""
    from datetime import datetime

    t = lambda m: datetime(2024, 2, 3, 7, m)  # noqa: E731
    rows = [
        (1, 20, None, "view"),      # NULL ts: no advance
        (1, 21, t(1), "view"),      # advances
        (1, None, t(2), "click"),   # NULL event_id: sentinel, advances
        (None, 22, t(0), "view"),   # NULL key group
        (1, 23, t(3), None),        # NULL event_type: noise
    ]
    got = _run_funnel_stream(spark, [rows], tmp_path, "funnel_null")
    by_eid = {(r.user_id, r.event_id): r for r in got}
    assert by_eid[(1, 20)].advanced is False
    assert by_eid[(1, 21)].advanced is True
    s_key = (1, NULL_ID_SENTINEL)
    assert by_eid[s_key].advanced is True and by_eid[s_key].stage_after == 2
    assert by_eid[(None, 22)].user_id is None
    assert by_eid[(None, 22)].advanced is True  # its own funnel
    assert by_eid[(1, 23)].advanced is False and by_eid[(1, 23)].stage_after == 2


def test_funnel_stream_state_survives_query_restart(spark, tmp_path):
    """The reached-stage list recovers from the checkpoint across a
    restart: a click arriving in the second run advances only because
    the first run's view is in recovered state (memory sink can't
    recover checkpoints — collect via foreachBatch, the topk restart
    pattern)."""
    from datetime import datetime

    from convex_batch_processor_spark.streaming.stateful import (
        funnel_stage_stream,
    )

    t = lambda m: datetime(2024, 2, 4, 6, m)  # noqa: E731
    schema = "user_id long, event_id long, ts timestamp, event_type string"
    src = tmp_path / "funnel_restart_src"
    src.mkdir()
    emitted: list = []

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        q = (
            funnel_stage_stream(stream)
            .writeStream.foreachBatch(
                lambda df, eid: emitted.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "funnel_restart_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(1, 30, t(0), "view")], schema
    ).coalesce(1).write.parquet(str(src / "a"))
    run()  # stage 1 reached
    spark.createDataFrame(
        [(1, 31, t(1), "click")], schema
    ).coalesce(1).write.parquet(str(src / "b"))
    run()  # recovered state advances to stage 2
    by_eid = {r.event_id: r for r in emitted}
    assert by_eid[30].advanced is True and by_eid[30].stage_after == 1
    assert by_eid[31].advanced is True and by_eid[31].stage_after == 2
    assert by_eid[31].n_seen == 2
