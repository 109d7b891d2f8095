"""interval_join_bucketed boundary semantics: window edges are (open,
closed], bucket-aligned timestamps land in exactly one bucket, and pairs
are produced exactly once."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from convex_batch_processor_spark.operators.rangejoin import interval_join_bucketed


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_interval_join_window_edges_and_exactly_once(spark):
    delta = 60  # one-minute window, so buckets are minute-aligned
    left = spark.createDataFrame(
        [(1, "u", _ts(0)), (2, "u", _ts(30))], "lid long, k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts(0)),    # == left1 ts: excluded (strict lower bound)
            (11, "u", _ts(60)),   # == left1 + delta exactly: INCLUDED (closed upper)
            (12, "u", _ts(61)),   # just past left1's window; inside left2's
            (13, "u", _ts(91)),   # past both windows (left2 + 61)
            (14, "v", _ts(30)),   # key mismatch
        ],
        "rid long, k string, rts timestamp",
    )
    out = interval_join_bucketed(left, right, ["k"], "lts", "rts", delta)
    pairs = sorted((r.lid, r.rid) for r in out.collect())
    assert pairs == [(1, 11), (2, 11), (2, 12)]
    # exactly-once: no duplicate pairs from the two exploded buckets
    assert len(pairs) == len(set(pairs))


def test_interval_join_differential_vs_naive(spark):
    """Seeded random timelines: the bucketed join must produce exactly the
    pairs of the naive O(n²) definition — every key, every boundary."""
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, rng.choice("abc"), base + dt.timedelta(seconds=rng.randint(0, 600)))
        for i in range(80)
    ]
    rrows = [
        (1000 + i, rng.choice("abc"), base + dt.timedelta(seconds=rng.randint(0, 600)))
        for i in range(80)
    ]
    delta = 45
    expected = sorted(
        (lid, rid)
        for lid, lk, lts in lrows
        for rid, rk, rts in rrows
        if lk == rk and lts < rts <= lts + dt.timedelta(seconds=delta)
    )
    left = spark.createDataFrame(lrows, "lid long, k string, lts timestamp")
    right = spark.createDataFrame(rrows, "rid long, k string, rts timestamp")
    out = interval_join_bucketed(left, right, ["k"], "lts", "rts", delta)
    got = sorted((r.lid, r.rid) for r in out.collect())
    assert got == expected


def test_interval_join_spans_bucket_boundary(spark):
    # left at :50 with delta 60 spans buckets [0,60) and [60,120): a right
    # row at :70 (second bucket) must match via the exploded +1 bucket
    left = spark.createDataFrame([(1, "u", _ts(50))], "lid long, k string, lts timestamp")
    right = spark.createDataFrame([(20, "u", _ts(70))], "rid long, k string, rts timestamp")
    out = interval_join_bucketed(left, right, ["k"], "lts", "rts", 60)
    assert [(r.lid, r.rid) for r in out.collect()] == [(1, 20)]
    # microsecond precision survives the epoch-double comparison
    left2 = spark.createDataFrame(
        [(1, "u", _ts(0).replace(microsecond=1))], "lid long, k string, lts timestamp"
    )
    right2 = spark.createDataFrame(
        [(30, "u", _ts(60)), (31, "u", _ts(60).replace(microsecond=1))],
        "rid long, k string, rts timestamp",
    )
    out2 = interval_join_bucketed(left2, right2, ["k"], "lts", "rts", 60)
    got = sorted(r.rid for r in out2.collect())
    assert got == [30, 31]  # :60.000000 < lts+60 = :60.000001 -> in; :60.000001 == upper -> in


def test_interval_join_bucketed_fractional_delta(spark):
    """Review r6 (confirmed drop): the old seconds-floored bucket key
    divided by a fractional delta could land a true match TWO buckets
    past the left row — micro-second buckets whose width equals the
    window width guarantee lb/lb+1 coverage."""
    from convex_batch_processor_spark.operators.rangejoin import interval_join_bucketed

    left = spark.createDataFrame(
        [(1, 2_600_000)], "k int, l_us long"
    ).withColumn("l_ts", F.timestamp_micros("l_us")).drop("l_us")
    right = spark.createDataFrame(
        [(1, 5_050_000), (1, 5_200_000)], "k int, r_us long"
    ).withColumn("r_ts", F.timestamp_micros("r_us")).drop("r_us")
    out = interval_join_bucketed(left, right, ["k"], "l_ts", "r_ts", delta_s=2.5)
    got = sorted(r.r_ts.microsecond + r.r_ts.second * 1_000_000 for r in out.collect())
    # window is (2.6 s, 5.1 s]: 5.05 s matches, 5.2 s does not
    assert got == [5_050_000]


def test_interval_join_pre_epoch_timestamps(spark):
    """Negative epoch microseconds (pre-1970): the integer floor-div
    bucket key must keep a true match inside {lb, lb+1} — double
    division is exact here, but `div` truncation toward zero would
    shift negative buckets without the mod correction."""
    from convex_batch_processor_spark.operators.rangejoin import interval_join_bucketed

    left = spark.createDataFrame(
        [(1, "1969-12-31 23:59:58")], "id long, lts string"
    ).select("id", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, "1969-12-31 23:59:59"), (1, "1970-01-01 00:00:01"),
         (1, "1969-12-31 23:59:57")],
        "id long, rts string",
    ).select("id", F.col("rts").cast("timestamp").alias("rts"))
    out = interval_join_bucketed(
        left, right, key_cols=["id"], left_ts="lts", right_ts="rts", delta_s=2
    )
    got = sorted(str(r.rts) for r in out.collect())
    # strict (rts > lts) within 2 s: 23:59:59 and 00:00:00 only
    assert got == ["1969-12-31 23:59:59"], got
