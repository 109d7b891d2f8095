"""Incremental materialized-view maintenance: streamed merges equal the
batch aggregate, epochs are idempotent under replay, copy-on-write only
rewrites touched buckets, vacuum drops unreferenced versions."""

from __future__ import annotations

import pytest

# slow tier: excluded from the default run (pytest.ini); run with -m ""
pytestmark = pytest.mark.slow

import os

from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table, table_path
from convex_batch_processor_spark.streaming.matview import IncrementalAggView


def _expected(ev):
    return {
        (r.user_id, r.event_type): (r.n, round(float(r.s), 2), r.mn, r.mx)
        for r in ev.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,2)")).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }


def _got(view):
    return {
        (r.user_id, r.event_type): (r.n_rows, round(float(r.sum_v), 2), r.min_v, r.max_v)
        for r in view.read().collect()
    }


def test_matview_stream_matches_batch_and_replays_idempotently(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["user_id", "event_type"], "value", n_buckets=8
    )

    # three manual epochs over disjoint thirds (the foreachBatch contract)
    full = load_table(spark, sf_dir, "events")
    parts = [
        full.filter(F.col("event_id") % 3 == i).select("user_id", "event_type", "value")
        for i in range(3)
    ]
    for epoch, pdf in enumerate(parts):
        view.foreach_batch(pdf, epoch)

    assert _got(view) == _expected(ev)

    # at-least-once replay: re-delivering epoch 1 must change nothing
    before = _got(view)
    view.foreach_batch(parts[1], 1)
    assert _got(view) == before
    # replay did not fork history: the version set is still {0, 1, 2}
    assert view.committed_versions() == [0, 1, 2]


def test_matview_copy_on_write_rewrites_only_touched_buckets(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["user_id", "event_type"], "value", n_buckets=8
    )
    view.foreach_batch(ev, 0)
    m0 = view._read_manifest(0)

    # epoch 1 touches a single key -> at most one bucket rewritten
    one = ev.limit(1)
    view.foreach_batch(one, 1)
    m1 = view._read_manifest(1)
    moved = [b for b in m1 if m1[b] != m0.get(b)]
    assert len(moved) == 1
    untouched = [b for b in m1 if m1[b] == m0.get(b)]
    assert len(untouched) == len(m1) - 1
    # the untouched buckets' files still live in v=0 (carried by reference)
    v1_dir = os.path.join(str(tmp_path / "view"), "data", "v=1")
    assert len([d for d in os.listdir(v1_dir) if d.startswith("bucket=")]) == 1
    # and the merged view still matches a batch recompute over all rows
    both = ev.unionByName(one)
    assert _got(view) == _expected(both)


def test_matview_time_travel_and_vacuum(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    half = ev.filter(F.col("user_id") % 2 == 0)
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["user_id", "event_type"], "value", n_buckets=8
    )
    view.foreach_batch(half, 0)
    view.foreach_batch(ev.filter(F.col("user_id") % 2 == 1), 1)

    # time travel: v0 sees only the first half's keys
    v0_keys = {(r.user_id, r.event_type) for r in view.read(0).collect()}
    assert all(uid % 2 == 0 for uid, _ in v0_keys)
    assert _got(view) == _expected(ev)

    removed = view.vacuum(keep_versions=1)
    # v0's buckets are all still referenced by v1's manifest (different
    # buckets than epoch 1 touched) unless epoch 1 rewrote them all
    assert view.committed_versions() == [1]
    assert _got(view) == _expected(ev)
    for ver in removed:
        assert not os.path.exists(
            os.path.join(str(tmp_path / "view"), "data", f"v={ver}")
        )


def test_matview_end_to_end_streaming(spark, sf_dir, tmp_path):
    """Real readStream -> foreachBatch wiring: multi-file source, one
    epoch per file, final view equals the batch aggregate."""
    src = tmp_path / "src"
    src.mkdir()
    os.symlink(table_path(sf_dir, "events"), src / "events.parquet")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select("user_id", "event_type", "value")
    )
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["user_id", "event_type"], "value", n_buckets=8
    )
    q = (
        stream.writeStream.foreachBatch(view.foreach_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    assert _got(view) == _expected(ev)


def test_matview_empty_epoch_is_a_noop(spark, sf_dir, tmp_path):
    """An epoch whose delta is empty commits nothing: no version dir, no
    manifest, reads unchanged."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["user_id", "event_type"], "value", n_buckets=8
    )
    view.foreach_batch(ev, 0)
    before = _got(view)
    view.foreach_batch(ev.filter(F.lit(False)), 1)
    assert view.committed_versions() == [0]
    assert _got(view) == before


def test_matview_random_epoch_partition_property(spark, sf_dir, tmp_path):
    """Property: ANY disjoint partition of the input into epochs yields
    the same final state as the batch aggregate (merge associativity)."""
    from hypothesis import given, settings, strategies as st

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    expected = _expected(ev)

    @settings(max_examples=3, deadline=None)  # each example is several Spark jobs
    @given(st.integers(min_value=2, max_value=5), st.integers(min_value=0, max_value=10**6))
    def prop(k, salt):
        import shutil

        root = tmp_path / f"view_{k}_{salt}"
        if root.exists():
            shutil.rmtree(root)
        view = IncrementalAggView(
            spark, str(root), ["user_id", "event_type"], "value", n_buckets=4
        )
        part = F.pmod(F.xxhash64(F.col("event_id") + salt), F.lit(k))
        for epoch in range(k):
            view.foreach_batch(
                ev.filter(part == epoch).select("user_id", "event_type", "value"), epoch
            )
        assert _got(view) == expected

    prop()


def test_matview_replay_after_vacuum_is_safe(spark, sf_dir, tmp_path):
    """The review scenario: epoch commits, vacuum drops older manifests,
    the stream replays the committed epoch — must be a no-op (the commit
    point is the manifest), never a delta-only reset."""
    import pytest

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    h1 = ev.filter(F.col("user_id") % 2 == 0)
    h2 = ev.filter(F.col("user_id") % 2 == 1)
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), ["user_id", "event_type"], "value", n_buckets=8
    )
    view.foreach_batch(h1, 0)
    view.foreach_batch(h2, 1)
    view.vacuum(keep_versions=1)  # drops manifest v0
    before = _got(view)
    view.foreach_batch(h2, 1)  # at-least-once redelivery of committed epoch 1
    assert _got(view) == before
    assert view.committed_versions() == [1]
    # keep_versions=0 would orphan all data behind deleted manifests
    with pytest.raises(ValueError):
        view.vacuum(keep_versions=0)


# --- delta-join view ---------------------------------------------------------


def _jv(spark, tmp_path):
    from convex_batch_processor_spark.streaming.matview import IncrementalJoinView

    return IncrementalJoinView(spark, str(tmp_path / "jv"), "k")


def _rows(df):
    if df is None:
        return []
    return sorted(tuple(r) for r in df.select("k", "av", "bv").collect())


def test_join_view_matches_full_recompute_over_random_epochs(spark, tmp_path):
    """Property: after any append-only epoch sequence, the maintained view
    equals the from-scratch A join B."""
    import random

    rng = random.Random(7)
    jv = _jv(spark, tmp_path)
    for epoch in range(4):
        da = [(rng.randrange(6), f"a{epoch}_{i}") for i in range(rng.randrange(0, 5))]
        db = [(rng.randrange(6), f"b{epoch}_{i}") for i in range(rng.randrange(0, 5))]
        jv.apply_epoch(
            epoch,
            spark.createDataFrame(da or [(99, "pad")], "k int, av string"),
            spark.createDataFrame(db or [(98, "pad")], "k int, bv string"),
        )
    assert _rows(jv.read_view()) == _rows(jv.recompute())
    assert _rows(jv.read_view())  # non-degenerate: some joins happened


def test_join_view_replay_is_idempotent(spark, tmp_path):
    jv = _jv(spark, tmp_path)
    da = spark.createDataFrame([(1, "a1")], "k int, av string")
    db = spark.createDataFrame([(1, "b1")], "k int, bv string")
    jv.apply_epoch(0, da, db)
    before = _rows(jv.read_view())
    jv.apply_epoch(0, da, db)  # committed epoch replays as a no-op
    assert _rows(jv.read_view()) == before == [(1, "a1", "b1")]


def test_join_view_precommit_crash_redo(spark, tmp_path):
    """Epoch dirs written but no manifest (= crash before commit): the
    redo overwrites them and the view converges to the recompute."""
    jv = _jv(spark, tmp_path)
    jv.apply_epoch(0, spark.createDataFrame([(1, "a0")], "k int, av string"),
                   spark.createDataFrame([(1, "b0")], "k int, bv string"))
    da = spark.createDataFrame([(1, "a1")], "k int, av string")
    db = spark.createDataFrame([(2, "b1")], "k int, bv string")
    # simulate the crash: data dirs exist, manifest does not
    da.write.mode("overwrite").parquet(str(tmp_path / "jv" / "a" / "v=1"))
    db.limit(0).write.mode("overwrite").parquet(str(tmp_path / "jv" / "b" / "v=1"))
    assert jv.committed_epochs() == [0]
    jv.apply_epoch(1, da, db)  # redo
    assert _rows(jv.read_view()) == _rows(jv.recompute())
    assert (1, "a1", "b0") in _rows(jv.read_view())


def test_join_view_delta_built_from_persisted_logs(spark, tmp_path):
    """A non-deterministic input (rand payload) must commit ONE set of
    rows: the view delta is built from the persisted a/v=N, b/v=N logs,
    so view == recompute even when re-evaluating the input would yield
    different values."""
    import pyspark.sql.functions as F

    jv = _jv(spark, tmp_path)
    da = (
        spark.range(5)
        .select(
            F.col("id").cast("int").alias("k"),
            F.concat(F.lit("a"), (F.rand() * 1e9).cast("long").cast("string")).alias("av"),
        )
    )
    db = spark.createDataFrame([(i, f"b{i}") for i in range(5)], "k int, bv string")
    jv.apply_epoch(0, da, db)
    logged = sorted(tuple(r) for r in spark.read.parquet(
        str(tmp_path / "jv" / "a" / "v=0")).collect())
    viewed = sorted(tuple(r) for r in jv.read_view().select("k", "av").collect())
    assert viewed == logged  # delta used the committed payloads
    assert _rows(jv.read_view()) == _rows(jv.recompute())


def test_join_view_rejects_ambiguous_columns(spark, tmp_path):
    import pytest

    jv = _jv(spark, tmp_path)
    df = spark.createDataFrame([(1, "x")], "k int, v string")
    with pytest.raises(ValueError, match="disjoint"):
        jv.apply_epoch(0, df, df)


def test_join_view_end_to_end_streaming(spark, tmp_path):
    """Drive the join view from a real file stream (one epoch per file via
    maxFilesPerTrigger) and check the maintained view equals the full
    recompute."""
    import pyspark.sql.functions as F

    from convex_batch_processor_spark.streaming.matview import (
        IncrementalJoinView,
        join_view_foreach_batch,
    )

    src = tmp_path / "src"
    schema = "k int, _side string, av string, bv string"
    batches = [
        [(1, "a", "a0", None), (2, "b", None, "b0")],
        [(1, "b", None, "b1"), (2, "a", "a1", None)],
        [(1, "a", "a2", None), (3, "b", None, "b3")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    jv = IncrementalJoinView(spark, str(tmp_path / "jv"), "k")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(
            join_view_foreach_batch(jv, a_cols=["av"], b_cols=["bv"])
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in jv.read_view().select("k", "av", "bv").collect())
    want = sorted(tuple(r) for r in jv.recompute().select("k", "av", "bv").collect())
    assert got == want
    # key 1 pairs: (a0,b1), (a2,b1); key 2: (a1,b0)
    assert (1, "a0", "b1") in got and (2, "a1", "b0") in got
    assert len(got) == 3
