"""BatchProcessor facade: the reference's two README scenarios end-to-end
through the reference-shaped API (README.md:40-216 — analytics events
accumulation + users migration iterator)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from convex_batch_processor_spark.catalog import load_table
from convex_batch_processor_spark.client import BatchProcessor
from convex_batch_processor_spark.sources.registry import HandleRegistry

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("eventName", T.StringType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


def test_analytics_events_scenario(spark, tmp_path):
    """README accumulator walkthrough: track events, flush at threshold,
    inspect status + history."""
    reg = HandleRegistry()
    flushed = []
    reg.add("processAnalyticsBatch", lambda df, ep: flushed.append(df.count()))

    bp = BatchProcessor(spark=spark, root=str(tmp_path), registry=reg)
    bp.accumulator(
        "analytics-events",
        EVENT_SCHEMA,
        "processAnalyticsBatch",
        immediate_flush_threshold=100,
        flush_interval_s=30,
    )
    for i in range(3):
        n = bp.add_items(
            "analytics-events",
            [{"eventName": f"page_view_{i}_{j}", "timestamp": 1700000000 + j} for j in range(40)],
        )
        assert n == 40
    assert bp.flush("analytics-events") is True
    assert sum(flushed) == 120
    st = bp.get_batch_status("analytics-events")
    assert st["flushed_items"] == 120
    hist = bp.get_flush_history("analytics-events", limit=5).collect()
    assert hist and all(h.success for h in hist)


def test_users_migration_scenario(spark, sf_dir, tmp_path):
    """README iterator walkthrough: migrate all users in batches with
    progress, pause/resume, completion callback."""
    reg = HandleRegistry()
    migrated, completions = [], []
    reg.add("migrateUserBatch", lambda df, cur: migrated.extend(r.c_custkey for r in df.collect()))
    reg.add("onMigrationComplete", lambda job, n: completions.append((job, n)))

    customers = load_table(spark, sf_dir, "customer")
    bp = BatchProcessor(spark=spark, root=str(tmp_path), registry=reg)
    st = bp.start_iterator(
        "user-migration-2024",
        customers,
        "c_custkey",
        "migrateUserBatch",
        batch_size=50,
        on_complete="onMigrationComplete",
        run=False,
    )
    assert st.status == "running"
    bp.run_iterator("user-migration-2024", max_chunks=1)
    assert bp.get_iterator_status("user-migration-2024")["processed_count"] == 50
    bp.pause_iterator("user-migration-2024")
    assert bp.run_iterator("user-migration-2024").status == "paused"
    bp.resume_iterator("user-migration-2024")
    final = bp.run_iterator("user-migration-2024")
    total = customers.count()
    assert final.status == "completed"
    assert sorted(migrated) == sorted(r.c_custkey for r in customers.collect())
    assert completions == [("user-migration-2024", total)]
    assert [j.job_id for j in bp.list_iterator_jobs(status="completed")] == ["user-migration-2024"]
    assert bp.delete_iterator_job("user-migration-2024") is True


def test_facade_guards(spark, tmp_path):
    bp = BatchProcessor(spark=spark, root=str(tmp_path))
    with pytest.raises(KeyError, match="no accumulator"):
        bp.add_items("nope", [{"eventName": "x", "timestamp": 1}])
    with pytest.raises(KeyError, match="unknown iterator"):
        bp.get_iterator_status("nope")
    assert bp.list_iterator_jobs() == []
