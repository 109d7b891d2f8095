"""Streaming deduplication: dropDuplicates on a stream removes repeats
across micro-batches (state-store backed) — the streaming twin of
llmops exact dedup for continuously-arriving corpora."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def test_stream_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()

    def stage(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(str(src))

    # same content hash appears in DIFFERENT files -> different micro-batches
    stage([(1, "h1"), (2, "h2")])
    stage([(3, "h1"), (4, "h3")])  # h1 repeats across batches
    stage([(5, "h2"), (6, "h4")])  # h2 repeats too

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .dropDuplicates(["content_hash"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM dedup_out").collect()
    hashes = sorted(r.content_hash for r in rows)
    assert hashes == ["h1", "h2", "h3", "h4"]  # each hash exactly once
    # first-seen wins (state remembers across micro-batches)
    by_hash = {r.content_hash: r.doc_id for r in rows}
    assert by_hash["h1"] == 1 and by_hash["h2"] == 2


def test_stream_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: the 100 TB form of streaming dedup.
    Plain dropDuplicates keeps EVERY key in state forever; the watermarked
    variant evicts a key once the watermark passes its event time + delay,
    so state is bounded by the horizon — and a duplicate arriving after
    eviction is admitted again (dedup-within-horizon semantics)."""
    import datetime as dt

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content_hash", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    src = tmp_path / "src"
    src.mkdir()

    def stage(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))

    m = dt.timedelta(minutes=1)
    stage([(1, "h1", t0), (2, "h2", t0)])  # the source dir must exist at start()

    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_wm_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .start()
    )
    # drain between stages: micro-batch order (and therefore watermark
    # progression) is explicit, not file-listing order
    q.processAllAvailable()
    stage([(3, "h1", t0 + 10 * m)])   # dup inside the 1 h horizon → dropped
    q.processAllAvailable()
    stage([(4, "h9", t0 + 300 * m)])  # advances watermark past t0+1h → h1 evicted
    q.processAllAvailable()
    stage([(5, "h1", t0 + 280 * m)])  # h1 again, AFTER eviction → re-admitted
    q.processAllAvailable()
    q.stop()

    got = sorted(r.doc_id for r in spark.sql("SELECT * FROM dedup_wm_out").collect())
    assert got == [1, 2, 4, 5]  # 3 deduped; 5 re-admitted after state eviction
