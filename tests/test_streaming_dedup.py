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
