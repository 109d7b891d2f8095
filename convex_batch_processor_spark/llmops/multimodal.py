"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB:
- payload: BinaryType column (parquet stores it page-compressed; large
  payloads should live in their own parquet files with
  ``spark.sql.files.maxPartitionBytes`` sized so a partition of payloads
  fits executor memory);
- metadata: a StructType column (kind, n_bytes, checksum, …) so filters
  and joins touch ONLY metadata — column pruning means the heavy binary
  column is never read unless the decode stage needs it;
- decode/feature-extract: Arrow-batched ``mapInPandas`` — whole Arrow
  record batches cross the JVM↔Python boundary once, not per row.

The actual image/audio codecs are NOT in this container, so ``decode_*``
below are deterministic stand-ins with the real Spark plumbing (schema,
batching, partitioning) in place; swap the body for PIL/torchaudio on a
real cluster. The deliberately-fake parts are marked STUB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("checksum", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize the multimodal column pattern from the documents table:
    binary payload (utf-8 bytes standing in for image/audio bytes) + typed
    metadata struct. Pure Column ops — no Python."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("kind"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = "doc_id long, n_bytes long, head_byte int, feat_mean double"


def decode_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage over binary payloads via mapInPandas.

    STUB: real decode (PIL.Image.open / soundfile.read / pyav frame
    sampling) is replaced by a deterministic fake — byte length, first
    byte, mean byte value — because the codec libraries are not in this
    container. The Spark-side contract (Arrow batch iterator in, typed
    rows out, executed distributed per partition) is the real thing.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "head_byte": payloads.map(lambda b: -1 if b is None or len(b) == 0 else b[0]),
                    "feat_mean": payloads.map(
                        lambda b: 0.0 if b is None or len(b) == 0 else float(sum(b)) / len(b)
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing. STUB decode: emits (doc_id, frame_idx,
    frame_bytes=None) for every ``every_n``-th 'frame', where frame count is
    derived from payload length. Real impl: pyav keyframe iteration inside
    the same mapInPandas contract."""
    schema = "doc_id long, frame_idx int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 0 if payload is None else len(payload) // 64
                for i in range(0, n_frames, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(None)  # STUB: no codec in container
            yield pd.DataFrame(rows)

    return df.select("doc_id", "payload").mapInPandas(sample, schema)
