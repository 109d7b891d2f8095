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

Compressed image/video codecs (JPEG/PNG/H.264) are NOT in this
container, so ``decode_features`` / ``frame_sample`` below are
deterministic stand-ins with the real Spark plumbing (schema, batching,
partitioning) in place; swap the body for PIL/pyav on a real cluster.
The deliberately-fake parts are marked STUB.

AUDIO and (since round 4) IMAGES are the exceptions:
- the stdlib ``wave`` module is a real PCM WAV codec, so
  ``attach_wav_payload`` writes genuine RIFF/WAVE containers and
  ``decode_audio_features`` REALLY parses them (header fields + int16
  frames) — no stub anywhere on that path;
- BMP (24-bit uncompressed BI_RGB) is a real image container fully
  specified by its header, so ``attach_bmp_payload`` writes genuine BMP
  files (BITMAPINFOHEADER, BGR byte order, 4-byte row padding, bottom-up
  rows) and ``decode_image_features`` REALLY parses them with
  struct+numpy — a working decoder for any 24-bit BI_RGB BMP, exercised
  against hand-built foreign files in tests.
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


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a genuine RIFF/WAVE PCM16 payload per row via the stdlib
    ``wave`` writer: an 8 kHz mono square wave whose length and amplitude
    are closed-form functions of the id (n_samples = 800 + id % 160,
    amplitude = 1000 + (id % 100)·10). The bytes are a fully valid WAV
    file — any decoder can read them — and because the parameters are
    closed-form, an external oracle can PREDICT what a correct decoder
    must report (see queries/llm5.audio_decode_features).

    mapInPandas: payload synthesis is per-file Python by nature (codec
    work), batched over Arrow and partition-parallel — the same execution
    shape a real torchaudio/ffmpeg encode stage would use."""
    schema = (
        "doc_id long, payload binary, "
        "meta struct<kind:string, n_bytes:long, checksum:string>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import wave as wavmod

        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                n = 800 + doc_id % 160
                amp = 1000 + (doc_id % 100) * 10
                idx = np.arange(n)
                samples = np.where((idx // 4) % 2 == 0, amp, -amp).astype("<i2")
                buf = io.BytesIO()
                with wavmod.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                b = buf.getvalue()
                out["doc_id"].append(doc_id)
                out["payload"].append(b)
                out["meta"].append(
                    {
                        "kind": "audio/wav",
                        "n_bytes": len(b),
                        "checksum": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(gen, schema)


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_s double, peak long, rms double"
)


def decode_audio_features(df: DataFrame) -> DataFrame:
    """REAL audio decode — no stub: the stdlib ``wave`` codec parses the
    RIFF/WAVE header (rate, channels, width, frame count) and the PCM16
    frames; numpy computes amplitude stats (peak |sample|, RMS in exact
    float64). Works on any PCM WAV payload, not just the synthesized ones.

    duration_s is frame-count/rate in one IEEE division (bit-reproducible
    across engines); rms = sqrt(mean(s²)) in float64."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave as wavmod

        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "duration_s": [], "peak": [], "rms": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                with wavmod.open(io.BytesIO(bytes(payload))) as w:
                    sr = w.getframerate()
                    nch = w.getnchannels()
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                arr = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(sr)
                out["n_channels"].append(nch)
                out["n_samples"].append(nf)
                out["duration_s"].append(nf / sr)
                out["peak"].append(0 if arr.size == 0 else int(np.abs(arr).max()))
                out["rms"].append(
                    0.0 if arr.size == 0 else float(np.sqrt(np.mean(arr * arr)))
                )
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(dec, AUDIO_FEATURE_SCHEMA)


def attach_bmp_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a genuine 24-bit BMP per row: width = 4 + id % 13 (odd
    widths exercise the 4-byte row padding), height = 2 + id % 7, pixel
    (x, y) = BGR((id+x) % 256, (id+y) % 256, (id+x+y) % 256) with y = 0
    the TOP row (stored bottom-up, as BMP requires). The bytes are a
    fully valid BI_RGB BMP any viewer opens; because the dimensions and
    pixels are closed-form in the id, an external oracle can PREDICT the
    header fields and channel means a correct decoder must report
    (queries/llm6.image_decode_features).

    mapInPandas — the same partition-parallel, Arrow-batched execution
    shape a real image encode stage uses."""
    schema = (
        "doc_id long, payload binary, "
        "meta struct<kind:string, n_bytes:long, checksum:string>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "payload": [], "meta": []}
            for doc_id in pdf[id_col]:
                doc_id = int(doc_id)
                w, h = 4 + doc_id % 13, 2 + doc_id % 7
                stride = (3 * w + 3) // 4 * 4
                xs = np.arange(w)
                rows = np.zeros((h, stride), dtype=np.uint8)
                for y in range(h):
                    px = np.empty((w, 3), dtype=np.uint8)
                    px[:, 0] = (doc_id + xs) % 256          # B
                    px[:, 1] = (doc_id + y) % 256           # G
                    px[:, 2] = (doc_id + xs + y) % 256      # R
                    rows[y, : 3 * w] = px.reshape(-1)
                data = rows[::-1].tobytes()  # bottom-up storage
                header = struct.pack(
                    "<2sIHHI", b"BM", 54 + len(data), 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
                )
                b = header + data
                out["doc_id"].append(doc_id)
                out["payload"].append(b)
                out["meta"].append(
                    {
                        "kind": "image/bmp",
                        "n_bytes": len(b),
                        "checksum": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return df.select(id_col).mapInPandas(gen, schema)


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, bpp int, n_bytes long, "
    "mean_b double, mean_g double, mean_r double"
)


def decode_image_features(df: DataFrame) -> DataFrame:
    """REAL image decode — no stub: struct parses the BMP file header +
    BITMAPINFOHEADER (magic, pixel-array offset, dimensions, bit depth,
    compression), numpy strides out the padded bottom-up BGR rows. Works
    on any uncompressed 24-bit BI_RGB BMP, not just the synthesized ones
    (tests feed it a hand-built foreign file).

    Channel means are float64 over exact small-integer sums —
    bit-reproducible, so the closed-form oracle hash-matches them."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "bpp": [],
                "n_bytes": [], "mean_b": [], "mean_g": [], "mean_r": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                magic, _file_size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", b, 0)
                if magic != b"BM":
                    raise ValueError(f"not a BMP payload (doc {doc_id})")
                _hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
                if bpp != 24 or comp != 0:
                    raise ValueError(f"unsupported BMP variant bpp={bpp} comp={comp}")
                stride = (3 * w + 3) // 4 * 4
                flipped = h > 0  # positive height = bottom-up storage
                h = abs(h)
                rows = np.frombuffer(
                    b, dtype=np.uint8, count=stride * h, offset=offset
                ).reshape(h, stride)
                if flipped:
                    rows = rows[::-1]
                px = rows[:, : 3 * w].reshape(h, w, 3).astype(np.float64)
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(bpp)
                out["n_bytes"].append(len(b))
                out["mean_b"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_r"].append(float(px[:, :, 2].mean()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(dec, IMAGE_FEATURE_SCHEMA)


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
