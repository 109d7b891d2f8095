"""Post-window round-4 additions, part 40 (round-5 rotation material):
real GIF decode — the LZW-compressed image format joins the real-codec
family (WAV llm5, BMP/AVI llm6, PNG llm37, WARC llm38).

GIF is the first VARIABLE-WIDTH entropy-coded format here: the payload
round-trips through a genuine LZW compressor/decompressor
(llmops/multimodal._lzw_encode/_lzw_decode — growing code widths,
clear/EOI codes, 4096-entry dictionary reset, KwKwK case), so a correct
result proves real codec work, not header parsing alone. As with every
codec query, the oracle predicts the decoded features closed-form from
doc_id — it never sees a byte of the file.

Registered last in queries/__init__.py (after llm46); oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import register

# palette literals mirrored from llmops.multimodal.GIF_PALETTE
_R = "CASE (doc_id + x + 2*y) % 4 WHEN 0 THEN 0 WHEN 1 THEN 80 WHEN 2 THEN 160 ELSE 240 END"
_G = "CASE (doc_id + x + 2*y) % 4 WHEN 0 THEN 0 WHEN 1 THEN 60 WHEN 2 THEN 120 ELSE 180 END"
_B = "CASE (doc_id + x + 2*y) % 4 WHEN 0 THEN 0 WHEN 1 THEN 45 WHEN 2 THEN 90 ELSE 135 END"


def _mean(chan: str) -> str:
    return (
        "CAST(list_sum(list_transform(range(0, h), y -> "
        "list_sum(list_transform(range(0, w), x -> "
        f"{chan})))) AS DOUBLE) / (w * h)"
    )


@register(
    "gif_decode_features",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id, 3 + doc_id % 8 AS w, 2 + doc_id % 5 AS h FROM documents)
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(4 AS INTEGER) AS n_colors,
           CAST(w * h AS BIGINT) AS n_pixels,
           {_mean(_R)} AS mean_r,
           {_mean(_G)} AS mean_g,
           {_mean(_B)} AS mean_b
    FROM dims
    """,
)
def gif_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL GIF pipeline: synthesize a genuine GIF89a per
    document (logical screen descriptor, 4-entry global color table,
    graphic-control extension, image descriptor, LZW-compressed index
    stream in sub-blocks) and DECODE it with a real parser + LZW
    decompressor. The oracle predicts width/height/palette-size and the
    per-channel means from doc_id arithmetic — a wrong code-width
    transition, mishandled clear code, or palette mix-up corrupts the
    index stream and fails the hash.

    Scale shape: ONE fused mapInPandas over Arrow batches — synth and
    decode composed in a single Python stage (identical math; the GIF
    bytes never cross back to the JVM), partition-parallel codec work,
    zero shuffle."""
    from ..llmops.multimodal import gif_features_fused

    docs = load_table(spark, sf_dir, "documents")
    return gif_features_fused(docs)
