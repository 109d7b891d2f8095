"""The fused synth→decode pipelines (one mapInPandas stage) must emit
EXACTLY the rows of the two-stage attach_X |> decode_X compositions they
replaced in the *_decode_features queries — same values bit-for-bit, since
the driver's oracle hashes are pinned to the unfused output."""

from __future__ import annotations

import pytest

from convex_batch_processor_spark.llmops import multimodal as M


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fused, unfused",
    [
        (
            M.audio_features_fused,
            lambda df: M.decode_audio_features(M.attach_wav_payload(df)),
        ),
        (
            M.image_features_fused,
            lambda df: M.decode_image_features(M.attach_bmp_payload(df)),
        ),
        (
            lambda df: M.video_frames_fused(df, every_n=2),
            lambda df: M.decode_video_frames(M.attach_avi_payload(df), every_n=2),
        ),
        (
            M.png_features_fused,
            lambda df: M.decode_png_features(M.attach_png_payload(df)),
        ),
        (
            M.gif_features_fused,
            lambda df: M.decode_gif_features(M.attach_gif_payload(df)),
        ),
    ],
    ids=["audio", "image", "video", "png", "gif"],
)
def test_fused_matches_two_stage(spark, fused, unfused):
    # ids cover every modulus branch of each synthesizer (% 160 dominates)
    docs = spark.range(0, 170).withColumnRenamed("id", "doc_id")
    assert _rows(fused(docs)) == _rows(unfused(docs))


def test_warc_fused_matches_two_stage_including_null_text(spark):
    import pyspark.sql.functions as F

    docs = (
        spark.range(0, 40)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 7 != 0,
                F.concat(F.lit("body of doc "), F.col("doc_id")),
            ),  # every 7th doc: NULL text -> NULL payload row must survive
        )
    )
    fused = _rows(M.warc_records_fused(docs))
    unfused = _rows(M.decode_warc_records(M.attach_warc_payload(docs)))
    assert fused == unfused


def test_fused_plan_has_single_python_stage(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    plan = M.audio_features_fused(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    two = (
        M.decode_audio_features(M.attach_wav_payload(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert two.count("MapInPandas") == 2
