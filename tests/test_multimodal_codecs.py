"""Real-codec paths in llmops/multimodal.py: the BMP decoder must handle
FOREIGN files (not just its own synthesizer's output), including top-down
storage and row padding; the WAV decoder likewise."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from convex_batch_processor_spark.llmops.multimodal import (
    attach_bmp_payload,
    attach_wav_payload,
    decode_audio_features,
    decode_image_features,
)


def _bmp_bytes(width, height, pixel_rows, bottom_up=True):
    """Hand-build a 24-bit BI_RGB BMP. pixel_rows[y][x] = (b, g, r) with
    y=0 the TOP row; bottom_up controls the storage convention."""
    stride = (3 * width + 3) // 4 * 4
    rows = []
    order = range(height - 1, -1, -1) if bottom_up else range(height)
    for y in order:
        row = bytearray(stride)
        for x, (b, g, r) in enumerate(pixel_rows[y]):
            row[3 * x : 3 * x + 3] = bytes((b, g, r))
        rows.append(bytes(row))
    data = b"".join(rows)
    stored_h = height if bottom_up else -height
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, stored_h, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
        + data
    )


@pytest.mark.parametrize("bottom_up", [True, False])
def test_bmp_decoder_reads_foreign_file(spark, bottom_up):
    # 3x2, odd width -> 1 pad byte per row; distinct channel values
    pixel_rows = [
        [(10, 20, 30), (11, 21, 31), (12, 22, 32)],   # top row
        [(110, 120, 130), (111, 121, 131), (112, 122, 132)],
    ]
    payload = _bmp_bytes(3, 2, pixel_rows, bottom_up=bottom_up)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    row = decode_image_features(df).collect()[0]
    assert (row.width, row.height, row.bpp) == (3, 2, 24)
    assert row.n_bytes == len(payload) == 54 + 2 * 12
    assert row.mean_b == pytest.approx((10 + 11 + 12 + 110 + 111 + 112) / 6)
    assert row.mean_g == pytest.approx((20 + 21 + 22 + 120 + 121 + 122) / 6)
    assert row.mean_r == pytest.approx((30 + 31 + 32 + 130 + 131 + 132) / 6)


def test_bmp_decoder_rejects_non_bmp(spark):
    df = spark.createDataFrame([(1, b"JUNKJUNKJUNKJUNK" * 8)], "doc_id long, payload binary")
    with pytest.raises(Exception):
        decode_image_features(df).collect()


def test_bmp_roundtrip_matches_closed_form(spark):
    ids = [0, 1, 12, 13, 99, 100]  # crosses both the %13 and %7 seams
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    feats = {r.doc_id: r for r in decode_image_features(attach_bmp_payload(docs)).collect()}
    for i in ids:
        w, h = 4 + i % 13, 2 + i % 7
        r = feats[i]
        assert (r.width, r.height) == (w, h)
        assert r.n_bytes == 54 + ((3 * w + 3) // 4 * 4) * h
        assert r.mean_b == pytest.approx(sum((i + x) % 256 for x in range(w)) / w)
        assert r.mean_g == pytest.approx(sum((i + y) % 256 for y in range(h)) / h)
        assert r.mean_r == pytest.approx(
            sum((i + x + y) % 256 for x in range(w) for y in range(h)) / (w * h)
        )


def test_wav_decoder_reads_foreign_file(spark):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(44100)
        wv.writeframes(struct.pack("<4h", 100, -100, 200, -200))
    df = spark.createDataFrame([(7, buf.getvalue())], "doc_id long, payload binary")
    row = decode_audio_features(df).collect()[0]
    assert (row.sample_rate, row.n_channels, row.n_samples) == (44100, 1, 4)
    assert row.peak == 200
    assert row.rms == pytest.approx(((100**2 + 100**2 + 200**2 + 200**2) / 4) ** 0.5)


def test_wav_roundtrip(spark):
    docs = spark.createDataFrame([(i,) for i in (0, 5, 160, 259)], "doc_id long")
    feats = {r.doc_id: r for r in decode_audio_features(attach_wav_payload(docs)).collect()}
    for i in (0, 5, 160, 259):
        r = feats[i]
        assert r.n_samples == 800 + i % 160
        assert r.peak == 1000 + (i % 100) * 10
        assert r.rms == pytest.approx(float(r.peak))  # square wave


def _avi_bytes(frames_px, fps=25, extra_strl_before=b"", extra_strl_after=b"",
               strf_bits=24):
    """Hand-build an uncompressed AVI. frames_px: list of h×w×(b,g,r) row
    lists (y=0 top). Uses '00dc' chunks, a JUNK chunk, and an odd-size
    vedt chunk to exercise word-alignment in the walker. extra_strl_*
    splice additional (e.g. audio) stream lists around the video strl;
    strf_bits overrides the declared biBitCount."""
    h = len(frames_px[0])
    w = len(frames_px[0][0])
    stride = (3 * w + 3) // 4 * 4

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    def frame_bytes(px_rows):
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytearray(stride)
            for x, (bb, gg, rr) in enumerate(px_rows[y]):
                row[3 * x : 3 * x + 3] = bytes((bb, gg, rr))
            rows.append(bytes(row))
        return b"".join(rows)

    frame_size = stride * h
    avih = chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // fps, frame_size * fps, 0, 0x10, len(frames_px),
        0, 1, frame_size, w, h, 0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames_px),
        frame_size, 0xFFFFFFFF, 0) + struct.pack("<4H", 0, 0, w, h))
    strf = chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, strf_bits, 0, frame_size, 2835, 2835, 0, 0))
    hdrl = lst(b"hdrl", avih + extra_strl_before
               + lst(b"strl", strh + strf) + extra_strl_after)
    movi_body = chunk(b"vedt", b"odd")  # 3-byte chunk: walker must word-align
    for px_rows in frames_px:
        movi_body += chunk(b"00dc", frame_bytes(px_rows))
    movi = lst(b"movi", movi_body)
    junk = chunk(b"JUNK", b"\x00" * 10)
    body = b"AVI " + hdrl + junk + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_decoder_reads_foreign_file(spark):
    from convex_batch_processor_spark.llmops.multimodal import decode_video_frames

    f0 = [[(10, 20, 30), (40, 50, 60)]]           # 2x1
    f1 = [[(110, 120, 130), (140, 150, 160)]]
    f2 = [[(210, 220, 230), (240, 250, 251)]]
    payload = _avi_bytes([f0, f1, f2], fps=25)
    df = spark.createDataFrame([(9, payload)], "doc_id long, payload binary")
    rows = {r.frame_idx: r for r in decode_video_frames(df, every_n=2).collect()}
    assert sorted(rows) == [0, 2]  # every 2nd of 3 frames
    r0, r2 = rows[0], rows[2]
    assert (r0.width, r0.height, r0.n_frames) == (2, 1, 3)
    assert r0.fps == pytest.approx(25.0)
    assert r0.mean_b == pytest.approx((10 + 40) / 2)
    assert r0.mean_g == pytest.approx((20 + 50) / 2)
    assert r0.mean_r == pytest.approx((30 + 60) / 2)
    assert r2.mean_b == pytest.approx((210 + 240) / 2)
    assert r2.mean_r == pytest.approx((230 + 251) / 2)


def _audio_strl(bits=16):
    """A minimal 'auds' stream list whose strf is a WAVEFORMATEX — its
    wBitsPerSample sits at the SAME offset 14 as BITMAPINFOHEADER's
    biBitCount, the exact shadowing ADVICE r8 flagged."""
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    strh = chunk(b"strh", b"auds" + b"\x00\x00\x00\x00" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, 8000, 0, 8000, 16000, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, 0, 0))
    # WAVEFORMATEX: wFormatTag nChannels nSamplesPerSec nAvgBytesPerSec
    # nBlockAlign wBitsPerSample cbSize — wBitsPerSample at offset 14
    strf = chunk(b"strf", struct.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, bits, 0))
    return chunk(b"LIST", b"strl" + strh + strf)


def test_avi_decoder_ignores_audio_stream_strf(spark):
    """ADVICE r8: an AVI with BOTH a video and an audio stream must
    decode — the audio strl's WAVEFORMATEX strf (wBitsPerSample=16 at
    offset 14) must not shadow the video biBitCount and raise. Audio
    strl tried in BOTH positions (real muxers emit either order)."""
    from convex_batch_processor_spark.llmops.multimodal import decode_video_frames

    f0 = [[(10, 20, 30), (40, 50, 60)]]  # 2x1
    f1 = [[(110, 120, 130), (140, 150, 160)]]
    for kw in ("extra_strl_before", "extra_strl_after"):
        payload = _avi_bytes([f0, f1], fps=25, **{kw: _audio_strl(bits=16)})
        df = spark.createDataFrame([(3, payload)], "doc_id long, payload binary")
        rows = {r.frame_idx: r for r in decode_video_frames(df, every_n=1).collect()}
        assert sorted(rows) == [0, 1], kw
        assert (rows[0].width, rows[0].height, rows[0].n_frames) == (2, 1, 2)
        assert rows[0].mean_b == pytest.approx((10 + 40) / 2)
        assert rows[1].mean_r == pytest.approx((130 + 160) / 2)


def test_avi_decoder_still_rejects_non_24bpp_vids_strf(spark):
    """The vids-gated strf read must keep rejecting declared non-24bpp
    video streams (the tiny-width case the biBitCount parse exists for)."""
    from convex_batch_processor_spark.llmops.multimodal import decode_video_frames

    payload = _avi_bytes([[[(1, 2, 3), (4, 5, 6)]]], strf_bits=32)
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="32 bpp"):
        decode_video_frames(df).collect()


def test_avi_decoder_rejects_non_avi(spark):
    from convex_batch_processor_spark.llmops.multimodal import decode_video_frames

    df = spark.createDataFrame(
        [(1, b"RIFF\x10\x00\x00\x00WAVEjunkjunkjunk")], "doc_id long, payload binary"
    )
    with pytest.raises(Exception):
        decode_video_frames(df).collect()


def test_avi_roundtrip_matches_closed_form(spark):
    from convex_batch_processor_spark.llmops.multimodal import (
        attach_avi_payload,
        decode_video_frames,
    )

    ids = [0, 4, 5, 11, 59]  # crosses the %5, %3, %4 seams
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = decode_video_frames(attach_avi_payload(docs), every_n=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = r
    for i in ids:
        w, h, nf = 4 + i % 5, 2 + i % 3, 3 + i % 4
        assert sorted(by_doc[i]) == list(range(0, nf, 2))
        for f, r in by_doc[i].items():
            assert (r.width, r.height, r.n_frames) == (w, h, nf)
            assert r.fps == pytest.approx(10.0)
            assert r.mean_b == pytest.approx(sum((i + f + x) % 256 for x in range(w)) / w)
            assert r.mean_g == pytest.approx(sum((i + f + y) % 256 for y in range(h)) / h)


def test_png_decoder_handles_foreign_sub_and_up_filters(spark):
    """A PNG written by a DIFFERENT encoder using Sub (1) and Up (2) row
    filters must decode to the intended pixels — the unfilter path, which
    our own filter-0 encoder never exercises."""
    import struct
    import zlib

    import numpy as np

    from convex_batch_processor_spark.llmops.multimodal import decode_png_features

    img = np.array([[10, 20, 30, 40], [15, 25, 35, 45], [100, 0, 255, 7]],
                   dtype=np.uint8)
    # row 0: filter 1 (Sub): raw[i] = img[i] - img[i-1]
    r0 = bytes([1, img[0, 0]]) + bytes(
        (int(img[0, i]) - int(img[0, i - 1])) & 0xFF for i in range(1, 4)
    )
    # row 1: filter 2 (Up): raw[i] = img[1,i] - img[0,i]
    r1 = bytes([2]) + bytes(
        (int(img[1, i]) - int(img[0, i])) & 0xFF for i in range(4)
    )
    # row 2: filter 0 (None)
    r2 = bytes([0]) + img[2].tobytes()

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(r0 + r1 + r2))
           + chunk(b"IEND", b""))
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    (row,) = decode_png_features(df).collect()
    assert (row["width"], row["height"]) == (4, 3)
    assert row["min_gray"] == 0 and row["max_gray"] == 255
    assert abs(row["mean_gray"] - img.astype(int).mean()) < 1e-12


def test_png_roundtrip_matches_closed_form(spark):
    """Our encoder's bytes decode back to the closed-form pixel law."""
    from convex_batch_processor_spark.llmops.multimodal import (
        attach_png_payload,
        decode_png_features,
    )

    df = spark.createDataFrame([(i,) for i in (0, 5, 12, 77)], "doc_id long")
    rows = {r["doc_id"]: r for r in
            decode_png_features(attach_png_payload(df)).collect()}
    for did, r in rows.items():
        w, h = 4 + did % 13, 2 + did % 7
        pix = [(did + 3 * x + 5 * y) % 256 for y in range(h) for x in range(w)]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["mean_gray"] == sum(pix) / len(pix)
        assert r["min_gray"] == min(pix) and r["max_gray"] == max(pix)


def test_warc_reader_handles_foreign_archive(spark):
    """A WARC assembled by a different writer — single gzip member, extra
    request record, headers in another order/case — must still parse."""
    import gzip
    import hashlib

    from convex_batch_processor_spark.llmops.multimodal import decode_warc_records

    body = b"hello crawl"
    recs = []
    for rtype, b in (
        ("warcinfo", b"software: other\r\n"),
        ("request", b"GET / HTTP/1.1\r\n"),
        ("response", body),
    ):
        recs.append(
            (
                "WARC/1.0\r\n"
                f"content-length: {len(b)}\r\n"
                f"WARC-TYPE: {rtype}\r\n"
                "\r\n"
            ).encode()
            + b
            + b"\r\n\r\n"
        )
    warc = gzip.compress(b"".join(recs))  # one member, three records
    df = spark.createDataFrame([(9, bytearray(warc))], "doc_id long, payload binary")
    (row,) = decode_warc_records(df).collect()
    assert row["n_records"] == 3
    assert row["response_bytes"] == len(body)
    assert row["body_md5"] == hashlib.md5(body).hexdigest()


def test_warc_decode_composes_with_structured_streaming(spark, sf_dir, tmp_path):
    """The WARC reader is a mapInPandas stage, so the SAME operator runs
    unchanged inside a streaming plan — batch and streaming extractions
    of one archive shard agree."""
    from convex_batch_processor_spark.catalog import load_table
    from convex_batch_processor_spark.llmops.multimodal import (
        attach_warc_payload,
        decode_warc_records,
    )

    docs = load_table(spark, sf_dir, "documents").limit(30)
    src = str(tmp_path / "warc_src")
    attach_warc_payload(docs).write.parquet(src)
    batch = {
        r["doc_id"]: (r["n_records"], r["response_bytes"], r["body_md5"])
        for r in decode_warc_records(spark.read.parquet(src)).collect()
    }
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out: dict[int, tuple] = {}
    q = (
        decode_warc_records(stream)
        .writeStream.foreachBatch(
            lambda bdf, _e: out.update(
                {
                    r["doc_id"]: (r["n_records"], r["response_bytes"], r["body_md5"])
                    for r in bdf.collect()
                }
            )
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert out == batch and len(out) == 30


# --- GIF (real LZW) ---------------------------------------------------------


def test_lzw_roundtrip_with_width_growth_and_dict_reset():
    """A long pseudo-random index stream forces code widths 3..12 AND the
    4096-entry dictionary reset; the round-trip must be identity."""
    from convex_batch_processor_spark.llmops.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    state, seq = 12345, []
    for _ in range(30000):
        state = (state * 1103515245 + 12345) % (1 << 31)
        seq.append((state >> 16) % 4)
    blob = _lzw_encode(seq, 2)
    assert _lzw_decode(blob, 2) == seq
    # sanity: the stream actually compressed (dictionary was used)
    assert len(blob) < len(seq)


def test_lzw_decoder_handles_foreign_clear_heavy_stream():
    """A degenerate foreign encoder that emits CLEAR before every pixel
    (valid per spec, never produced by _lzw_encode) must decode."""
    from convex_batch_processor_spark.llmops.multimodal import _lzw_decode

    indices = [3, 0, 2, 1, 1, 0, 3, 2]
    acc, nbits, out = 0, 0, bytearray()

    def emit(code, width=3):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for idx in indices:
        emit(4)  # clear
        emit(idx)
    emit(5)  # EOI
    if nbits:
        out.append(acc & 0xFF)
    assert _lzw_decode(bytes(out), 2) == indices


def test_gif_roundtrip_matches_closed_form(spark):
    from convex_batch_processor_spark.llmops.multimodal import (
        GIF_PALETTE,
        attach_gif_payload,
        decode_gif_features,
    )

    ids = [0, 1, 7, 38, 101]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {r.doc_id: r for r in decode_gif_features(attach_gif_payload(df)).collect()}
    for i in ids:
        w, h = 3 + i % 8, 2 + i % 5
        px = [GIF_PALETTE[(i + x + 2 * y) % 4] for y in range(h) for x in range(w)]
        r = rows[i]
        assert (r.width, r.height, r.n_colors, r.n_pixels) == (w, h, 4, w * h)
        assert r.mean_r == sum(p[0] for p in px) / (w * h)
        assert r.mean_g == sum(p[1] for p in px) / (w * h)
        assert r.mean_b == sum(p[2] for p in px) / (w * h)


def test_gif_payload_is_well_formed(spark):
    """Container sanity a third-party viewer relies on: magic, screen
    descriptor flags, GCE present, trailer last."""
    from convex_batch_processor_spark.llmops.multimodal import attach_gif_payload

    df = spark.createDataFrame([(9,)], "doc_id long")
    b = bytes(attach_gif_payload(df).collect()[0].payload)
    assert b[:6] == b"GIF89a"
    assert b[10] & 0x80  # global color table present
    assert 2 << (b[10] & 0x07) == 4  # 4-entry table
    assert b[13 + 12] == 0x21  # first block after GCT: extension
    assert b[-1:] == b"\x3b"


def test_gif_decoder_rejects_non_gif(spark):
    from convex_batch_processor_spark.llmops.multimodal import decode_gif_features

    df = spark.createDataFrame([(1, b"NOTAGIF00")], "doc_id long, payload binary")
    import pytest as _pytest

    with _pytest.raises(Exception, match="not a GIF"):
        decode_gif_features(df).collect()


# --- NULL-payload hardening -------------------------------------------------
# Absent media (failed fetch, tombstoned blob) must not TypeError a decode
# stage: scalar-feature decoders keep the row with NULL features (row
# accounting survives), the per-frame exploder emits zero frames.


def test_scalar_decoders_null_payload_keeps_row_with_null_features(spark):
    from convex_batch_processor_spark.llmops.multimodal import (
        attach_gif_payload,
        attach_png_payload,
        decode_gif_features,
        decode_png_features,
    )

    # one real payload + one NULL in the same Arrow batch, per decoder
    wav = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    ).unionByName(attach_wav_payload(spark.createDataFrame([(2,)], "doc_id long")).select("doc_id", "payload"))
    rows = {r.doc_id: r for r in decode_audio_features(wav).collect()}
    assert rows[1].sample_rate is None and rows[1].rms is None
    assert rows[2].sample_rate is not None

    bmp = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    ).unionByName(attach_bmp_payload(spark.createDataFrame([(2,)], "doc_id long")).select("doc_id", "payload"))
    rows = {r.doc_id: r for r in decode_image_features(bmp).collect()}
    assert rows[1].width is None and rows[1].mean_r is None
    assert rows[2].width is not None

    png = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    ).unionByName(attach_png_payload(spark.createDataFrame([(2,)], "doc_id long")).select("doc_id", "payload"))
    rows = {r.doc_id: r for r in decode_png_features(png).collect()}
    assert rows[1].width is None and rows[1].mean_gray is None
    assert rows[2].width is not None

    gif = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    ).unionByName(attach_gif_payload(spark.createDataFrame([(2,)], "doc_id long")).select("doc_id", "payload"))
    rows = {r.doc_id: r for r in decode_gif_features(gif).collect()}
    assert rows[1].width is None and rows[1].mean_r is None
    assert rows[2].width is not None


def test_warc_and_video_decoders_handle_null_payload(spark):
    from convex_batch_processor_spark.llmops.multimodal import (
        attach_avi_payload,
        attach_warc_payload,
        decode_video_frames,
        decode_warc_records,
    )

    warc = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    ).unionByName(
        attach_warc_payload(
            spark.createDataFrame([(2, "hello warc")], "doc_id long, text string")
        ).select("doc_id", "payload")
    )
    rows = {r.doc_id: r for r in decode_warc_records(warc).collect()}
    assert rows[1].n_records is None and rows[1].body_md5 is None
    assert rows[2].n_records is not None

    avi = spark.createDataFrame(
        [(1, None)], "doc_id long, payload binary"
    ).unionByName(attach_avi_payload(spark.createDataFrame([(2,)], "doc_id long")).select("doc_id", "payload"))
    frames = decode_video_frames(avi, every_n=2).collect()
    assert {r.doc_id for r in frames} == {2}  # NULL payload -> zero frames


def test_payload_byte_features_null_and_empty_parity(spark, tmp_path):
    """ADVICE r6: NULL payload -> NULL features (row kept, the
    _null_feature_row convention), EMPTY payload -> present-file
    sentinels (0 / -1 / 0.0) — and the registered payload_byte_stats
    oracle predicts BOTH cases, checked end-to-end against DuckDB here
    because the synthetic documents corpus contains no NULL/empty text
    to exercise them."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from convex_batch_processor_spark.llmops.multimodal import (
        attach_payload,
        payload_byte_features,
    )
    from convex_batch_processor_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in payload_byte_features(attach_payload(docs)).collect()}
    assert (rows[2].n_bytes, rows[2].head_byte, rows[2].feat_mean) == (None, None, None)
    assert (rows[3].n_bytes, rows[3].head_byte, rows[3].feat_mean) == (0, -1, 0.0)
    assert (rows[1].n_bytes, rows[1].head_byte) == (5, ord("h"))

    # full oracle parity on a crafted documents table
    table = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "lang": ["en", "en", "en"],
            "source": ["a", "a", "a"],
            "text": ["hello", None, ""],
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: (r.n_bytes, r.head_byte, r.feat_mean)
        for r in QUERIES["payload_byte_stats"].fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(QUERIES["payload_byte_stats"].oracle).fetchall()
    }
    assert got == want


def test_png_decoder_rejects_interlaced(spark):
    """Review r6: an Adam7-interlaced stream has a different scanline
    layout — decoding it sequentially computed stats over scrambled
    pixels with no error. The IHDR interlace flag must be checked like
    color_type/bit_depth ('other variants raise, never corrupt')."""
    import struct
    import zlib

    from convex_batch_processor_spark.llmops.multimodal import decode_png_features

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big") + typ + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    w = h = 8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1)  # interlace=1
    raw = b"".join(b"\x00" + bytes(range(i, i + w)) for i in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    with pytest.raises(Exception, match="interlace"):
        decode_png_features(df).collect()


def test_audio_decode_rejects_non_16bit_pcm(spark):
    """Regression (r8 multimodal review): an 8-bit PCM WAV must fail
    loudly, not decode as int16 garbage."""
    import io
    import wave

    import pytest as pt

    from convex_batch_processor_spark.llmops.multimodal import decode_audio_features

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(bytes([126, 128, 130, 127] * 100))
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    with pt.raises(Exception, match="8-bit PCM unsupported"):
        decode_audio_features(df).collect()


def test_warc_payload_bytes_are_time_independent(spark):
    """Regression (r8 multimodal review): gzip embedded the wall-clock
    mtime, so a task retry crossing a second boundary re-derived
    different payload bytes/checksum for the same doc."""
    import time

    from convex_batch_processor_spark.llmops.multimodal import attach_warc_payload

    df = spark.createDataFrame(
        [(1, "hello warc determinism")], "doc_id long, text string"
    )
    a = attach_warc_payload(df).collect()[0]
    time.sleep(1.1)
    b = attach_warc_payload(df).collect()[0]
    assert bytes(a.payload) == bytes(b.payload)
    assert a.meta["checksum"] == b.meta["checksum"]


def test_lzw_decode_rejects_out_of_range_code():
    """Regression (r8 multimodal review): only code == len(table) is the
    legal KwKwK case; larger codes are corruption, not data."""
    import pytest as pt

    from convex_batch_processor_spark.llmops.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    good = _lzw_encode([0, 1, 0, 1, 0, 1], 2)
    assert _lzw_decode(good, 2) == [0, 1, 0, 1, 0, 1]
    # craft a stream with a wildly out-of-range code: width 3 after clear
    # (min_code_size 2 -> clear=4, eoi=5, first free slot 6); emit clear,
    # a literal 0, then code 7 while the table holds 6 entries
    import struct

    bits = []
    for code, width in ((4, 3), (0, 3), (7, 3)):
        bits.extend((code >> i) & 1 for i in range(width))
    acc = bytearray()
    cur = 0
    for i, bit in enumerate(bits):
        cur |= bit << (i % 8)
        if i % 8 == 7:
            acc.append(cur)
            cur = 0
    if len(bits) % 8:
        acc.append(cur)
    with pt.raises(ValueError, match="out of range"):
        _lzw_decode(bytes(acc), 2)
