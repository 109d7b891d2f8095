"""PII scanner/redactor semantics on crafted inputs the synthetic
corpus never produces: real-looking emails, NANP phone variants, dotted
quads, multiples per row, adjacency, and look-alike NON-matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from convex_batch_processor_spark.llmops import pii as P

ROWS = [
    # (id, text, n_email, n_phone, n_ipv4)
    (0, "plain text with no pii at all", 0, 0, 0),
    (1, "contact alice.smith+spam@sub.example.co.uk today", 1, 0, 0),
    (2, "call +1-555-203-9987 or (555) 203-9987", 0, 2, 0),
    (3, "host 192.168.0.1 and 10.0.255.254", 0, 0, 2),
    (4, "a@b.io c@d.org back to back", 2, 0, 0),
    (5, "mixed: u5@example.com +1-555-100-1000 10.1.2.3", 1, 1, 1),
    (6, "version 1.2.3 is not an ip, nor is 1.2.3.4.5 a clean one", 0, 0, 1),
    (7, "not a phone: 12-34-56; not an email: foo@bar (no tld dot)", 0, 0, 0),
    (8, "email at end user8@example.com", 1, 0, 0),
    (9, "555 123 4567 space-separated phone", 0, 1, 0),
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, *_ in ROWS], "id long, text string"
    )


def test_counts_match_expected(spark):
    got = {
        r["id"]: (r["n_email"], r["n_phone"], r["n_ipv4"])
        for r in P.scan_pii(_df(spark), "text").collect()
    }
    for i, _, ne, np_, ni in ROWS:
        assert got[i] == (ne, np_, ni), f"row {i}: {got[i]} != {(ne, np_, ni)}"


def test_redaction_tokens_and_deltas(spark):
    out = {r["id"]: r for r in P.scan_pii(_df(spark), "text").collect()}
    # every matched kind leaves its token; originals are gone
    assert out[1]["redacted"] == "contact [EMAIL] today"
    assert out[5]["redacted"] == "mixed: [EMAIL] [PHONE] [IP]"
    assert "[EMAIL]" not in out[0]["redacted"]
    for i, text, ne, np_, ni in ROWS:
        r = out[i]
        assert r["chars_redacted"] == len(text) - len(r["redacted"])
        if ne + np_ + ni == 0:
            assert r["redacted"] == text
            assert r["any_pii"] is False
        else:
            assert r["any_pii"] is True


def test_counts_on_original_not_redacted_text(spark):
    # an email adjacent to a phone: both still counted independently
    df = _df(spark).filter(F.col("id") == 5)
    row = P.scan_pii(df, "text").collect()[0]
    assert (row["n_email"], row["n_phone"], row["n_ipv4"]) == (1, 1, 1)


def test_injected_corpus_shape(spark, sf_dir):
    """The registered query's injection: every doc_id%3==0 doc gains
    exactly one email and the scanner agrees."""
    from convex_batch_processor_spark.queries.llm28 import _with_injected_pii
    from convex_batch_processor_spark.catalog import load_table

    docs = _with_injected_pii(load_table(spark, sf_dir, "documents")).limit(200)
    scanned = P.scan_pii(docs, "text")
    bad = scanned.filter(
        (F.col("n_email") != (F.col("doc_id") % 3 == 0).cast("int"))
        | (F.col("n_phone") != (F.col("doc_id") % 5 == 0).cast("int"))
        | (F.col("n_ipv4") != (F.col("doc_id") % 7 == 0).cast("int"))
    ).count()
    assert bad == 0


def test_scrub_composes_with_structured_streaming(spark, sf_dir, tmp_path):
    """scan_pii is a pure per-row map, so the SAME operator runs unchanged
    on a stream — batch and streaming scrubs of one corpus slice agree."""
    from convex_batch_processor_spark.catalog import load_table
    from convex_batch_processor_spark.queries.llm28 import _with_injected_pii

    docs = _with_injected_pii(load_table(spark, sf_dir, "documents")).limit(50)
    src = str(tmp_path / "src")
    docs.write.parquet(src)
    batch = {
        r["doc_id"]: (r["n_email"], r["chars_redacted"])
        for r in P.scan_pii(spark.read.parquet(src), "text").collect()
    }
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out: dict[int, tuple] = {}

    qy = P.scan_pii(stream, "text").select("doc_id", "n_email", "chars_redacted")
    # run the scrub INSIDE the stream plan; collect via foreachBatch on the
    # already-scrubbed rows
    qs = (
        qy.writeStream.outputMode("append")
        .foreachBatch(lambda bdf, _e: out.update(
            {r["doc_id"]: (r["n_email"], r["chars_redacted"]) for r in bdf.collect()}
        ))
        .trigger(availableNow=True)
        .start()
    )
    qs.awaitTermination(120)
    assert out == batch
