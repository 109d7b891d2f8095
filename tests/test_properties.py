"""Property-based tests (hypothesis) for the engine's pure expression
helpers — inputs the fixed testdata never produces."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from convex_batch_processor_spark.iterator import backoff_ms
from convex_batch_processor_spark.operators.relational import make_batch_id, parse_batch_id


@given(st.integers(min_value=0, max_value=1000))
def test_backoff_monotone_capped(n):
    b = backoff_ms(n)
    assert 1000 <= b <= 30000
    assert b >= backoff_ms(max(0, n - 1)) or b == 30000
    if n >= 5:
        assert b == 30000  # cap reached (lib.ts:1059)


# base ids: non-empty, no '::' separator collision, printable ascii
_base = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=":"),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)  # each example is a Spark job
@given(st.lists(st.tuples(_base, st.integers(min_value=0, max_value=10**12)), min_size=1, max_size=30))
def test_batch_id_roundtrip_property(spark, pairs):
    df = spark.createDataFrame(pairs, "base string, seq_orig long")
    composed = df.select(
        "base", "seq_orig", make_batch_id(F.col("base"), F.col("seq_orig")).alias("bid")
    )
    parsed = parse_batch_id(composed, "bid")
    for r in parsed.collect():
        assert r.base_id == r.base
        assert r.seq == r.seq_orig
        assert r.bid == f"{r.base}::{r.seq_orig}"
