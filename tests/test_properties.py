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


def _sessionize_reference(events, gap_ms):
    """Pure-python sessionization oracle: events = [(user, ts_ms, value)]."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for i, (u, ts, v) in enumerate(events):
        by_user[u].append((ts, i, v))  # i = event_id tiebreak
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        idx = 0
        prev = None
        for ts, _i, v in evs:
            if prev is None or ts - prev > gap_ms:
                idx += 1
                out[(u, idx)] = [0, ts, ts, 0.0]
            s = out[(u, idx)]
            s[0] += 1
            s[2] = max(s[2], ts)
            s[3] = round(s[3] + v, 2)
            prev = ts
    return {k: tuple(v) for k, v in out.items()}


@settings(max_examples=8, deadline=None)  # each example is a Spark job
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # user
            st.integers(min_value=0, max_value=10**7),  # ts ms (collisions likely)
            st.decimals(min_value=0, max_value=100, places=2).map(float),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=1, max_value=10**6),  # gap ms
)
def test_sessionize_matches_python_reference(spark, events, gap_ms):
    """operators/sessions.py:sessionize == pure-python oracle on arbitrary
    event sets: same session count per key, same (n, t_start, t_end, sum)
    per session index — including equal-timestamp and gap-boundary cases
    the fixed testdata never produces."""
    from convex_batch_processor_spark.operators.sessions import sessionize

    df = spark.createDataFrame(
        [(u, i, ts, v) for i, (u, ts, v) in enumerate(events)],
        "user_id long, event_id long, ts_ms long, value double",
    ).withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    got = {
        (r.user_id, r.session_idx): (
            r.n_events,
            # round, not int(): datetime.timestamp() is float seconds, so
            # e.g. 4104119 ms comes back as 4104118.999... after *1000
            round(r.t_start.timestamp() * 1000),
            round(r.t_end.timestamp() * 1000),
            round(r.session_value, 2),
        )
        for r in sessionize(df, gap_ms).collect()
    }
    assert got == _sessionize_reference(events, gap_ms)


@settings(max_examples=6, deadline=None)  # each example is a Spark job
@given(
    st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=40),
    st.integers(min_value=8, max_value=128),
)
def test_pack_greedy_property(spark, token_counts, capacity):
    """First-fit packing invariants for arbitrary doc sizes/capacities:
    bin ids are contiguous from 0, assignment order-deterministic, and no
    multi-doc bin exceeds capacity."""
    from convex_batch_processor_spark.llmops.packing import pack_greedy

    rows = [(f"s{i % 2}", i, "w " * n) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    got = sorted(
        pack_greedy(df, capacity=capacity).collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    by_src: dict[str, list] = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    for docs in by_src.values():
        bin_id, fill = 0, 0
        for r in docs:
            if fill > 0 and fill + r.n_tokens > capacity:
                bin_id, fill = bin_id + 1, 0
            assert r.bin_id == bin_id
            fill += r.n_tokens
            assert fill <= capacity or (fill == r.n_tokens)
