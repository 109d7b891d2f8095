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


def test_batch_id_compose_propagates_null(spark):
    """r8 review pin: make_batch_id is NULL-propagating (|| convention) —
    a NULL base or seq yields a NULL id, never the bare other part
    (concat_ws would compose '5' from (NULL, 5) and parse it back as a
    DIFFERENT id)."""
    df = spark.createDataFrame(
        [(None, 5), ("job", None), (None, None), ("job", 7)],
        "base string, seq_orig long",
    )
    rows = parse_batch_id(
        df.select(
            "base", "seq_orig",
            make_batch_id(F.col("base"), F.col("seq_orig")).alias("bid"),
        ),
        "bid",
    ).collect()
    got = {(r.base, r.seq_orig): (r.bid, r.base_id, r.seq) for r in rows}
    assert got[(None, 5)] == (None, None, None)
    assert got[("job", None)] == (None, None, None)
    assert got[(None, None)] == (None, None, None)
    assert got[("job", 7)] == ("job::7", "job", 7)


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


# --- sketch properties (late r4) --------------------------------------------

_term = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=12,
)


@settings(max_examples=6, deadline=None)  # each example is a Spark job
@given(st.lists(_term, min_size=1, max_size=120))
def test_cms_point_estimate_never_underestimates_property(spark, terms):
    """CMS one-sided guarantee on arbitrary inputs (collisions included)."""
    from convex_batch_processor_spark.llmops import sketches as K

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    counts = df.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    sketch = K.cms_sketch(counts, "term", "cnt", depth=3, width=16)  # tiny -> forced collisions
    est = K.cms_estimate(counts, sketch, "term", depth=3, width=16)
    rows = counts.join(est, "term").collect()
    total = len(terms)
    for r in rows:
        assert r.cms_est >= r.cnt, (r.term, r.cnt, r.cms_est)
        assert r.cms_est <= total  # a cell can never exceed the stream length


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_term, min_size=1, max_size=80),
    st.lists(_term, min_size=1, max_size=80),
)
def test_hll_merge_commutes_with_union_property(spark, a_keys, b_keys):
    """Register max-merge of two sketches == sketch of the union, for any
    key sets (the mergeability law, on adversarial random inputs)."""
    from convex_batch_processor_spark.llmops import sketches as K

    df = spark.createDataFrame(
        [("a", t) for t in a_keys] + [("b", t) for t in b_keys], "g string, term string"
    )
    regs = K.hll_registers(df, "term", ["g"], b=4)
    merged = {
        r.bucket: r.m_reg
        for r in regs.groupBy("bucket").agg(F.max("m_reg").alias("m_reg")).collect()
    }
    union = spark.createDataFrame(
        [("u", t) for t in set(a_keys) | set(b_keys)], "g string, term string"
    )
    direct = {r.bucket: r.m_reg for r in K.hll_registers(union, "term", ["g"], b=4).collect()}
    assert merged == direct


@settings(max_examples=6, deadline=None)
@given(
    st.lists(_term, min_size=1, max_size=60),
    st.lists(_term, min_size=1, max_size=60),
)
def test_bloom_no_false_negatives_property(spark, members, probes):
    """For ANY member/probe sets: every member passes its own filter."""
    from convex_batch_processor_spark.llmops import sketches as K

    keys = spark.createDataFrame([(t,) for t in set(members)], "k string")
    words = K.bloom_bitmap(keys, "k", m_bits=256, k=2)  # tiny -> heavy fp, fine
    probe = spark.createDataFrame(
        [(t,) for t in set(members) | set(probes)], "k string"
    )
    hits = {
        r.k: r.hit
        for r in probe.select(
            "k", K.bloom_hit_col("k", words, 256, 2).alias("hit")
        ).collect()
    }
    for m in set(members):
        assert hits[m], m


# --- PII scrubber vs a pure-python re replay ---------------------------------

_WORD = st.text(alphabet="abcdefg xyz.,;-", min_size=0, max_size=30)
_PII = st.sampled_from([
    "user@example.com", "a.b+c@sub.example.org", "+1-555-203-9987",
    "(555) 203-9987", "555 123 4567", "10.0.0.1", "192.168.255.4",
    "not@pii", "1.2.3", "12-34-56",
])


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_WORD, _PII, _WORD), min_size=1, max_size=12))
def test_pii_counts_match_python_re(spark, rows):
    """regexp_count in the JVM must agree with Python re.findall for the
    same patterns on arbitrary word/PII interleavings."""
    import re

    from convex_batch_processor_spark.llmops import pii as P

    texts = [f"{a} {p} {b}" for a, p, b in rows]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r["id"]: {k: r[f"n_{k}"] for k in P.PII_PATTERNS}
        for r in P.scan_pii(df, "text", keep_redacted=False).collect()
    }
    for i, t in enumerate(texts):
        for kind, pat in P.PII_PATTERNS.items():
            assert got[i][kind] == len(re.findall(pat, t)), (t, kind)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=60),
        min_size=2,
        max_size=10,
    )
)
def test_exact_substr_scrub_accounting_property(spark, texts):
    """For any corpus: 0 <= n_removed <= n_tokens, the earliest doc of any
    duplicated text keeps everything, and an empty clean text iff
    n_removed == n_tokens."""
    import hashlib

    from convex_batch_processor_spark.llmops.dedup import exact_substr_scrub

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in exact_substr_scrub(df).collect()}
    first_seen = {}
    for i, t in enumerate(texts):
        toks = tuple(w for w in t.split(" ") if w)
        first_seen.setdefault(toks, i)
    empty_md5 = hashlib.md5(b"").hexdigest()
    for i, t in enumerate(texts):
        r = rows[i]
        toks = tuple(w for w in t.split(" ") if w)
        assert 0 <= r["n_removed"] <= r["n_tokens"] == len(toks)
        if first_seen[toks] == i:
            # the first copy of an exact-duplicate text loses nothing to
            # its OWN duplicates (it may still share spans with others)
            if len(toks) >= 8 and texts.count(t) == len(texts):
                assert r["n_removed"] == 0
        if r["n_removed"] == r["n_tokens"]:
            assert r["clean_md5"] == empty_md5


def test_parse_batch_id_malformed_seq_yields_null(spark):
    """Review r6 (confirmed ANSI crash): a non-numeric seq segment
    ('job::retry') must parse to seq NULL like the reference's non-fatal
    JS parse, not abort the job with CAST_INVALID_INPUT."""
    df = spark.createDataFrame(
        [("job::7",), ("job::retry",), ("plain",), ("a::b::12",)], "batch_id string"
    )
    rows = {
        r.batch_id: (r.base_id, r.seq)
        for r in parse_batch_id(df, "batch_id").collect()
    }
    assert rows["job::7"] == ("job", 7)
    assert rows["job::retry"] == ("job", None)
    assert rows["plain"] == ("plain", None)
    assert rows["a::b::12"] == ("a", 12)  # base = before FIRST '::', seq = after LAST


def test_point_lookup_null_probe_matches_null_rows(spark):
    """Review r6: the reference's q.eq(field, null) MATCHES null-valued
    rows; SQL '=' returns nothing — point_lookup must use null-safe
    equality."""
    from convex_batch_processor_spark.operators.relational import point_lookup

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id long, parent string"
    )
    assert {r.id for r in point_lookup(df, parent=None).collect()} == {1, 3}
    assert {r.id for r in point_lookup(df, parent="x").collect()} == {2}
