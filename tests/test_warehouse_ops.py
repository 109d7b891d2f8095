"""llm8 warehouse/pipeline pack: plan contracts + winnowing properties.

Correctness of every llm8 query is already covered by the DuckDB parity
gate (test_oracle_parity); these tests pin the 100 TB plan shapes and the
winnowing guarantee on inputs the fixed testdata never produces.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from convex_batch_processor_spark.llmops.dedup import winnow_fingerprints
from convex_batch_processor_spark.plans import explain as E
from convex_batch_processor_spark.queries import QUERIES


def q(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)


# --- plan contracts ---------------------------------------------------------


def test_winnowing_pairs_no_cartesian(spark, sf_dir):
    """Fingerprint pairing must stay an inverted-index equi-join — never
    an all-pairs doc x doc plan."""
    plan = E.physical_plan(q(spark, sf_dir, "winnowing_fingerprint_pairs"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_fingerprints_is_map_only(spark, sf_dir):
    """Fingerprint extraction itself shuffles nothing: hash array +
    window-min explode are one map-side pipeline."""
    from convex_batch_processor_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert E.count_exchanges(winnow_fingerprints(docs)) == 0


def test_pagerank_scans_events_once(spark, sf_dir):
    """The iteration loop must run on the persisted edge aggregate
    (|types|^2 rows) — exactly one corpus scan for edge extraction, not
    one per PR iteration."""
    # other tests (and the parity gate) leave persisted DataFrames on the
    # shared session; Catalyst cache substitution would skew the plan's
    # scan/InMemoryRelation counts — start from a clean cache
    spark.catalog.clearCache()
    df = q(spark, sf_dir, "pagerank_event_graph")
    try:
        plan = E.physical_plan(df)
        # every parquet-scan occurrence in the plan text sits inside a
        # cached InMemoryRelation printout — i.e. no subtree reads events
        # directly; the cache materializes the one real scan
        assert "InMemoryTableScan" in plan
        assert plan.count("Scan parquet") == plan.count("InMemoryRelation"), plan
    finally:
        spark.catalog.clearCache()


def test_weighted_sample_uses_take_ordered(spark, sf_dir):
    """A-ES top-n must compile to TakeOrdered (per-partition top-n +
    driver merge), never a global sort shuffle."""
    assert E.uses_take_ordered(q(spark, sf_dir, "weighted_sample_orders"))


def test_mad_outliers_broadcasts_median_state(spark, sf_dir):
    """The med/MAD join-backs are bounded per-type rows: broadcast, no
    shuffle of the event stream for the join."""
    assert E.uses_broadcast_join(q(spark, sf_dir, "mad_outliers"))


def test_scd2_no_global_window(spark, sf_dir):
    """Every window in the SCD2 build is user-partitioned — a global
    (unpartitioned) window over events would serialize the corpus."""
    assert E.global_window_inputs(q(spark, sf_dir, "scd2_user_state")) == []


def test_gapfill_no_cartesian(spark, sf_dir):
    plan = E.physical_plan(q(spark, sf_dir, "gapfill_daily_counts"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rag_chunking_is_map_only(spark, sf_dir):
    """Chunking must not shuffle: token array + integer-sequence explode
    + slice/hash is one map-side pipeline."""
    assert E.count_exchanges(q(spark, sf_dir, "rag_chunk_overlap")) == 0


def test_hard_negatives_broadcast_query_side(spark, sf_dir):
    assert E.uses_broadcast_join(q(spark, sf_dir, "hard_negative_mining"))


def test_time_decay_single_user_shuffle(spark, sf_dir):
    """Decay weighting is map-side; the only corpus-scale exchange is the
    final user-keyed aggregation (the reference-date scalar runs through
    a 1-row SinglePartition + broadcast, which is control-plane)."""
    plan = E.physical_plan(q(spark, sf_dir, "time_decay_user_score"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(user_id" in plan


def test_label_balance_no_global_window(spark, sf_dir):
    """The undersample rank is label-partitioned — never a global
    window over the corpus."""
    assert E.global_window_inputs(q(spark, sf_dir, "label_balance_undersample")) == []


def test_supplier_triangles_all_equi_joins(spark, sf_dir):
    """Ordered-edge triangle enumeration must stay equi-joins — a
    nested-loop anywhere means the hot-part cap or the join keys broke."""
    try:
        plan = E.physical_plan(q(spark, sf_dir, "supplier_triangles"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        spark.catalog.clearCache()


def test_token_pmi_prunes_postings_with_broadcast_vocab(spark, sf_dir):
    try:
        assert E.uses_broadcast_join(q(spark, sf_dir, "token_pmi_pairs"))
    finally:
        spark.catalog.clearCache()


def test_burst_detection_no_global_window(spark, sf_dir):
    """Trailing windows are type-partitioned over the bounded grid —
    never an unpartitioned window."""
    assert E.global_window_inputs(q(spark, sf_dir, "burst_detection_daily")) == []


def test_pareto_and_km_global_windows_are_value_bounded(spark, sf_dir):
    """revenue_pareto_bands and km_signup_to_purchase run their only
    unpartitioned windows over VALUE-BOUNDED tables (price bands / day
    grid), never over corpus rows — same contract as histogram_rank."""
    for name, allowed in [
        ("revenue_pareto_bands", {"band", "n_orders", "rev"}),
        # two bounded windows: the risk-set cumsum (per-day counts + the
        # N scalar + Spark's internal window attr) and the lf cumsum
        (
            "km_signup_to_purchase",
            {"day", "d_t", "c_t", "n0", "_w1", "n_events", "n_censored", "n_risk", "lf"},
        ),
    ]:
        for cols in E.global_window_inputs(q(spark, sf_dir, name)):
            assert cols <= allowed, (name, cols)


# --- winnowing properties ---------------------------------------------------

_K = 4
_W = 4

_tok = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])


def _fps(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = {}
    for r in winnow_fingerprints(df, k=_K, w=_W).collect():
        out.setdefault(r.doc_id, set()).add(r.fp)
    return out


@settings(max_examples=6, deadline=None)  # each example is a Spark job
@given(
    st.lists(_tok, min_size=_K + _W - 1, max_size=20),  # shared span
    st.lists(_tok, min_size=0, max_size=15),  # doc-a prefix
    st.lists(_tok, min_size=0, max_size=15),  # doc-a suffix
    st.lists(_tok, min_size=0, max_size=15),  # doc-b prefix
    st.lists(_tok, min_size=0, max_size=15),  # doc-b suffix
)
def test_winnowing_shared_span_guarantee(spark, span, pa, sa, pb, sb):
    """The MOSS guarantee: two docs sharing a contiguous run of
    >= k + w - 1 tokens share at least one selected fingerprint,
    wherever the run sits in either doc."""
    fps = _fps(spark, [pa + span + sa, pb + span + sb])
    assert fps.get(0, set()) & fps.get(1, set())


@settings(max_examples=4, deadline=None)
@given(st.lists(_tok, min_size=0, max_size=_K + _W - 2))
def test_winnowing_short_docs_emit_nothing(spark, toks):
    """Docs below the k + w - 1 guarantee threshold yield no
    fingerprints (callers union a whole-doc hash if they need them)."""
    assert _fps(spark, [toks]) == {}


@pytest.mark.parametrize("w", [2, 4, 8])
def test_winnowing_density_shrinks_with_window(spark, sf_dir, w):
    """Winnowing selects ~2/(w+1) of gram hashes: a larger window must
    never select more fingerprints (per doc, distinct-counted)."""
    from convex_batch_processor_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    n = winnow_fingerprints(docs, w=w).count()
    n2 = winnow_fingerprints(docs, w=w * 2).count()
    assert n2 <= n


def test_asof_forward_excludes_same_instant_order(spark):
    """Strict-after semantics on a crafted collision (absent from the
    fixed testdata): an order dated exactly at the event timestamp must
    NOT match; the next later order must."""
    from convex_batch_processor_spark.queries.llm17 import asof_forward

    ev = spark.createDataFrame(
        [(1, 7, "2024-01-05 00:00:00")], "event_id long, user_id long, ts string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    orders = spark.createDataFrame(
        [(100, 7, "2024-01-05 00:00:00"), (200, 7, "2024-01-06 00:00:00")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr("o_orderkey", "o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
    [row] = asof_forward(ev, orders).collect()
    assert row.o_orderkey == 200

    # and an event strictly before both orders takes the earliest one
    ev2 = spark.createDataFrame(
        [(2, 7, "2024-01-04 00:00:00")], "event_id long, user_id long, ts string"
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    [row2] = asof_forward(ev2, orders).collect()
    assert row2.o_orderkey == 100


def test_keyset_page_pushes_cursor_and_takes_ordered(spark, sf_dir):
    """The whole point of keyset pagination: the cursor predicate reaches
    the scan (row-group pruning) and the page is a TakeOrdered, so page
    depth never changes cost."""
    df = q(spark, sf_dir, "keyset_page_orders")
    assert E.uses_take_ordered(df)
    assert E.has_pushed_filter(df, "o_orderdate")
