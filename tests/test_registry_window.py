"""Round-10 driver-window contract (NOTES "Round-10 rotation plan").

The driver verifies the FIRST 50 registry entries per round; round 7
closed the never-verified backlog (every registered name carries a
driver verdict), so round-8+ windows retire STALE-GREEN verdicts —
names whose reachable code changed after their verdict, machine-derived
by ``tests/stale_green_check.py --next-window``. The round-10 window is
the FINAL backlog window: the 42 remaining oracle-backed stale names
(r5/r6/r7 verdicts invalidated by the r7/r8 fix campaigns, plus this
round's rule-14 round-strips) + 8 oldest-verdict freshness pads. After
its verdicts land the stale ledger is 0 — the 6 permanent rows-only
residents record no hash verdict by contract and are re-covered by
their hash-green portable twins. These tests pin that state so an
accidental import reorder or registry growth fails loudly BEFORE the
driver runs — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The machine-derived round-10 window (stale_green_check --next-window,
# pre-flighted on round-9 final HEAD and re-derived + matched exactly at
# the swap). Order matters: the driver reads the first 50 registry
# entries positionally.
_R10_WINDOW = [
    # r5-verdict stale tier (17)
    "keyset_page_orders", "km_signup_to_purchase",
    "label_propagation_communities", "lang_confusion_matrix",
    "longest_active_streak", "neyman_allocation",
    "ols_trend_daily_revenue", "pagerank_event_graph", "pii_scrub_stats",
    "price_quantity_correlation", "rag_chunk_overlap",
    "repeat_purchase_interval", "scd2_user_state", "token_pack_greedy",
    "token_pmi_pairs", "url_domain_extract",
    "winnowing_fingerprint_pairs",
    # r6-verdict stale tier (22)
    "auc_quantity_returnflag", "best_split_information_gain",
    "calibration_ece_brier", "dp_noisy_counts_by_type",
    "gif_decode_features", "gini_by_segment",
    "histogram_quantile_accuracy", "hll_accuracy_profile",
    "html_extract_text", "join_size_estimate_cms", "journey_triples_topk",
    "kmeans_silhouette", "linear_attribution_credit",
    "logloss_quantity_model", "mojibake_repair_stats",
    "padding_waste_buckets", "pareto_front_parts",
    "sorted_neighborhood_pairs", "warc_extract_stats",
    "web_curation_pipeline", "welch_ttest_priorities",
    "zlib_ratio_classes",
    # r7-verdict stale re-pins (3)
    "asof_join_latest_order", "window_moving_avg",
    "window_rank_lag_running",
    # freshness pads (8): oldest-verdict fresh names
    "bm25_topk", "cdc_chunks", "doc_embedding_join", "lm_trigram_quality",
    "stratified_sample_systematic", "vocab_top_terms",
    "ccnet_perplexity_buckets", "cms_heavy_hitters",
]

_STALE_TIER = _R10_WINDOW[:42]
_PAD_TIER = _R10_WINDOW[42:]


def _latest_verdicts() -> dict[str, int]:
    seen: dict[str, int] = {}
    for r in ("01", "02", "03", "04", "05", "06", "07", "08", "09"):
        path = os.path.join(_REPO, f"CORRECTNESS_r{r}.json")
        with open(path) as f:
            for name in json.load(f):
                seen[name] = max(seen.get(name, 0), int(r))
    return seen


def test_registry_is_279_plus_the_llm72_pack():
    """The freeze (VERDICT r7 #4 / r8 #5) held at 279 through rounds
    7-10's rotations; it lifted late round 10 when the stale backlog
    cleared (NOTES "Post-freeze surface plan") and the pre-flighted
    12-operator llm72 pack registered — at the BACK, outside this
    round's window. This pin moves only with a pre-flighted pack, one
    pack per round max."""
    assert len(QUERIES) == 291, len(QUERIES)
    # the pack sits entirely OUTSIDE the driver window
    from convex_batch_processor_spark.queries.llm72 import CANDIDATES

    assert not (set(CANDIDATES) & set(list(QUERIES)[:50]))


def test_round10_window_is_the_machine_derived_rotation():
    """The first 50 registry entries must equal the stale_green_check
    --next-window output pinned in NOTES, in order."""
    assert list(QUERIES)[:50] == _R10_WINDOW


def test_round10_window_is_the_oldest_verdict_tier():
    """The 42 stale slots carry r5/r6/r7 verdicts with the pinned tier
    sizes (the oldest remaining stale tiers after r9 retired the
    r2/r3/r4 block); the 8 pads are fresher names spent only AFTER every
    re-queueable stale name has a slot."""
    verdicts = _latest_verdicts()
    rounds = {n: verdicts[n] for n in _STALE_TIER}
    assert all(r in (5, 6, 7) for r in rounds.values()), (
        {n: r for n, r in rounds.items() if r not in (5, 6, 7)})
    sizes = {t: sum(1 for r in rounds.values() if r == t) for t in (5, 6, 7)}
    assert sizes == {5: 17, 6: 22, 7: 3}, sizes
    # pads: every one already verdicted (freshness refresh, not backlog)
    assert all(n in verdicts for n in _PAD_TIER), (
        [n for n in _PAD_TIER if n not in verdicts])


def test_round10_window_is_fixture_gated():
    """VERDICT r8 #2: every window name must be covered by a crafted
    adversarial fixture gate's query list BEFORE the driver re-verifies
    it (this window spans the star, documents, embeddings, degenerate,
    null-order, null-keys, short-dup, and single-date gates)."""
    from . import test_adversarial_fixtures as fx

    gated: set[str] = set()
    for attr in dir(fx):
        if "_QUERIES" in attr and attr.startswith("_"):
            gated.update(getattr(fx, attr))
    missing = [n for n in _R10_WINDOW if n not in gated]
    assert missing == [], missing


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing
