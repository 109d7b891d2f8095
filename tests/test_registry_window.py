"""Round-9 driver-window contract (NOTES "Round-9 rotation plan").

The driver verifies the FIRST 50 registry entries per round; round 7
closed the never-verified backlog (every registered name now carries a
driver verdict), so round-8+ windows retire STALE-GREEN verdicts —
names whose reachable code changed after their verdict, machine-derived
by ``tests/stale_green_check.py --next-window``. The round-9 window
carries the names the r7/r8 fix campaigns changed most: the remaining
r2 tier, then the r3/r4/r5 verdicts invalidated by the review passes
(codec hardenings, language_id persist, bloom rework, the
ADVICE-realigned grouped_map_zscore). These tests pin that state so an
accidental import reorder or registry growth fails loudly BEFORE the
driver runs — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The machine-derived round-9 window (stale_green_check --next-window on
# round-8 post-fix HEAD; re-derived and matched exactly at the swap).
# Order matters: the driver reads the first 50 registry entries
# positionally.
_R9_WINDOW = [
    # r2-verdict tier (10)
    "q2_min_cost_supplier", "q4_priority_with_late_lines",
    "q6_forecast_revenue", "q8_market_share", "q9_product_type_profit",
    "scalar_subquery_filter", "sessionize_events",
    "sql_api_revenue_by_nation", "string_functions",
    "unpivot_doc_metrics",
    # r3-verdict tier (8)
    "corpus_report", "eval_contamination", "grouped_map_zscore",
    "lm_bigram_quality", "token_pack_chunks", "training_data_pipeline",
    "training_mix_report", "training_pipeline_v2",
    # r4-verdict tier (22)
    "audio_decode_features", "bloom_decontamination_prefilter",
    "dup_span_coverage", "event_type_transitions", "hll_distinct_by_lang",
    "image_decode_features", "kmeans_clusters", "language_id",
    "length_curriculum_buckets", "minhash_portable_neardup",
    "ngram_novelty_score", "pca_top_component", "product_quantize_pq",
    "sampled_by_lang", "semantic_dedup_kmeans", "session_window_agg",
    "text_quality_stats", "token_budget_allocation", "vector_stats",
    "video_frame_stats", "view_purchase_attribution",
    "winsorize_event_values",
    # r5-verdict tier (10)
    "asof_join_next_order", "bootstrap_order_price_means",
    "cosine_lsh_portable_neardup", "dup_cluster_size_census",
    "edit_distance_neardup", "event_debounce",
    "event_sequence_violations", "golden_record_merge",
    "histogram_median_price", "hll_union_sources",
]


def _latest_verdicts() -> dict[str, int]:
    seen: dict[str, int] = {}
    for r in ("01", "02", "03", "04", "05", "06", "07", "08"):
        path = os.path.join(_REPO, f"CORRECTNESS_r{r}.json")
        with open(path) as f:
            for name in json.load(f):
                seen[name] = max(seen.get(name, 0), int(r))
    return seen


def test_registry_frozen_at_279_until_stale_backlog_clears():
    """VERDICT r7 #4 / r8 #5: the registry stays frozen at 279 until the
    stale-green backlog is under one window (~50); afterwards growth
    follows NOTES "Post-backlog freeze policy" and this pin moves with
    each pre-flighted pack."""
    assert len(QUERIES) == 279, len(QUERIES)


def test_round9_window_is_the_machine_derived_rotation():
    """The first 50 registry entries must equal the stale_green_check
    --next-window output pinned in NOTES, in order."""
    assert list(QUERIES)[:50] == _R9_WINDOW


def test_round9_window_is_the_oldest_verdict_tier():
    """Every window name carries an r2–r5 verdict (the oldest remaining
    stale tiers after r8 retired the r1/r2 block) with the pinned tier
    sizes — the window spends no slot on a fresher verdict while older
    stale-green names remain."""
    verdicts = _latest_verdicts()
    rounds = {n: verdicts[n] for n in _R9_WINDOW}
    assert all(r in (2, 3, 4, 5) for r in rounds.values()), (
        {n: r for n, r in rounds.items() if r not in (2, 3, 4, 5)})
    sizes = {t: sum(1 for r in rounds.values() if r == t) for t in (2, 3, 4, 5)}
    assert sizes == {2: 10, 3: 8, 4: 22, 5: 10}, sizes


def test_round9_window_is_fixture_gated():
    """VERDICT r8 #2: every window name must be covered by a crafted
    adversarial fixture gate's query list BEFORE the driver re-verifies
    it (this window spans the star, documents, embeddings, degenerate,
    null-order, and null-keys gates — not just the star fixture)."""
    from . import test_adversarial_fixtures as fx

    gated: set[str] = set()
    for attr in dir(fx):
        if "_QUERIES" in attr and attr.startswith("_"):
            gated.update(getattr(fx, attr))
    missing = [n for n in _R9_WINDOW if n not in gated]
    assert missing == [], missing


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing
