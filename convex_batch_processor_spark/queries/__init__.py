"""Named query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable paired with its DuckDB oracle SQL.

Importing this package populates ``QUERIES``; submodules register at import.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, prioritize, register  # noqa: F401

# Import order defines registration order, and the round driver verifies the
# FIRST 50 registry entries against the DuckDB oracle. Round 1 checked the
# relational/analytics/dataflow pack; round 2 the llm/misc/late-tpch pack;
# round 3 llm2 + llm3 + llm. Round 4 front-loads the only entries without a
# driver verdict yet: the whole llm4 pack (registered last in round 3), the
# new round-4 pack (llm5), then llm3 (whose product_quantize_pq crashed the
# round-3 canonicalizer and is now scalarized, and whose kmeans_clusters
# gained an oracle) and llm (sampled_by_lang gained an oracle). Already-green
# queries rotate to the back; the local gate (tests/oracle_check.py) still
# covers all of them every run.
from . import llm4  # noqa: E402,F401  (no driver verdict yet — first this round)
from . import llm5  # noqa: E402,F401  (round-4 additions incl. relocated ivf_search_topk)
from . import llm6  # noqa: E402,F401  (late-r4 sketch pack + image/video codecs — all oracle-backed)
from . import llm3  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import llm2  # noqa: E402,F401
from . import misc  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import dataflow  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_star  # noqa: E402,F401
from . import llm7  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm8  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm9  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm10  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm11  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm12  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm13  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm14  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm15  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm16  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm17  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm18  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm19  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm20  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm21  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm22  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm23  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm24  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm25  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm26  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm27  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm28  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm29  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm30  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm31  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm32  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm33  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm34  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm35  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm36  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm37  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm38  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm39  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm40  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm41  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm42  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm43  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm44  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm45  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm46  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm47  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm48  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm49  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm50  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm51  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm52  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm53  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm54  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm55  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm56  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm57  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm58  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm59  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm60  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm61  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm62  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm63  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm64  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm65  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm66  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm67  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm68  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm69  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm70  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)
from . import llm71  # noqa: E402,F401  (late-r4, post-window — round-5 rotation material)


# Round-9 rotation (NOTES.md "Round-9 rotation plan"): the driver verifies
# the FIRST 50 registry entries; every window since round 8 retires
# STALE-GREEN verdicts — names whose reachable code changed after their
# verdict (machine-derived by `tests/stale_green_check.py --next-window`
# on round-8 post-fix HEAD, re-run and matched exactly at the round-9
# swap). This window carries the names the r7/r8 fix campaigns changed
# most: the remaining r2 tier (incl. the q4/q8 ANSI-division fixes), the
# ADVICE-realigned grouped_map_zscore, the four codec hardenings
# (audio/image/video decode + gif queued r10), language_id's persist,
# and bloom_decontamination_prefilter's rework. All 50 pre-flighted this
# round: adversarial fixture gates (every name appears in a gate's query
# list; 323 gate tests green) + 50/50 oracle parity at sf0.01. Registry
# stays frozen at 279 until the stale backlog is under one window
# (NOTES §"Post-backlog freeze policy"); ~48 names remain for r10.
prioritize([
    # r2-verdict tier (10), oldest first — stale_green_check order
    "q2_min_cost_supplier", "q4_priority_with_late_lines",
    "q6_forecast_revenue", "q8_market_share", "q9_product_type_profit",
    "scalar_subquery_filter", "sessionize_events",
    "sql_api_revenue_by_nation", "string_functions",
    "unpivot_doc_metrics",
    # r3-verdict tier (8)
    "corpus_report", "eval_contamination", "grouped_map_zscore",
    "lm_bigram_quality", "token_pack_chunks", "training_data_pipeline",
    "training_mix_report", "training_pipeline_v2",
    # r4-verdict tier (22) — incl. the r8 review-pass fixes
    "audio_decode_features", "bloom_decontamination_prefilter",
    "dup_span_coverage", "event_type_transitions", "hll_distinct_by_lang",
    "image_decode_features", "kmeans_clusters", "language_id",
    "length_curriculum_buckets", "minhash_portable_neardup",
    "ngram_novelty_score", "pca_top_component", "product_quantize_pq",
    "sampled_by_lang", "semantic_dedup_kmeans", "session_window_agg",
    "text_quality_stats", "token_budget_allocation", "vector_stats",
    "video_frame_stats", "view_purchase_attribution",
    "winsorize_event_values",
    # r5-verdict tier (10) — fills the window
    "asof_join_next_order", "bootstrap_order_price_means",
    "cosine_lsh_portable_neardup", "dup_cluster_size_census",
    "edit_distance_neardup", "event_debounce",
    "event_sequence_violations", "golden_record_merge",
    "histogram_median_price", "hll_union_sources",
])


def spark_queries():
    """The ``queries()`` dict for the driver contract."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sqls():
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible only)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
