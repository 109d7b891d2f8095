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


# Round-5 rotation (NOTES.md "Round-5 rotation plan"): the driver verifies
# the FIRST 50 registry entries, and everything checked in rounds 1-4 is
# already green, so the window is spent entirely on never-verified entries:
# token_pack_greedy (its oracle landed AFTER its last driver check, so its
# standing verdict is still err:"no_oracle"), then the oldest unverified
# packs in registration order (llm tail, llm7..llm22), filled to exactly 50
# from llm23..llm28. llm29..llm42 queue for round 6, llm43..llm71 for round
# 7. Import order above is left untouched — prioritize() expresses the
# window explicitly and raises on typos.
prioritize([
    "token_pack_greedy",
    "edit_distance_neardup",
    "hll_union_sources",
    # llm8
    "scd2_user_state", "gapfill_daily_counts", "winnowing_fingerprint_pairs",
    "dq_constraint_report", "weighted_sample_orders", "mad_outliers",
    "pagerank_event_graph",
    # llm9
    "rag_chunk_overlap", "hard_negative_mining", "label_balance_undersample",
    "time_decay_user_score", "dataset_split_folds",
    # llm10
    "token_pmi_pairs", "supplier_triangles", "burst_detection_daily",
    "golden_record_merge",
    # llm11
    "benford_order_prices", "km_signup_to_purchase",
    # llm12
    "zorder_layout_stats", "neyman_allocation", "cosine_lsh_portable_neardup",
    # llm13
    "repeat_purchase_interval", "revenue_pareto_bands",
    # llm14
    "dup_cluster_size_census", "lang_confusion_matrix",
    # llm15
    "event_sequence_violations", "user_rfm_segments",
    # llm16..llm22
    "catalog_stats_profile",
    "cdc_apply_changelog", "asof_join_next_order",
    "bootstrap_order_price_means", "market_basket_rules", "ts_feature_matrix",
    "label_propagation_communities",
    "psi_value_drift", "chi2_independence_cells",
    # llm23..llm28 fill
    "event_debounce", "longest_active_streak",
    "vocab_entropy_by_source", "keyset_page_orders",
    "price_quantity_correlation", "histogram_median_price",
    "ctr_wilson_bounds", "window_funnel_depth",
    "ols_trend_daily_revenue",
    "pii_scrub_stats", "url_domain_extract",
])


def spark_queries():
    """The ``queries()`` dict for the driver contract."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sqls():
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible only)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
