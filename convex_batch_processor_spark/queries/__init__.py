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


# Round-8 rotation (NOTES.md "Round-8 rotation plan"): the driver verifies
# the FIRST 50 registry entries; round 7 went 50/50 green and closed the
# never-verified backlog, so from here every window retires STALE-GREEN
# verdicts — names whose reachable code changed after their verdict
# (machine-derived by `tests/stale_green_check.py --next-window` on
# round-7 final HEAD, re-run and matched at the round-8 swap). This
# window is the OLDEST tier: r1/r2 verdicts (relational / analytics /
# TPC-H packs) that predate the catalog normalize_ts/load_table
# hardening and the dedup refactors. All 50 are covered by the crafted
# adversarial star fixture (tests/test_adversarial_fixtures.py
# _STAR_QUERIES — added round 7 precisely so this tier re-verifies
# against boundary inputs before the driver re-hashes it). Registry
# stays frozen at 279 until the stale backlog is under one window
# (NOTES §"Post-backlog freeze policy").
prioritize([
    # r1-verdict tier (34), oldest first — stale_green_check order
    "a3_next_sequence", "agg_having", "array_functions_pack",
    "collect_list_agg", "distinct_agg", "exact_percentiles",
    "f4_backoff_schedule", "grouping_sets_pricing", "j1_per_key_agg_join",
    "j2_anti_not_exists", "j2_semi_exists", "json_extract_props",
    "o2_topk_orders", "p1_projection_view", "p4_status_guard_branch",
    "p5_batch_id_roundtrip", "q10_returned_items",
    "q18_large_volume_customer", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q7_volume_shipping", "s1_point_lookup", "s2_snapshot_range_scan",
    "s3_key_collect", "scalar_datetime_math", "set_except",
    "set_except_all", "set_intersect", "set_intersect_all",
    "topk_per_group", "u1_union_views", "u2_explode_tokens",
    "w1_retention_doomed", "w2_latest_per_key",
    # r2-verdict tier (15)
    "correlated_avg_filter", "date_arithmetic", "dedup_keep_best",
    "neardup_components", "q11_important_part_value",
    "q12_shipping_delay_priority", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_count",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q20_excess_shippers", "q21_waiting_supplier",
    "q22_dormant_customer_balance",
])


def spark_queries():
    """The ``queries()`` dict for the driver contract."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sqls():
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible only)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
