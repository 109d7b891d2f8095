"""Round-8 driver-window contract (NOTES "Round-8 rotation plan").

The driver verifies the FIRST 50 registry entries per round; round 7
closed the never-verified backlog (every registered name now carries a
driver verdict), so round-8+ windows retire STALE-GREEN verdicts —
names whose reachable code changed after their verdict, machine-derived
by ``tests/stale_green_check.py --next-window`` on round-7 final HEAD.
The round-8 window is the OLDEST tier: 35 r1-verdict + 15 r2-verdict
names from the relational/analytics/TPC-H packs that
predate the catalog normalize_ts/load_table hardening. These tests pin
that state so an accidental import reorder or registry growth fails
loudly BEFORE the driver runs — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The machine-derived round-8 window (stale_green_check --next-window on
# round-7 final HEAD; re-validated at the swap). Order matters: the
# driver reads the first 50 registry entries positionally.
_R8_WINDOW = [
    # r1-verdict tier (35)
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
]


def _latest_verdicts() -> dict[str, int]:
    seen: dict[str, int] = {}
    for r in ("01", "02", "03", "04", "05", "06", "07"):
        path = os.path.join(_REPO, f"CORRECTNESS_r{r}.json")
        with open(path) as f:
            for name in json.load(f):
                seen[name] = max(seen.get(name, 0), int(r))
    return seen


def test_registry_frozen_at_279_until_stale_backlog_clears():
    """VERDICT r7 #4: the registry stays frozen at 279 until the
    stale-green backlog is under one window (~50); afterwards growth
    follows NOTES "Post-backlog freeze policy" and this pin moves with
    each pre-flighted pack."""
    assert len(QUERIES) == 279, len(QUERIES)


def test_round8_window_is_the_machine_derived_rotation():
    """The first 50 registry entries must equal the stale_green_check
    --next-window output pinned in NOTES, in order."""
    assert list(QUERIES)[:50] == _R8_WINDOW


def test_round8_window_is_the_oldest_verdict_tier():
    """Every window name carries an r1/r2 verdict (the oldest stale
    tier) — the window spends no slot on a fresher verdict while older
    stale-green names remain."""
    verdicts = _latest_verdicts()
    rounds = {n: verdicts[n] for n in _R8_WINDOW}
    assert all(r in (1, 2) for r in rounds.values()), (
        {n: r for n, r in rounds.items() if r not in (1, 2)})
    assert sum(1 for r in rounds.values() if r == 1) == 35, rounds


def test_round8_window_is_fixture_gated():
    """VERDICT r7 #5: every window name must be covered by the crafted
    adversarial star fixture BEFORE the driver re-verifies it."""
    from .test_adversarial_fixtures import _STAR_QUERIES

    missing = [n for n in _R8_WINDOW if n not in _STAR_QUERIES]
    assert missing == [], missing


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing
