"""Round-7 driver-window contract (NOTES "Round-7 rotation plan").

The driver verifies the FIRST 50 registry entries per round; rounds 1-6
checked 244 distinct current names (round 6 went 50/50 green), leaving
exactly 35 registered names with no verdict. Round 7's window = the two
IVF STALE-GREEN re-queues (ivf_assign was rewritten map-side in r5 and
guarded in r6 AFTER their r4/r3 verdicts) + ALL 35 never-verified
backlog entries + 13 freshness fillers (oldest r1 verdicts, code
unchanged since r1). After this window lands every registered query has
a driver verdict. These tests pin that state so an accidental import
reorder or registry growth fails loudly BEFORE the driver runs — no
Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Names in the round-7 window that legitimately carry a pre-round-7
# verdict: the two IVF stale-green re-queues (implementation changed
# after their verdicts) and the 13 freshness fillers (r1 verdicts being
# refreshed by design — code unchanged since r1).
_REQUEUES = {"ivf_search_topk", "ivf_centroid_assign"}
_FRESHNESS = {
    "window_rank_lag_running", "window_moving_avg", "cube_pricing",
    "rollup_year_priority", "pivot_status_qty", "asof_join_latest_order",
    "s11_delete_anti_join", "s10_state_upsert", "tumbling_window_counts",
    "sliding_window_counts", "f6_null_coalesce_guards",
    "window_distribution", "window_range_frame",
}


def _verified_before_round7() -> set[str]:
    seen: set[str] = set()
    for r in ("01", "02", "03", "04", "05", "06"):
        with open(os.path.join(_REPO, f"CORRECTNESS_r{r}.json")) as f:
            seen |= set(json.load(f))
    return seen


def test_registry_frozen_at_279_until_window_lands():
    """VERDICT r5 #2 / r6 #3: the registry stays frozen at 279 until the
    round-7 window lands (verification backlog zero); afterwards growth
    follows NOTES "Post-backlog freeze policy" and this pin moves with
    each pre-flighted pack."""
    assert len(QUERIES) == 279, len(QUERIES)


def test_round7_window_covers_the_entire_backlog():
    """The 35 slots between the re-queues and the fillers must be
    exactly the set of registered names with NO verdict in rounds 1-6 —
    after round 7, builder-claimed == driver-verified."""
    names = list(QUERIES)[:50]
    verified = _verified_before_round7()
    backlog_in_window = {n for n in names if n not in verified}
    backlog_in_registry = {n for n in QUERIES if n not in verified}
    assert backlog_in_window == backlog_in_registry, (
        backlog_in_registry - backlog_in_window)
    assert len(backlog_in_window) == 35, len(backlog_in_window)


def test_round7_window_leads_with_the_ivf_requeues():
    """The stale-green re-queues head the window so their outdated
    verdicts are replaced first."""
    assert list(QUERIES)[:2] == ["ivf_search_topk", "ivf_centroid_assign"]


def test_round7_previously_verified_slots_are_only_documented_ones():
    """Every window slot carrying a prior verdict must be a documented
    re-queue or freshness filler — no accidental double-spend."""
    names = list(QUERIES)[:50]
    already = {n for n in names if n in _verified_before_round7()}
    assert already == (_REQUEUES | _FRESHNESS), (
        already ^ (_REQUEUES | _FRESHNESS))


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing
