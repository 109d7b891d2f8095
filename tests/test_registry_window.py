"""Round-5 driver-window contract (NOTES "Round-5 rotation plan").

The driver verifies the FIRST 50 registry entries per round; rounds 1-4
left 131 entries with no verdict, and round 5's single highest-leverage
deliverable is spending the whole window on them. These tests pin that
state so an accidental import reorder or registry growth fails loudly
BEFORE the driver runs — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _verified_before_round5() -> set[str]:
    seen: set[str] = set()
    for r in ("01", "02", "03", "04"):
        with open(os.path.join(_REPO, f"CORRECTNESS_r{r}.json")) as f:
            seen |= set(json.load(f))
    return seen


def test_registry_frozen_at_279():
    """VERDICT r4 #2: no new packs in round 5 until the verification
    backlog fits one window."""
    assert len(QUERIES) == 279, len(QUERIES)


def test_round5_window_spends_every_slot_on_unverified_entries():
    """The only previously-checked name allowed in the window is
    token_pack_greedy, re-queued because its oracle landed AFTER its
    last driver check (standing verdict: err no_oracle)."""
    names = list(QUERIES)[:50]
    already = [n for n in names if n in _verified_before_round5()]
    assert already == ["token_pack_greedy"], already


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing
