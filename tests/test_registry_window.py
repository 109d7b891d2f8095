"""Round-6 driver-window contract (NOTES "Round-6 rotation plan").

The driver verifies the FIRST 50 registry entries per round; rounds 1-5
checked 197 distinct queries (round 5 went 50/50 green), of which 196
still exist under their checked name (multimodal_decode_features was
renamed), leaving 83 current names with no verdict. Round 6's window =
3 documented re-queues + 47 never-verified entries in registration
order (35 more queue for round 7). These tests pin that state so an
accidental import reorder or registry growth fails loudly BEFORE the
driver runs — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Names in the round-6 window that legitimately carry a pre-round-6
# verdict: minhash_estimate_neardup + semantic_dedup_keep were checked in
# round 3 as rows-only (err no_oracle) and gained DuckDB oracles in round
# 5 AFTER that check; payload_byte_stats was renamed in round 5 from
# multimodal_decode_features, so its r4-green verdict is under the old
# name and the driver has never recorded one under the new name.
_REQUEUES = {"minhash_estimate_neardup", "semantic_dedup_keep"}


def _verified_before_round6() -> set[str]:
    seen: set[str] = set()
    for r in ("01", "02", "03", "04", "05"):
        with open(os.path.join(_REPO, f"CORRECTNESS_r{r}.json")) as f:
            seen |= set(json.load(f))
    return seen


def test_registry_frozen_at_279():
    """VERDICT r5 #2: the registry stays frozen at 279 until the
    verification backlog is zero (end of round 7)."""
    assert len(QUERIES) == 279, len(QUERIES)


def test_round6_window_spends_every_slot_on_unverified_entries():
    """Only the documented re-queues may appear with a prior verdict;
    the other 48 slots (payload_byte_stats has no verdict under its
    post-rename name) must be first-time verifications."""
    names = list(QUERIES)[:50]
    already = sorted(n for n in names if n in _verified_before_round6())
    assert already == sorted(_REQUEUES), already


def test_round6_window_leads_with_the_requeues():
    """The three re-queues head the window so their stale no_oracle /
    renamed verdicts are replaced first."""
    assert list(QUERIES)[:3] == [
        "minhash_estimate_neardup", "semantic_dedup_keep",
        "payload_byte_stats",
    ]


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing
