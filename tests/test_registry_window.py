"""Round-11 driver-window contract (NOTES "Round-11 rotation plan").

The driver verifies the FIRST 50 registry entries per round. Round 10
retired the stale backlog (ledger 0) and lifted the registry freeze,
registering the pre-flighted llm72 pack at the BACK. The round-11
window therefore carries the 10 oracle-backed llm72 names (the only
never-verified backlog — placed by hand, since ``--next-window`` only
proposes already-verdicted names), the ONE deliberate stale requeue
(corpus_report, whose r9 verdict went stale when the r10 sf0.1-sweep
rule-14b fix landed), and 39 machine-derived freshness pads. These
tests pin that state so an accidental import reorder or registry growth
fails loudly BEFORE the driver runs — no Spark session needed.
"""

from __future__ import annotations

import json
import os

from convex_batch_processor_spark.queries import QUERIES

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The round-11 window (NOTES "Round-11 rotation plan": the 10 llm72
# oracle names by hand + stale_green_check --next-window's requeue +
# pad proposal, re-derived and matched exactly at the swap). Order
# matters: the driver reads the first 50 registry entries positionally.
_R11_WINDOW = [
    # llm72 pack, oracle-backed (10) — never-verified backlog
    "substring_dedup_spans", "kneser_ney_doc_logprob",
    "hits_part_supplier", "rank_gauss_prices", "temperature_mix_weights",
    "stratified_reservoir_sample", "keyword_tag_counts",
    "tenure_hazard_table", "embedding_dim_standardize",
    "phrase_tag_spans",
    # the one stale oracle-backed requeue (r10 rule-14b fix)
    "corpus_report",
    # freshness pads (39): oldest-verdict fresh names, tool order
    "dedup_exact", "dedup_prefix_groups", "doc_fingerprints",
    "dsir_importance_weights", "embedding_neardup_pairs",
    "embedding_quantize_int8", "funnel_conversion",
    "gopher_quality_filter", "incremental_dedup_delta", "knn_bruteforce",
    "lang_source_profile", "mixture_weights_sqrt",
    "multimodal_payload_stats", "new_vs_returning_users",
    "ngram_jaccard_pairs", "repetition_top_bigram", "retention_cohorts",
    "rolling_weekly_active_users", "simhash_portable_neardup",
    "snapshot_state_diff", "source_cap_sample", "tfidf_topk_terms",
    "value_histogram", "zipf_vocab_fit", "benford_order_prices",
    "burst_detection_daily", "catalog_stats_profile",
    "cdc_apply_changelog", "chi2_independence_cells",
    "ctr_wilson_bounds", "dataset_split_folds", "dq_constraint_report",
    "gapfill_daily_counts", "hard_negative_mining",
    "label_balance_undersample", "mad_outliers", "market_basket_rules",
    "psi_value_drift", "revenue_pareto_bands",
]

_PACK_TIER = _R11_WINDOW[:10]
_REQUEUE = _R11_WINDOW[10]
_PAD_TIER = _R11_WINDOW[11:]


def _latest_verdicts() -> dict[str, int]:
    seen: dict[str, int] = {}
    for r in ("01", "02", "03", "04", "05", "06", "07", "08", "09", "10"):
        path = os.path.join(_REPO, f"CORRECTNESS_r{r}.json")
        with open(path) as f:
            for name in json.load(f):
                seen[name] = max(seen.get(name, 0), int(r))
    return seen


def test_registry_is_291_plus_any_registered_pack():
    """The llm72 pack registered late r10 (279 -> 291); the llm73 pack
    registers at the ROUND-11 CLOSE (291 -> 301, NOTES one-pack-per-
    round cadence). This pin moves only with a pre-flighted pack."""
    assert len(QUERIES) in (291, 301), len(QUERIES)


def test_round11_window_is_the_pinned_rotation():
    """The first 50 registry entries must equal the NOTES round-11
    rotation (10 llm72 names + requeue + the --next-window pads),
    in order."""
    assert list(QUERIES)[:50] == _R11_WINDOW


def test_round11_window_tiers():
    """Tier shape: the 10 pack names have NO driver verdict yet (the
    whole point of fronting them); corpus_report's latest verdict is r9
    (stale since the r10 rule-14b fix); every pad is already verdicted
    (freshness refresh, not backlog)."""
    verdicts = _latest_verdicts()
    never = [n for n in _PACK_TIER if n in verdicts]
    assert never == [], f"pack names already verdicted: {never}"
    assert verdicts.get(_REQUEUE) == 9, verdicts.get(_REQUEUE)
    missing = [n for n in _PAD_TIER if n not in verdicts]
    assert missing == [], missing


def test_round11_window_is_fixture_gated():
    """VERDICT r8 #2: every window name must be covered by a crafted
    adversarial fixture gate's query list BEFORE the driver re-verifies
    it. The pads + requeue span test_adversarial_fixtures' gates; pack
    names are gated by their pre-flight suite's own boundary fixture
    (NOTES r11 swap caveat (a)). The union is built GENERICALLY over
    every tests/test_r*_preflight module so future swaps cannot forget
    to extend it: a pack suite only counts if it actually parametrizes
    a boundary-fixture parity test over its CANDIDATES."""
    import glob as _glob
    import importlib

    from . import test_adversarial_fixtures as fx

    gated: set[str] = set()
    for attr in dir(fx):
        if "_QUERIES" in attr and attr.startswith("_"):
            gated.update(getattr(fx, attr))
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(_glob.glob(os.path.join(here, "test_r*_preflight.py"))):
        mod = importlib.import_module(
            f"tests.{os.path.basename(path)[:-3]}"
        )
        if not hasattr(mod, "test_preflight_boundary_parity"):
            continue  # no crafted fixture -> contributes nothing
        qmod = importlib.import_module(mod.CANDIDATES_MODULE) if hasattr(
            mod, "CANDIDATES_MODULE") else None
        cands = getattr(mod, "CANDIDATES", None) or (
            qmod.CANDIDATES if qmod else {})
        gated.update(cands)
    missing = [n for n in _R11_WINDOW if n not in gated]
    assert missing == [], missing
    # and the current pack tier must come from a suite, not be assumed
    assert set(_PACK_TIER) <= gated


def test_every_window_entry_is_oracle_backed():
    """A window slot spent on a rows-only entry is wasted — all 50 must
    carry DuckDB oracle SQL so the driver records a full hash verdict."""
    missing = [n for n in list(QUERIES)[:50] if not QUERIES[n].oracle]
    assert missing == [], missing


def test_window_oracles_carry_no_rounded_exact_ratio():
    """Rule-14 regression gate for THIS window (the r10 sf0.1 sweep
    proved the class fires in practice): no in-window oracle may
    round() a division/product of exact-decimal operands with no
    transcendental leaf inside. round() whose argument contains a
    transcendental (ln/log/sqrt/exp/pow — leaf-rounding absorbs libm
    ulp skew, and a tie is measure-zero) is the documented-safe shape,
    as are integer cents casts round(value * 100) of 2-dp data (never
    near a half) and the int8 quantizer's round(x/scale) algorithm
    semantics (data-dependent operands, measure-zero)."""
    import re

    trans = re.compile(r"\b(ln|log|log10|log2|sqrt|exp|pow|power)\s*\(", re.I)
    cents = re.compile(r"^\s*(CAST\()?\s*\w+(\.\w+)?\s*\*\s*100\s*\)?\s*$")
    offenders: list[tuple[str, str]] = []
    for name in list(QUERIES)[:50]:
        sql = QUERIES[name].oracle or ""
        sql = re.sub(r"--[^\n]*", "", sql)  # strip SQL comments
        for m in re.finditer(r"round\s*\(", sql, re.I):
            i, depth = m.end(), 1
            while i < len(sql) and depth:
                depth += {"(": 1, ")": -1}.get(sql[i], 0)
                i += 1
            inner = sql[m.end():i - 1]
            body = inner.rsplit(",", 1)[0] if "," in inner else inner
            if trans.search(body) or cents.match(body):
                continue
            if "/" in body or "*" in body:
                offenders.append((name, " ".join(inner.split())[:100]))
    allowed = {
        # int8 quantizer semantics (data-dependent operands, green r4)
        "embedding_quantize_int8",
        # slope round(,6) is LEAF-ABSORPTION of DuckDB's double-rounded
        # DECIMAL(38,18)->DOUBLE cast — stripping it FAILS sf0.1 parity
        # (measured at the r11 swap; see the query docstring). The
        # operands are noisy doubles, so a 6-dp tie is measure-zero.
        "zipf_vocab_fit",
    }
    bad = [o for o in offenders if o[0] not in allowed]
    assert bad == [], bad
