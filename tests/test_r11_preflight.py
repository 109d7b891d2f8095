"""Oracle parity for the round-11 pre-flight pack (queries/llm72.py).

The registry is frozen at 279 (NOTES §"Post-backlog freeze policy"), so
these candidates are NOT registered — this file runs each one through
the SAME compare() harness the driver-window fixture gates use, at
sf0.001, so that when the freeze lifts the pack has already shipped
parity-green. A second test pins that the module stays unregistered
until then.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracle_check import compare  # noqa: E402

from convex_batch_processor_spark.queries.llm72 import CANDIDATES  # noqa: E402


@pytest.mark.parametrize("name", sorted(CANDIDATES))
def test_preflight_parity(spark, sf_dir, name):
    fn, oracle = CANDIDATES[name]
    assert oracle, f"{name}: pre-flight candidates must be oracle-backed"
    ok, detail = compare(spark, sf_dir, name, fn, oracle)
    assert ok, f"{name}: {detail}"


def test_preflight_pack_is_not_registered():
    """The registry freeze holds: importing llm72 must not grow QUERIES
    (it would silently displace the pinned driver window)."""
    from convex_batch_processor_spark.queries import QUERIES

    assert len(QUERIES) == 279
    assert not (set(CANDIDATES) & set(QUERIES))
