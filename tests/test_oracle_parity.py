"""Every registered query matches its DuckDB oracle (local replica of the
driver's correctness gate) at the small test scale factor."""

from __future__ import annotations

import pytest

from convex_batch_processor_spark.queries import QUERIES

from .oracle_check import compare


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, sf_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


def test_every_query_has_entry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 40
