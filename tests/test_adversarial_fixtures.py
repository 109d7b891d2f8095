"""Oracle parity on ADVERSARIAL fixtures: boundary inputs the generated
testdata never produces (timestamp collisions, equal-ts ties, null
values, decay-cap ages, same-date duplicate orders).

The asof same-instant bug survived two full parity gates because the
real tables never collide an event timestamp with an order date; this
file closes that class of blind spot by running the SAME driver-style
compare (Spark vs DuckDB) over a tiny crafted star corner.
"""

from __future__ import annotations

import duckdb
import pytest

from convex_batch_processor_spark.queries import QUERIES

from .oracle_check import compare

# boundary-sensitive queries that read only events/orders
_QUERIES = [
    "asof_join_latest_order",
    "asof_join_next_order",
    "scd2_user_state",
    "cdc_apply_changelog",
    "event_sequence_violations",
    "time_decay_user_score",
    "repeat_purchase_interval",
    "view_purchase_attribution",
    "mad_outliers",
    "gapfill_daily_counts",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    """A minimal sf-dir with crafted collisions."""
    d = tmp_path_factory.mktemp("adv_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                -- user 7: event exactly AT an order's midnight timestamp,
                -- plus an equal-ts pair (ids 2,3) with DIFFERENT types
                (1, TIMESTAMP '2024-01-05 00:00:00', 7, 'view',     10.00, '{{"k": 1}}'),
                (2, TIMESTAMP '2024-01-05 06:00:00', 7, 'click',    20.25, '{{"k": 2}}'),
                (3, TIMESTAMP '2024-01-05 06:00:00', 7, 'purchase', 30.50, '{{"k": 3}}'),
                (4, TIMESTAMP '2024-01-06 00:00:00', 7, 'purchase', NULL,  '{{"k": 4}}'),
                -- user 8: purchase exactly at the attribution window edge
                -- (view + 30min) and a long-gap tail past the decay cap
                (5, TIMESTAMP '2024-01-05 10:00:00', 8, 'view',     1.00,  '{{"k": 5}}'),
                (6, TIMESTAMP '2024-01-05 10:30:00', 8, 'purchase', 2.00,  '{{"k": 6}}'),
                (7, TIMESTAMP '2024-02-20 00:00:00', 8, 'purchase', 3.00,  '{{"k": 7}}'),
                (8, TIMESTAMP '2024-02-20 00:00:00', 8, 'purchase', 4.00,  '{{"k": 8}}'),
                -- user 9: signup-only (censored in KM terms), null value
                (9, TIMESTAMP '2024-01-07 12:00:00', 9, 'signup',   NULL,  '{{"k": 9}}'),
                (10, TIMESTAMP '2024-01-08 12:00:00', 9, 'error',   5.75,  '{{"k": 10}}')
            ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (100, 7, 'O', 50.00, TIMESTAMP '2024-01-05 00:00:00', '1-URGENT'),
                (200, 7, 'O', 60.00, TIMESTAMP '2024-01-06 00:00:00', '2-HIGH'),
                -- duplicate-date orders for the same customer (tiebreak path)
                (300, 8, 'F', 70.00, TIMESTAMP '2024-01-05 00:00:00', '3-MEDIUM'),
                (301, 8, 'F', 80.00, TIMESTAMP '2024-01-05 00:00:00', '3-MEDIUM')
            ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                o_orderpriority)
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


@pytest.mark.parametrize("name", _QUERIES)
def test_boundary_parity(spark, adv_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"
