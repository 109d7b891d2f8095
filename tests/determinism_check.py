"""Partition-invariance gate: a registered query must return the SAME
value multiset under different shuffle/scan partitioning.

The driver that hash-verifies queries brings its OWN SparkSession
(unknown ``spark.sql.shuffle.partitions``, unknown scan split size), so
any result that depends on partition count or partition order — float
sums accumulated in shuffle order, ties broken by ``first()`` without a
full ordering, limits without a sort — would pass the local oracle gate
(8 partitions) and still hash-fail in the driver's session. This gate
re-runs a query under a deliberately alien config (200 shuffle
partitions, 64 KB scan splits so even sf0.001 files split into several
input partitions) and compares the normalized multisets cell-for-cell
at full float precision, exactly like the driver's comparator.

Runnable standalone over any subset:

    python tests/determinism_check.py [sf_dir] [query ...]

``tests/test_determinism.py`` runs it in-suite for the current driver
verification window (the first 50 registry entries — the only ones
whose first driver contact is still ahead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_check import _norm  # noqa: E402

#: (conf key, alien value) — applied for the second run, restored after.
ALIEN_CONF = [
    ("spark.sql.shuffle.partitions", "200"),
    ("spark.sql.files.maxPartitionBytes", "65536"),
    ("spark.sql.files.openCostInBytes", "0"),
]


def _multiset(rows, ncols):
    out: dict = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in range(ncols))
        out[key] = out.get(key, 0) + 1
    return out


def check_partition_invariance(spark, sf_dir: str, fn):
    """Return (ok: bool, detail: str) for one query callable."""
    base_rows = fn(spark, sf_dir).collect()
    saved = {k: spark.conf.get(k, None) for k, _ in ALIEN_CONF}
    try:
        for k, v in ALIEN_CONF:
            spark.conf.set(k, v)
        alien_df = fn(spark, sf_dir)
        ncols = len(alien_df.columns)
        alien_rows = alien_df.collect()
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    a, b = _multiset(base_rows, ncols), _multiset(alien_rows, ncols)
    if len(base_rows) != len(alien_rows):
        return False, (
            f"row count changed with partitioning: {len(base_rows)} -> "
            f"{len(alien_rows)}"
        )
    if a != b:
        # name a row whose COUNT differs, not just set membership — with
        # identical key sets but shifted multiplicities the old set-diff
        # probes both came back None and the diagnostic named nothing
        diff = next(
            (k, a.get(k, 0), b.get(k, 0)) for k in (a.keys() | b.keys())
            if a.get(k, 0) != b.get(k, 0)
        )
        return False, (
            "value multiset changed with partitioning: row "
            f"{diff[0]!r:.300} occurs base={diff[1]}x alien={diff[2]}x"
        )
    return True, f"invariant: {len(base_rows)} rows"


def main():
    from convex_batch_processor_spark.queries import QUERIES
    from convex_batch_processor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}")
    selected = {n: s for n, s in QUERIES.items() if not only or n in only}
    spark = get_spark(app_name="determinism-check", shuffle_partitions=8)
    failures = []
    for name, spec in selected.items():
        try:
            ok, detail = check_partition_invariance(spark, sf_dir, spec.fn)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL':4} {name}: {detail}")
        if not ok:
            failures.append(name)
    print(f"\n{len(selected) - len(failures)}/{len(selected)} invariant")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
