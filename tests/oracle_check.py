"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the twin
SQL on DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value multiset. Used by
tests/test_oracle_parity.py and runnable standalone:

    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convex_batch_processor_spark.catalog import TABLES, table_path  # noqa: E402


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = table_path(sf_dir, t)
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize a cell to a hashable, engine-neutral value."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — parity must be bit-exact
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


#: map a type name from either engine to a coarse category; the driver's
#: pandas-level hash distinguishes exactly these (int64 vs float64 vs object...).
_TYPE_CATEGORY = {
    # integers (pandas int64)
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "int", "long": "int", "utinyint": "int", "usmallint": "int",
    "uinteger": "int", "ubigint": "int",
    # DuckDB HUGEINT -> pandas float64/object: NEVER let an oracle emit one
    "hugeint": "hugeint", "uhugeint": "hugeint", "int128": "hugeint",
    "float": "float", "real": "float", "double": "float",
    "boolean": "bool", "bool": "bool",
    "varchar": "str", "string": "str", "text": "str",
    "date": "date",
    "binary": "bytes", "blob": "bytes",
}


def _type_cat(t: str) -> str:
    t = str(t).lower()
    base = t.split("(")[0].strip()
    if base in _TYPE_CATEGORY:
        return _TYPE_CATEGORY[base]
    if base.startswith("decimal") or base.startswith("numeric"):
        return "decimal"
    if base.startswith("timestamp"):
        return "timestamp"
    return base  # arrays/structs/maps compare by full spelling


def compare(spark, sf_dir: str, name: str, fn, oracle: str | None):
    """Return (ok: bool, detail: str)."""
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    stypes = {f.name: _type_cat(f.dataType.simpleString()) for f in sdf.schema.fields}
    srows = sdf.collect()
    if oracle is None:
        return True, f"rows-only: {len(srows)} rows"
    con = duckdb_conn(sf_dir)
    try:
        rel = con.sql(oracle)
        dcols = list(rel.columns)
        dtypes = {c: _type_cat(t) for c, t in zip(rel.columns, rel.types)}
        drows = rel.fetchall()
    finally:
        con.close()
    if sorted(scols) != sorted(dcols):
        return False, f"columns differ: spark={sorted(scols)} duckdb={sorted(dcols)}"
    # The driver hashes pandas frames: a DuckDB HUGEINT column materializes as
    # float64 and every int cell serializes `1.0` vs Spark's `1` — a guaranteed
    # hash fail even when fetchall()-level values match. Catch it here.
    huge = [c for c, t in dtypes.items() if t == "hugeint"]
    if huge:
        return False, (
            f"oracle emits HUGEINT column(s) {huge}: wrap in CAST(... AS BIGINT) "
            "(DuckDB SUM(int) returns HUGEINT -> float64 in pandas -> hash drift)"
        )
    def _compatible(s_cat: str, d_cat: str) -> bool:
        if s_cat == d_cat:
            return True
        # A DuckDB DECIMAL materializes as float64 at the driver's pandas
        # layer, so it hashes like a Spark double — but NOT like a Spark
        # int (int64 `1` vs float64 `1.0` is a guaranteed hash fail).
        # The old blanket decimal waiver let exactly that int-vs-decimal
        # gap certify locally and fail at the driver.
        return d_cat == "decimal" and s_cat == "float"

    cat_diff = {
        c: (stypes[c], dtypes[c])
        for c in scols
        if not _compatible(stypes[c], dtypes[c])
    }
    if cat_diff:
        return False, f"type category differs (spark, duckdb): {cat_diff}"
    if len(srows) != len(drows):
        return False, f"row count differs: spark={len(srows)} duckdb={len(drows)}"
    order = sorted(range(len(scols)), key=lambda i: scols[i])
    d_order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s_set: dict = {}
    for r in srows:
        key = tuple(_norm(r[i]) for i in order)
        s_set[key] = s_set.get(key, 0) + 1
    for r in drows:
        key = tuple(_norm(r[i]) for i in d_order)
        cnt = s_set.get(key, 0)
        if cnt == 0:
            return False, f"value mismatch: duckdb row {key!r:.300} not in spark result"
        if cnt == 1:
            del s_set[key]
        else:
            s_set[key] = cnt - 1
    if s_set:
        extra = next(iter(s_set))
        return False, f"value mismatch: spark row {extra!r:.300} not in duckdb result"
    if not srows:
        return True, "match: 0 rows (WARNING: empty result proves nothing — re-parameterize)"
    return True, f"match: {len(srows)} rows"


def main():
    from convex_batch_processor_spark.queries import QUERIES
    from convex_batch_processor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    unknown = only - set(QUERIES)
    if unknown:
        sys.exit(f"unknown query name(s): {sorted(unknown)}; known: {sorted(QUERIES)}")
    selected = {n: s for n, s in QUERIES.items() if not only or n in only}
    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    failures = []
    for name, spec in selected.items():
        try:
            ok, detail = compare(spark, sf_dir, name, spec.fn, spec.oracle)
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"EXCEPTION: {type(e).__name__}: {e}"
        status = "PASS" if ok else "FAIL"
        print(f"{status:4} {name}: {detail}")
        if not ok:
            failures.append(name)
    print(f"\n{len(selected) - len(failures)}/{len(selected)} passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
