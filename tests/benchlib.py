"""Shared measurement protocol for ``bench.py`` and ``tests/scale_check.py``.

Both harnesses must measure under IDENTICAL conditions (session scan
config, JVM + Python-worker warmup, noop-sink timed loop, median-of-N)
or their numbers stop being comparable — they used to carry duplicated
copies of this block, which had already drifted (two median
implementations, and both hardcoded 32 warmup tasks: on a host with more
cores the extra worker slots never spawned during warmup and the first
measured pandas-UDF query absorbed the interpreter-start cost instead).
"""

from __future__ import annotations

import time

#: the small-SF testdata tables are single few-MB files; split at
#: row-group granularity so scans parallelize across local cores (at
#: real scale files are >128 MB and the default split size is right)
SCAN_CONF = {
    "spark.sql.files.maxPartitionBytes": "2m",
    "spark.sql.files.openCostInBytes": "0",
}


def median(xs: list[float]) -> float:
    """Median-of-N: robust to JVM/GC jitter, unlike best-of (still
    optimistic) or mean (one GC pause skews it)."""
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def warm_up(spark) -> None:
    """JVM/codegen warmup on a trivial plan, then Python/Arrow worker
    warmup: spawning the pandas_udf workers (each importing pandas/numpy)
    costs ~10 s once per session; pay it here so the first Python-UDF
    query measures steady-state. One task per AVAILABLE core — derived
    from defaultParallelism, never hardcoded — so every worker slot
    actually spawns."""
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import col, pandas_udf  # noqa: PLC0415

    _warm = pandas_udf(lambda s: s * 1.0, "double")
    slots = spark.sparkContext.defaultParallelism
    spark.range(0, slots * 100, numPartitions=slots).select(
        _warm(col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()


def time_query(spark, fn, sf_dir: str, runs: int) -> float:
    """Median wall-time of ``fn(spark, sf_dir)`` forced end-to-end with
    the noop sink (full computation, no driver collect cost). Drops
    intra-query persists after EVERY run: each call persists fresh
    DataFrames, and letting runs' caches coexist measures GC pressure,
    not the query."""
    samples: list[float] = []
    for _ in range(runs):
        start = time.monotonic()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples.append(time.monotonic() - start)
        spark.catalog.clearCache()
    return median(samples)
