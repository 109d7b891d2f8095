"""SparkSession construction.

Local test profile: ``local[N]`` single-JVM. Cluster profile notes are in
docstrings — the same code runs unchanged on a real cluster; only the
builder config differs (executors, memory, shuffle service).

Scale design (100 TB):
- AQE on: runtime join-strategy switches, skew-join splitting, and
  post-shuffle partition coalescing replace hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` is a *starting* hint only; AQE coalesces.
  At 100 TB raw / ~128 MB target partitions that hint would be ~800k tasks,
  so on a real cluster set it to ~2-4x total cores and let AQE split skew.
- Arrow enabled for the Pandas-UDF slow paths (llmops/multimodal only).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  correctness oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "convex_batch_processor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS); read as long and
        # normalize to micros in catalog.load_table (matches DuckDB's
        # nanos->micros truncation on read)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
