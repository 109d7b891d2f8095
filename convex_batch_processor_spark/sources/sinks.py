"""Write-side helpers: partitioned layouts and compaction.

S7-S9 sink surface (SURVEY.md §2.1) beyond the streaming history table:
how the engine lays out OUTPUT data for 100 TB readers.

- ``write_partitioned``: hive-partitioned parquet (``col=value/`` dirs) —
  downstream readers get partition pruning for free. Choose low-cardinality
  partition columns (date, lang); high-cardinality keys would explode the
  file count.
- ``compact``: rewrite a directory to ~target file count — the maintenance
  pass that fixes small-file accumulation from streaming/appends (the
  batch analog of the reference's retention cleanup, lib.ts:671-692).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write (partition pruning for readers)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; partition columns come back as columns
    and filters on them prune directories before any file I/O."""
    return spark.read.parquet(path)


def compact(spark: SparkSession, path: str, target_files: int, out_path: str) -> None:
    """Coalesce a many-small-files dir into ~target_files larger files.

    Uses coalesce (no shuffle) — partition sizes may be uneven but no
    exchange is paid; use repartition when uniformity matters more than
    the shuffle cost."""
    spark.read.parquet(path).coalesce(target_files).write.mode("overwrite").parquet(out_path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table (``bucketBy`` requires saveAsTable).

    Both sides of a frequent equi-join written with the SAME bucket count
    and key join WITHOUT a shuffle exchange — the pre-shuffled layout is
    the biggest single lever for repeated 100 TB fact-fact joins.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
