"""Catalog: load the parquet star schema and register temp views.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under a scale-factor directory.

Scale design (100 TB): ``spark.read.parquet`` on a directory of files gets
vectorized scans, predicate pushdown, column pruning, and (if the layout is
hive-partitioned, e.g. ``dt=.../``) partition pruning for free. Nothing here
collects to the driver; views are lazy plans over the files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import fsutil

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Timestamp columns whose physical parquet type has varied across testdata
# generations: TIMESTAMP(NANOS) (Spark reads as long via
# spark.sql.legacy.parquet.nanosAsLong; we truncate to microseconds exactly
# like DuckDB does, ns -> us floor division) or TIMESTAMP(MICROS) without
# isAdjustedToUTC (Spark infers TIMESTAMP_NTZ; we reinterpret the wall-clock
# as UTC so time functions like unix_millis work and collected values match
# the DuckDB oracle's naive timestamps).
NANO_TS_COLS = {"events": ("ts",)}


def _ensure_session_conf(spark: SparkSession) -> None:
    """Defensive runtime confs so queries behave identically on ANY session
    (the round driver builds its own SparkSession, not ours): nanos
    timestamps readable, timestamps collected as UTC (what the DuckDB
    oracle produces)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize a timestamp column to plain TIMESTAMP regardless of the
    parquet physical type it arrived as (also used by streaming tests —
    readStream sources see the same physical-type drift as batch reads):

    - long (TIMESTAMP(NANOS) read under nanosAsLong): integer-div to µs —
      double division would lose precision at ~1e18 ns.
    - TIMESTAMP_NTZ (TIMESTAMP(MICROS) without isAdjustedToUTC): cast —
      the session tz is UTC (_ensure_session_conf), so the cast keeps the
      wall-clock and yields a TIMESTAMP usable by unix_millis etc.
    """
    field = df.schema[col] if col in df.columns else None
    if field is not None and isinstance(field.dataType, T.LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif field is not None and isinstance(field.dataType, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast(T.TimestampType()))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_conf(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in NANO_TS_COLS.get(name, ()):
        df = normalize_ts(df, col)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables that exist under ``sf_dir`` as lazy DataFrames
    (through load_table so session confs + timestamp normalization apply)."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        # fsutil.exists, not os.path.exists: sf_dir may be an object-store
        # URI (s3a://, gs://, hdfs://) where os-level probes are always
        # False and this would silently load zero tables
        if fsutil.exists(spark, table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views (for spark.sql)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
