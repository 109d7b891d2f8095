"""Multi-format source/sink support: parquet, ORC, CSV, JSON(-lines), text.

The reference has NO file formats at all — its only source/sink is the
Convex store (src/component/lib.ts:87-96); this module is the Spark-native
connector surface a batch engine needs. Design rules at 100 TB:

- **Columnar in the hot path.** CSV/JSON are LANDING formats: no column
  pruning (every byte is parsed), no min/max skipping, no vectorized
  decode. ``convert`` is the ingest step — land text, rewrite columnar
  once, query parquet/ORC forever.
- **Schema is mandatory for text formats.** ``inferSchema``/JSON schema
  inference trigger a FULL extra pass over the data before the real job
  — at 100 TB that is a second 100 TB scan. ``read_any`` therefore
  *requires* an explicit schema for csv/json unless
  ``allow_inference=True`` is passed (small-file exploration only).
- **Predicate pushdown still applies post-parse** (Spark filters rows
  before they reach the query), but only parquet/ORC skip I/O.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_EXT_FMT = {
    ".parquet": "parquet",
    ".orc": "orc",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".txt": "text",
    ".text": "text",
}

_TEXTUAL = {"csv", "json"}


def infer_format(path: str) -> str:
    """Format from the file/dir extension; parquet when unrecognizable."""
    root = path.rstrip("/")
    ext = os.path.splitext(root)[1].lower()
    return _EXT_FMT.get(ext, "parquet")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: T.StructType | str | None = None,
    allow_inference: bool = False,
    **options: str,
) -> DataFrame:
    """Read any supported format with scale-safe defaults.

    csv: header on, standard escaping; json: JSON-lines (Spark's native
    layout — one object per line splits across workers; a single giant
    array does not). Text formats without a schema raise unless
    ``allow_inference=True`` (the inference pass re-scans everything).
    """
    fmt = fmt or infer_format(path)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true").option("escape", '"')
    if fmt in _TEXTUAL:
        if schema is not None:
            reader = reader.schema(schema)
        elif allow_inference:
            # inferSchema is a CSV option; the JSON reader infers by
            # default when no schema is set, so only CSV needs the flag
            if fmt == "csv":
                reader = reader.option("inferSchema", "true")
        else:
            raise ValueError(
                f"{fmt} read of {path!r} needs an explicit schema at scale "
                "(inference is a full extra scan); pass schema=... or "
                "allow_inference=True for small-file exploration"
            )
    elif schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_cols: list[str] | None = None,
    **options: str,
) -> None:
    """Write any supported format; csv gets a header for round-tripping."""
    fmt = fmt or infer_format(path)
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true").option("escape", '"')
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def convert(
    spark: SparkSession,
    src: str,
    dst: str,
    src_fmt: str | None = None,
    dst_fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    partition_cols: list[str] | None = None,
    **read_options: str,
) -> DataFrame:
    """Ingest-to-columnar: land CSV/JSON once, rewrite as parquet/ORC.

    One distributed pass — read tasks feed write tasks directly, no
    driver materialization. Returns the (lazy) DataFrame over the NEW
    columnar location so callers chain analytics onto pruned scans.
    """
    df = read_any(spark, src, fmt=src_fmt, schema=schema, **read_options)
    write_any(df, dst, fmt=dst_fmt, partition_cols=partition_cols)
    # read back through read_any: a bare format().load() would drop the
    # header/escape options and re-infer types for textual destinations
    # (csv came back as _c0/_c1 with the header row as data). Columnar
    # formats keep self-describing schemas — passing one would fight
    # partition-discovery column placement, so only text formats get it.
    return read_any(
        spark, dst, fmt=dst_fmt, schema=df.schema if dst_fmt in _TEXTUAL else None
    )
