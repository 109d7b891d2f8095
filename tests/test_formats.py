"""Multi-format source/sink round-trips (sources/formats.py): CSV / JSON /
ORC land → read back → identical multiset of rows; convert() performs the
ingest-to-columnar pass; text formats without a schema are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convex_batch_processor_spark.catalog import load_table
from convex_batch_processor_spark.sources.formats import (
    convert,
    infer_format,
    read_any,
    write_any,
)


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_infer_format():
    assert infer_format("/x/y/orders.csv") == "csv"
    assert infer_format("/x/y/docs.jsonl") == "json"
    assert infer_format("/x/y/t.orc") == "orc"
    assert infer_format("/x/y/table.parquet/") == "parquet"
    assert infer_format("/x/y/dir") == "parquet"


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    # timestamps + strings with commas exercise quoting/escape + parsing
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "note", F.concat(F.lit("a,\"quoted\" "), F.col("o_orderpriority"))
    )
    p = str(tmp_path / "orders.csv")
    write_any(orders, p)
    back = read_any(spark, p, schema=orders.schema)
    assert back.schema == orders.schema
    assert _rowset(back) == _rowset(orders)


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs.jsonl")
    write_any(docs, p)
    back = read_any(spark, p, schema=docs.schema)
    assert _rowset(back.select(*sorted(docs.columns))) == _rowset(
        docs.select(*sorted(docs.columns))
    )


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    p = str(tmp_path / "lineitem.orc")
    write_any(li, p)
    back = read_any(spark, p)
    assert back.count() == li.count()
    a = back.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    b = li.agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0][0]
    assert a == b


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, str(tmp_path / "x.csv"))
    with pytest.raises(ValueError, match="explicit schema"):
        read_any(spark, str(tmp_path / "x.jsonl"))


def test_convert_csv_to_partitioned_parquet(spark, sf_dir, tmp_path):
    """The ingest pattern: land CSV, one pass to hive-partitioned parquet,
    downstream filters prune partition dirs."""
    nation = load_table(spark, sf_dir, "nation")
    csv_p = str(tmp_path / "nation.csv")
    pq_p = str(tmp_path / "nation_pq")
    write_any(nation, csv_p)
    out = convert(
        spark, csv_p, pq_p, schema=nation.schema, partition_cols=["n_regionkey"]
    )
    assert _rowset(out.select(*sorted(nation.columns))) == _rowset(
        nation.select(*sorted(nation.columns))
    )
    import os

    assert any(d.startswith("n_regionkey=") for d in os.listdir(pq_p))


def test_convert_to_csv_readback_keeps_schema_and_header(spark, sf_dir, tmp_path):
    """convert() to a TEXTUAL destination must read the result back with
    the source schema and the header/escape options — a bare
    format().load() returned _c0/_c1 columns with the header row as
    data."""
    from convex_batch_processor_spark.sources.formats import convert

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id long, name string"
    ).write.parquet(src)
    out = convert(spark, src, str(tmp_path / "out.csv"), dst_fmt="csv")
    assert out.columns == ["id", "name"]
    assert dict((r.id, r.name) for r in out.collect()) == {1: "alpha", 2: "beta"}
    assert out.schema["id"].dataType.simpleString() == "bigint"
