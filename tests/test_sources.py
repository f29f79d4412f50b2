"""Source seam formats: parquet round trip, jsonl, csv; iceberg raises
cleanly when the runtime is absent (it is, in this sandbox)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from schisma_spark.sources import read_table, write_table


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=2, b="y")])
    p = str(tmp_path / "t")
    write_table(df, p, mode="overwrite")
    back = read_table(spark, p)
    assert sorted((r["a"], r["b"]) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(a=1, b="x")])
    p = str(tmp_path / "j")
    write_table(df, p, fmt="jsonl", mode="overwrite")
    back = read_table(spark, p, fmt="jsonl", schema=df.schema)
    assert back.collect()[0].asDict() == {"a": 1, "b": "x"}


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(a=1, b="x")])
    p = str(tmp_path / "c")
    write_table(df, p, fmt="csv", mode="overwrite")
    back = read_table(spark, p, fmt="csv", schema=df.schema)
    assert back.collect()[0].asDict() == {"a": 1, "b": "x"}


def test_iceberg_absent_raises(spark):
    with pytest.raises(RuntimeError, match="iceberg runtime"):
        read_table(spark, "db.tbl", fmt="iceberg")
