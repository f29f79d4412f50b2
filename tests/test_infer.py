"""Schema inference (infer.infer_schema): the profiler dual of create."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark import schema
from schisma_spark.dsl import Field
from schisma_spark.infer import infer_schema

SF = "/root/testdata/sf0.001"


def test_infer_roundtrip_real_tables(spark):
    # the core guarantee: the inferred contract has ZERO violations on
    # the profiled data itself (incl. the NTZ-timestamp events table)
    for t, key in [("orders", "o_orderkey"), ("events", "event_id"),
                   ("documents", "doc_id")]:
        df = spark.read.parquet(f"{SF}/{t}.parquet")
        res = schema(infer_schema(df)).validate(df, keys=[key])
        assert res.violations.count() == 0, t


def test_infer_contract_is_tight(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=1.0), Row(id=2, v=2.0)], "id long, v double")
    sch = schema(infer_schema(df))
    # a later batch with a NULL in a never-null column is flagged
    later = spark.createDataFrame(
        [Row(id=3, v=None)], "id long, v double")
    assert schema(infer_schema(df)).validate(
        later, keys=["id"]).violations.count() == 1
    # type drift is flagged
    drift = spark.createDataFrame([Row(id=4, v="oops")],
                                  "id long, v string")
    assert sch.validate(drift, keys=["id"]).violations.count() == 1


def test_infer_observed_nulls_loosen(spark):
    df = spark.createDataFrame(
        [Row(id=1, v=1.0), Row(id=2, v=None)], "id long, v double")
    lit = infer_schema(df)
    assert isinstance(lit["v"], Field) and lit["v"].typeof is not None
    assert not isinstance(lit["id"], Field)  # no nulls observed -> bare
    assert schema(lit).validate(df, keys=["id"]).violations.count() == 0
    # nulls='never' produces the strict contract that flags the NULL
    strict = schema(infer_schema(df, nulls="never"))
    assert strict.validate(df, keys=["id"]).violations.count() == 1


def test_infer_nested_and_narrow_types(spark):
    df = spark.createDataFrame(
        [Row(i32=1, f32=1.5, s=Row(a=1, b="x"), arr=[1, 2],
             m={"k": 2.0})],
        T.StructType([
            T.StructField("i32", T.IntegerType()),
            T.StructField("f32", T.FloatType()),
            T.StructField("s", T.StructType([
                T.StructField("a", T.LongType()),
                T.StructField("b", T.StringType())])),
            T.StructField("arr", T.ArrayType(T.LongType())),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
        ]))
    lit = infer_schema(df)
    # narrow numerics become castable fields
    assert isinstance(lit["i32"], Field) and lit["i32"].castable
    assert isinstance(lit["f32"], Field) and lit["f32"].castable
    res = schema(lit).validate(df, keys=["i32"])
    assert res.violations.count() == 0


def test_infer_binary_never_scanned(spark):
    # binary columns are assumed nullable WITHOUT an isNull scan (the
    # stats path must never read payload bytes); the observed agg plan
    # must not read the binary column
    df = spark.createDataFrame(
        [Row(id=1, payload=bytearray(b"xx"))], "id long, payload binary")
    lit = infer_schema(df)
    assert isinstance(lit["payload"], Field)
    assert lit["payload"].typeof is not None  # nullable union, unscanned
    assert schema(lit).validate(df, keys=["id"]).violations.count() == 0


def test_infer_never_is_strict_at_every_depth(spark):
    # review regression: nested interiors must also lose their Null
    # unions under nulls='never'
    df = spark.createDataFrame(
        [Row(id=1, s=Row(a=1))],
        T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("s", T.StructType(
                [T.StructField("a", T.LongType(), True)]), True),
        ]))
    strict = schema(infer_schema(df, nulls="never"))
    later = spark.createDataFrame(
        [Row(id=2, s=Row(a=None))],
        df.schema)
    assert strict.validate(later, keys=["id"]).violations.count() >= 1


def test_infer_handles_dotted_column_names(spark):
    df = spark.createDataFrame([Row(id=1)], "id long") \
        .withColumnRenamed("id", "a.b")
    lit = infer_schema(df)
    assert "a.b" in lit and not isinstance(lit["a.b"], Field)
