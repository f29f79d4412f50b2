"""Exact-value port of /root/reference/test/complexObject.mjs: nested
create with populateArrays, conform inserting a whole missing subtree,
conform dropping an unexpected subtree."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from schisma_spark import schema

COMPLEX = {
    "a": float,
    "b": {"bA": str, "bB": [bool]},
    "c": [{"cA": float}],
}

GOLDEN = {
    "a": 0.0,
    "b": {"bA": "", "bB": [False]},
    "c": [{"cA": 0.0}],
}


def test_complex_create_populate():
    # complexObject.mjs:19-33
    assert schema(COMPLEX).create(populate_arrays=True) == GOLDEN


def test_conform_missing_subtree(spark):
    # complexObject.mjs:35-57 — whole 'b' subtree missing -> inserted with
    # populated defaults
    c_t = T.ArrayType(T.StructType([T.StructField("cA", T.DoubleType())]))
    df = spark.createDataFrame(
        [Row(a=0.0, c=[Row(cA=0.0)])],
        T.StructType([T.StructField("a", T.DoubleType()),
                      T.StructField("c", c_t)]),
    )
    out = schema(COMPLEX).conform(df, populate_arrays=True).collect()[0]
    assert out["a"] == 0.0
    assert out["b"].asDict() == {"bA": "", "bB": [False]}
    assert [r.asDict() for r in out["c"]] == [{"cA": 0.0}]


def test_conform_unexpected_subtree_dropped(spark):
    # complexObject.mjs:59-95 — unexpected nested 'd' subtree removed
    b_t = T.StructType([T.StructField("bA", T.StringType()),
                        T.StructField("bB", T.ArrayType(T.BooleanType()))])
    c_t = T.ArrayType(T.StructType([T.StructField("cA", T.DoubleType())]))
    d_t = T.StructType([T.StructField("dA", T.StringType()),
                        T.StructField("dB", T.ArrayType(T.StringType()))])
    df = spark.createDataFrame(
        [Row(a=0.0, b=Row(bA="", bB=[False]), c=[Row(cA=0.0)],
             d=Row(dA="oops", dB=["oops x2"]))],
        T.StructType([
            T.StructField("a", T.DoubleType()),
            T.StructField("b", b_t),
            T.StructField("c", c_t),
            T.StructField("d", d_t),
        ]),
    )
    out = schema(COMPLEX).conform(df, populate_arrays=True)
    assert "d" not in out.columns
    row = out.collect()[0]
    assert row["b"].asDict() == {"bA": "", "bB": [False]}
