"""Exact-value ports of /root/reference/test/conformance.mjs and
test/deepSchema.mjs (discriminated-union children conform losslessly)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from schisma_spark import Field, schema


def test_object_conform_exact(spark):
    # conformance.mjs:9-16 — {number:'32', string:11} -> {number:32, string:'11'}
    df = spark.createDataFrame([Row(number="32", string=11.0)])
    out = schema({"number": float, "string": str}).conform(df).collect()[0]
    assert out["number"] == 32.0
    assert out["string"] == "11"  # JS String(11) == '11', not '11.0'


def test_conform_complex_typeof_exact(spark):
    # conformance.mjs:36-75 — two object variants with their own $defaults;
    # each conforms losslessly. Relational struct = union of variant keys.
    st = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("array", T.ArrayType(T.DoubleType())),
            T.StructField("string", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(variableTypes=Row(name="Aa", array=[], string=None)),
            Row(variableTypes=Row(name="Ab", array=None, string="")),
        ],
        T.StructType([T.StructField("variableTypes", st)]),
    )
    complex_aa = {"name": Field(type=str, default="Aa"), "array": []}
    complex_ab = {"name": Field(type=str, default="Ab"), "string": str}
    sch = schema({"variableTypes": Field(typeof=[complex_aa, complex_ab])})
    rows = sch.conform(df).collect()
    a, b = rows[0]["variableTypes"], rows[1]["variableTypes"]
    assert a["name"] == "Aa" and a["array"] == [] and a["string"] is None
    assert b["name"] == "Ab" and b["string"] == "" and b["array"] is None


def test_deep_schema_conform_exact(spark):
    # deepSchema.mjs:28-75 — array of discriminated-union children, one
    # variant containing a nested union; the 'expected' value conforms to
    # itself (losslessness)
    data_t = T.StructType(
        [
            T.StructField("aData_num", T.DoubleType()),
            T.StructField("bData", T.StringType()),
        ]
    )
    child_t = T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("aData", T.StringType()),
            T.StructField("data", data_t),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(variableChildren=[
                Row(type="child a", aData="a string", data=None),
                Row(type="child b", aData=None,
                    data=Row(aData_num=32.0, bData=None)),
                Row(type="child b", aData=None,
                    data=Row(aData_num=None, bData="b string")),
            ])
        ],
        T.StructType([T.StructField("variableChildren", T.ArrayType(child_t))]),
    )
    child_a = {"type": "child a", "aData": Field(type=str)}
    child_b = {
        "type": "child b",
        "data": Field(typeof=[{"aData_num": float}, {"bData": str}]),
    }
    sch = schema({"variableChildren": [Field(typeof=[child_a, child_b])]})

    # validation: every child matches one variant (null fields of the other
    # variant are unexpected-at-variant-level -> ignore_unexpected)
    res = sch.validate(df, ignore_unexpected=True)
    assert res.violations.count() == 0

    # conform: the value is a fixed point
    got = sch.conform(df).collect()[0]["variableChildren"]
    assert got[0]["type"] == "child a" and got[0]["aData"] == "a string"
    assert got[1]["data"]["aData_num"] == 32.0
    assert got[2]["data"]["bData"] == "b string"
