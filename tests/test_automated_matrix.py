"""Port of /root/reference/test/automated.mjs — the primitive x primitive
conformance matrix, relationally adapted: each source primitive type
becomes a column dtype, each target a leaf schema; conform must coerce
every pair per the JS constructor table (schisma.mjs:579-607)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from schisma_spark import Field, Null, schema
from schisma_spark.create import create_value
from schisma_spark.dsl import parse

# (name, spark type, sample value "primitive(1)")
SOURCES = [
    ("number", T.DoubleType(), 1.0),
    ("bigint", T.LongType(), 1),
    ("string", T.StringType(), "1"),
    ("boolean", T.BooleanType(), True),
]
TARGETS = [float, int, str, bool, Null]

# expected conform of value-1 per (source, target) — JS semantics
EXPECTED = {
    ("number", float): 1.0, ("number", int): 1, ("number", str): "1",
    ("number", bool): True, ("number", Null): None,
    ("bigint", float): 1.0, ("bigint", int): 1, ("bigint", str): "1",
    ("bigint", bool): True, ("bigint", Null): None,
    ("string", float): 1.0, ("string", int): 1, ("string", str): "1",
    ("string", bool): True, ("string", Null): None,
    ("boolean", float): 1.0, ("boolean", int): 1, ("boolean", str): "true",
    ("boolean", bool): True, ("boolean", Null): None,
}


def test_primitives_creation():
    # automated.mjs:8-17 — create() equals the zero value for each primitive
    assert schema({"v": float}).create()["v"] == 0.0
    assert schema({"v": int}).create()["v"] == 0
    assert schema({"v": str}).create()["v"] == ""
    assert schema({"v": bool}).create()["v"] is False
    assert schema({"v": Null}).create()["v"] is None


def test_driver_side_matrix():
    # automated.mjs:19-37 via create(data) — the driver-side coercion twin
    for sname, _dt, sval in SOURCES:
        for tgt in TARGETS:
            node = parse(tgt if tgt is Null else Field(type=tgt))
            got = create_value(node, sval)
            exp = EXPECTED[(sname, tgt)]
            assert got == exp and type(got) is type(exp), (sname, tgt, got)


def test_spark_side_matrix(spark):
    # the same matrix through conform() on real columns
    for sname, sdt, sval in SOURCES:
        df = spark.createDataFrame(
            [Row(v=sval)], T.StructType([T.StructField("v", sdt)])
        )
        for tgt in TARGETS:
            sch = schema({"v": tgt if tgt is Null else Field(type=tgt)})
            got = sch.conform(df).collect()[0]["v"]
            exp = EXPECTED[(sname, tgt)]
            if isinstance(exp, float) or (sname, tgt) in (
                ("number", int), ("bigint", float),
            ):
                # numeric family repairs stay in the column's numeric type
                assert got is not None and float(got) == float(exp), \
                    (sname, tgt, got)
            else:
                assert got == exp, (sname, tgt, got)


def test_array_of_union_primitives(spark):
    # automated.mjs:51-61 — elements of a union-typed array conform without
    # mangling (relational: elements share one dtype, here string)
    df = spark.createDataFrame([Row(a=["1", "x", ""])])
    sch = schema({"a": [Field(typeof=[str, float])]})
    got = sch.conform(df).collect()[0]["a"]
    assert got == ["1", "x", ""]  # str alternative matches; identity


def test_array_of_arrays_union(spark):
    # automated.mjs:63-77 — nested arrays validate/conform to any depth
    df = spark.createDataFrame([Row(a=[[1.0, 2.0], [3.0]])])
    sch = schema({"a": [[float]]})
    res = sch.validate(df, ignore_unexpected=True)
    assert res.violations.count() == 0
    got = sch.conform(df).collect()[0]["a"]
    assert got == [[1.0, 2.0], [3.0]]

    # planted: inner element null -> per-element violation at depth 2
    df2 = spark.createDataFrame(
        [Row(a=[[1.0, None]])],
        T.StructType([T.StructField(
            "a", T.ArrayType(T.ArrayType(T.DoubleType(), True)))]),
    )
    v = sch.validate(df2, ignore_unexpected=True).violations.collect()
    assert [(x["code"], x["where"]) for x in v] == [("no match", "a.0.1")]
