"""Exact port of /root/reference/test/schemaObject.mjs's $type/$typeof
create() matrix (lines 5-53) and complexArray.mjs's nested array repair."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from schisma_spark import Field, Null, schema
from schisma_spark.create import create_value
from schisma_spark.dsl import parse


def c(defn, populate=False):
    return create_value(parse(defn), populate_arrays=populate)


def test_type_create_matrix():
    # schemaObject.mjs:5-25
    assert c({"$type": float}) == 0.0
    assert c({"$type": str}) == ""
    assert c({"$type": bool}) is False
    assert c({"$type": None}) is None
    assert c({"$type": {}}) == {}
    assert c({"$type": []}) == []
    assert c({"$type": [float]}, populate=True) == [0.0]
    assert c({"$type": [str]}, populate=True) == [""]
    assert c({"$type": [bool]}, populate=True) == [False]
    assert c({"$type": [None]}, populate=True) == [None]
    assert c({"$type": [{}]}, populate=True) == [{}]
    assert c({"$type": [[]]}, populate=True) == [[]]
    assert c({"$type": {"a": float}}) == {"a": 0.0}
    assert c({"$type": {"a": str}}) == {"a": ""}
    assert c({"$type": {"a": bool}}) == {"a": False}
    assert c({"$type": {"a": None}}) == {"a": None}
    assert c({"$type": {"a": {}}}) == {"a": {}}
    assert c({"$type": {"a": []}}) == {"a": []}


def test_typeof_create_matrix():
    # schemaObject.mjs:27-53 — create() always picks alternative 0
    assert c({"$typeof": [float]}) == 0.0
    assert c({"$typeof": [str]}) == ""
    assert c({"$typeof": [bool]}) is False
    assert c({"$typeof": [None]}) is None
    assert c({"$typeof": [{}]}) == {}
    assert c({"$typeof": [[]]}) == []
    assert c({"$typeof": [[float]]}, populate=True) == [0.0]
    assert c({"$typeof": [[[]]]}, populate=True) == [[]]
    for first, rest, exp in [
        (str, float, ""), (str, str, ""), (str, bool, ""),
        (str, None, ""), (str, {}, ""), (str, [], ""),
        (float, str, 0.0), (bool, str, False), (None, str, None),
    ]:
        assert c({"$typeof": [first, rest]}) == exp
    assert c({"$typeof": [{}, str]}) == {}
    assert c({"$typeof": [[], str]}) == []


def test_complex_array_exact(spark):
    # complexArray.mjs:4-18 create + :20-34 nested repair golden
    sch = schema({"parts": [float], "deepParts": [[float]]})
    assert sch.create(populate_arrays=True) == {
        "parts": [0.0], "deepParts": [[0.0]],
    }

    # '32'->32, 'whoops'->0, obj->0 (NaN->default, schisma.mjs:579-584).
    # Relational adaptation: deep elements arrive as strings.
    deep_t = T.ArrayType(T.ArrayType(T.StringType()))
    df = spark.createDataFrame(
        [Row(parts=["1"],
             deepParts=[["0", "32", "whoops", '{"key": "value"}'],
                        ["0", "64", "whoops", '{"key": "value"}']])],
        T.StructType([T.StructField("parts", T.ArrayType(T.StringType())),
                      T.StructField("deepParts", deep_t)]),
    )
    out = sch.conform(df, populate_arrays=True).collect()[0]
    assert out["parts"] == [1.0]
    assert out["deepParts"] == [[0.0, 32.0, 0.0, 0.0], [0.0, 64.0, 0.0, 0.0]]
