"""Additional reference-parity cases: $unmarshal pipelines
(test/class.mjs:31-62, test/uuid.mjs, test/date.mjs), filterNonErrors
(schisma.mjs:114-116), option inertness (matchArray), unions with defaults
(conformance.mjs:36-75), bigint (test/bigint.mjs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark import Field, schema
from schisma_spark.dsl import Unmarshal


def test_unmarshal_then_validate(spark):
    # test/class.mjs:31-62 — $unmarshal converts the raw value, then
    # $validate checks it (INVALID when d.a !== 100). Engine analog:
    # a JSON-string column unmarshaled via get_json_object then checked.
    df = spark.createDataFrame(
        [Row(id=1, payload='{"a": 100}'), Row(id=2, payload='{"a": 7}')]
    )
    sch = schema(
        {
            "payload": Field(
                type=str,
                unmarshal=Unmarshal(
                    fn=lambda c: F.get_json_object(c, "$.a").cast("double"),
                    returns=T.DoubleType(),
                ),
                validate=lambda c: c == 100,
            )
        }
    )
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["id"], g["code"]) for g in got] == [(2, "invalid")]


def test_unmarshal_date(spark):
    # test/date.mjs — string -> Date then validated as timestamp
    df = spark.createDataFrame(
        [Row(id=1, ts="2026-01-15 10:00:00"), Row(id=2, ts="not a date")]
    )
    sch = schema(
        {
            "ts": Field(
                type=dt.datetime,
                unmarshal=Unmarshal(
                    fn=lambda c: c.try_cast(T.TimestampType()),
                    returns=T.TimestampType(),
                ),
                validate=lambda c: c.isNotNull(),
            )
        }
    )
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["id"], g["code"]) for g in got] == [(2, "invalid")]


def test_uuid_domain_check(spark):
    # test/uuid.mjs — domain type as string + conformance regex
    uuid_re = r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    df = spark.createDataFrame(
        [
            Row(id=1, u="123e4567-e89b-12d3-a456-426614174000"),
            Row(id=2, u="not-a-uuid"),
        ]
    )
    sch = schema({"u": Field(type=str, validate=lambda c: c.rlike(uuid_re))})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["id"], g["value"]) for g in got] == [(2, "not-a-uuid")]


def test_filter_non_errors_false(spark):
    # schisma.mjs:114-116 — keep non-error results when filterNonErrors=false
    df = spark.createDataFrame([Row(id=1, v=1.0)])
    sch = schema({"v": float})
    rows = sch.validate(df, keys=["id"],
                        filter_non_errors=False).violations.collect()
    assert [r["code"] for r in rows] == ["exact match"]
    # and with an error present, the row result is a problem -> not emitted
    df2 = spark.createDataFrame(
        [Row(id=1, v=None)],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("v", T.DoubleType())]),
    )
    rows2 = sch.validate(df2, keys=["id"],
                         filter_non_errors=False).violations.collect()
    assert [r["code"] for r in rows2] == ["missing key"]


def test_match_array_inert(spark):
    # matchArray documented but never read (SURVEY §2.A R3) — accepted, inert
    df = spark.createDataFrame([Row(id=1, a=[1.0, 2.0])])
    sch = schema({"a": [float]})
    a = sch.validate(df, keys=["id"], match_array="any").violations.count()
    b = sch.validate(df, keys=["id"], match_array="pattern").violations.count()
    assert a == b == 0
    # conform accepts it too
    sch.conform(df, keys=["id"], match_array="pattern").collect()


def test_bigint_semantics(spark):
    # test/bigint.mjs — BigInt-analog: int atom over integral column;
    # floating column checked for integrality
    df = spark.createDataFrame(
        [Row(id=1, v=3.0), Row(id=2, v=3.5)],
    )
    sch = schema({"v": int})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["id"], g["code"], g["expected"]) for g in got] == [
        (2, "no match", "bigint")
    ]
    # conform: non-integral -> default (BigInt(3.5) throws in JS; we repair)
    out = schema({"v": Field(type=int, default=0)}).conform(df, keys=["id"])
    vals = {r["id"]: r["v"] for r in out.collect()}
    assert vals == {1: 3.0, 2: 0.0}


def test_union_with_default_create(spark):
    # conformance.mjs:36-75 adjacent: create() uses alternative 0
    sch = schema({"v": Field(typeof=[str, float], default="d")})
    assert sch.create() == {"v": "d"}
    sch2 = schema({"v": Field(typeof=[float, str])})
    assert sch2.create() == {"v": 0.0}


def test_embedded_schema_composition(spark):
    # schisma.mjs:26-30 / test/complexSchemas.mjs — Schisma instances
    # compose as values
    child = schema({"x": float}).root
    parent = schema({"child": child, "own": str})
    df = spark.createDataFrame(
        [Row(child=Row(x=None), own="s")],
        T.StructType(
            [
                T.StructField(
                    "child",
                    T.StructType([T.StructField("x", T.DoubleType())]),
                ),
                T.StructField("own", T.StringType()),
            ]
        ),
    )
    got = parent.validate(df).violations.collect()
    assert [(g["code"], g["where"]) for g in got] == [("missing key", "child.x")]


def test_validate_column_bare_schema(spark):
    # bare-schema entry (schisma(Number).validate(5), test/automated.mjs):
    # one column validated against a non-object schema
    from schisma_spark.validate import validate_column

    df = spark.createDataFrame(
        [Row(id=1, v=3.0), Row(id=2, v=None)],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("v", T.DoubleType())]),
    )
    sch = schema(float)
    got = validate_column(df, "v", sch, keys=["id"]).violations.collect()
    # element semantics: null is a VALUE -> NO_MATCH (not missing)
    assert [(g["id"], g["code"], g["where"]) for g in got] == [
        (2, "no match", "v")
    ]

    # array column against a bare array schema
    df2 = spark.createDataFrame([Row(id=1, a=[1.0, 2.0])])
    assert validate_column(df2, "a", schema([float]),
                           keys=["id"]).violations.count() == 0


def test_validate_array_of_subresults_nested(spark):
    """$validate returning a list of sub-results (schisma.mjs:143-152),
    golden-matched against the reference run (test/class.mjs:38-50 pattern):
    nested node emits an INVALID carrier at its path plus one prefixed row
    per failed sub-result."""
    df = spark.createDataFrame([
        Row(id=1, k=Row(a=99, b=-1)),
        Row(id=2, k=Row(a=100, b=5)),
    ])
    sch = schema({
        "k": Field(
            typeof=[{"a": int, "b": int}],
            validate=lambda c: [
                (c["a"] == 100, {"where": "a", "message": "a must be 100"}),
                (c["b"] >= 0, {"where": "b", "message": "b negative"}),
            ],
        )
    })
    rows = sch.validate(df, keys=["id"]).violations.orderBy("id", "where").collect()
    got = [(r["id"], r["code"], r["where"], r["message"]) for r in rows]
    # reference golden (verified by running /root/reference/src/schisma.mjs):
    # carrier at k + subs at k.a / k.b; valid row 2 emits nothing
    assert got == [
        (1, "invalid", "k", None),
        (1, "invalid", "k.a", "a must be 100"),
        (1, "invalid", "k.b", "b negative"),
    ]
    carrier = [r for r in rows if r["where"] == "k"][0]
    assert carrier["value"] == '{"a":99,"b":-1}'


def test_validate_array_of_subresults_root(spark):
    """Root-level array $validate: the carrier is unwrapped (schisma.mjs:113)
    — only sub rows, with UNprefixed where."""
    from schisma_spark.validate import validate_column

    df = spark.createDataFrame([Row(id=1, v=3), Row(id=2, v=9)])
    sch = schema(Field(
        type=int,
        validate=lambda c: [
            (c > 5, {"where": "a", "message": "too small"}),
            (c % 2 == 0, {"where": "b", "message": "odd"}),
        ],
    ))
    rows = validate_column(df, "v", sch, keys=["id"]).violations \
        .orderBy("id", "where").collect()
    got = [(r["id"], r["code"], r["where"], r["message"]) for r in rows]
    assert got == [
        (1, "invalid", "v.a", "too small"),
        (1, "invalid", "v.b", "odd"),
        (2, "invalid", "v.b", "odd"),
    ]
