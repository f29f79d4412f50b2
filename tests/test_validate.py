"""validate() goldens ported from the reference's ava tests + README.

Each case: tiny DataFrame + schema DSL -> assert exact violation rows
(code/where/value), mirroring the reference's ``t.deepEqual`` goldens.
Sources cited per test.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark import Field, Null, schema


def _viols(result):
    rows = result.violations.collect()
    return sorted(
        [(r["code"], r["where"], r["expected"], r["received"], r["value"]) for r in rows]
    )


def test_required_true_false(spark):
    # /root/reference/test/schemaObject.mjs:86-122 — MISSING_KEY iff required
    df = spark.createDataFrame(
        [Row(id=1, v=1.0), Row(id=2, v=None)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    sch = schema({"v": Field(type=float, required=True)})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert len(got) == 1
    assert (got[0]["id"], got[0]["code"], got[0]["where"]) == (2, "missing key", "v")

    sch = schema({"v": Field(type=float, required=False)})
    assert sch.validate(df, keys=["id"]).violations.count() == 0

    # ignoreRequired suppresses MISSING_KEY (schisma.mjs:307)
    sch = schema({"v": Field(type=float, required=True)})
    assert sch.validate(df, keys=["id"], ignore_required=True).violations.count() == 0


def test_validate_custom_predicate(spark):
    # schemaObject.mjs:54-76 — $validate true/false -> valid / one INVALID
    df = spark.createDataFrame([Row(id=1, v=10.0), Row(id=2, v=99.0)])
    sch = schema({"v": Field(type=float, validate=lambda c: c < 50)})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert len(got) == 1
    assert (got[0]["id"], got[0]["code"], got[0]["where"], got[0]["value"]) == (
        2,
        "invalid",
        "v",
        "99.0",
    )


def test_type_no_match(spark):
    # schisma.mjs:336-351 — typeof mismatch -> NO_MATCH with expected/received
    df = spark.createDataFrame([Row(id=1, v="hello")])
    sch = schema({"v": float})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert len(got) == 1
    g = got[0]
    assert (g["code"], g["where"], g["expected"], g["received"], g["value"]) == (
        "no match",
        "v",
        "number",
        "string",
        "hello",
    )


def test_unexpected_key(spark):
    # schisma.mjs:300-305 — data key not in schema
    df = spark.createDataFrame([Row(id=1, v=1.0, extra="x")])
    sch = schema({"v": float})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["code"], g["where"], g["received"]) for g in got] == [
        ("unexpected key", "extra", "x")
    ]
    assert (
        schema({"v": float})
        .validate(df, keys=["id"], ignore_unexpected=True)
        .violations.count()
        == 0
    )


def test_union_resolution(spark):
    # schisma.mjs:357-394 — $typeof best-match; NO_MATCH carries type_index 0
    df = spark.createDataFrame(
        [Row(id=1, v=True)],
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.BooleanType())]
        ),
    )
    sch = schema({"v": Field(typeof=[str, float])})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert len(got) == 1
    assert got[0]["code"] == "no match"
    assert got[0]["type_index"] == 0  # first max wins (schisma.mjs:361)

    # matching alternative -> no violations
    df2 = spark.createDataFrame([Row(id=1, v=3.0)])
    assert schema({"v": Field(typeof=[str, float])}).validate(
        df2, keys=["id"]
    ).violations.count() == 0


def test_null_type(spark):
    # schisma.mjs:34-37,599-600 — Null schema: value must be null
    df = spark.createDataFrame(
        [Row(id=1, v="x"), Row(id=2, v=None)],
        T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
        ),
    )
    sch = schema({"v": Null})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert len(got) == 1
    assert (got[0]["id"], got[0]["code"], got[0]["expected"]) == (1, "no match", "null")


def test_nested_object_dot_paths(spark):
    # flatten dot-paths (schisma.mjs:117-133): child errors get parent.child
    df = spark.createDataFrame(
        [Row(id=1, o=Row(x=None, y=1.0))],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "o",
                    T.StructType(
                        [
                            T.StructField("x", T.DoubleType()),
                            T.StructField("y", T.DoubleType()),
                        ]
                    ),
                ),
            ]
        ),
    )
    sch = schema({"o": {"x": float, "y": float}})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["code"], g["where"]) for g in got] == [("missing key", "o.x")]


def test_arrays_elementwise(spark):
    # schisma.mjs:181-229 — per-element best-of; length-insensitive by default
    df = spark.createDataFrame([Row(id=1, a=[1.0, 2.0, 3.0])])
    sch = schema({"a": [float]})
    assert sch.validate(df, keys=["id"]).violations.count() == 0

    # long array -> UNEXPECTED_KEY per extra index when enabled (:196-201)
    got = (
        sch.validate(df, keys=["id"], ignore_long_arrays=False)
        .violations.orderBy("where")
        .collect()
    )
    assert [(g["code"], g["where"]) for g in got] == [
        ("unexpected key", "a.1"),
        ("unexpected key", "a.2"),
    ]

    # short array -> MISSING_KEY per missing index when enabled (:214-222)
    sch3 = schema({"a": [float, float, float]})
    df2 = spark.createDataFrame([Row(id=1, a=[1.0])])
    got = (
        sch3.validate(df2, keys=["id"], ignore_short_arrays=False)
        .violations.orderBy("where")
        .collect()
    )
    assert [(g["code"], g["where"], g["type_index"]) for g in got] == [
        ("missing key", "a.1", 1),
        ("missing key", "a.2", 2),
    ]


def test_array_element_null_is_value(spark):
    # array elements: null is a VALUE (JS null), not an absent key
    df = spark.createDataFrame(
        [Row(id=1, a=[1.0, None, 3.0])],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("a", T.ArrayType(T.DoubleType(), True)),
            ]
        ),
    )
    got = schema({"a": [float]}).validate(df, keys=["id"]).violations.collect()
    assert [(g["code"], g["where"], g["received"]) for g in got] == [
        ("no match", "a.1", "null")
    ]


def test_regex_keys_map(spark):
    # test/regexKeys.mjs:4-48 — pattern-matched keys validate; unmatched
    # keys are unexpected
    df = spark.createDataFrame(
        [Row(id=1, m={"x_a": 1.0, "x_b": 2.0, "bad": 3.0})],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
            ]
        ),
    )
    sch = schema({"m": {"$/^x_": [float]}})
    got = sch.validate(df, keys=["id"]).violations.collect()
    assert [(g["code"], g["where"]) for g in got] == [("unexpected key", "m.bad")]


def test_readme_five_errors(spark):
    # /root/reference/README.md:191-274 — the canonical validate example:
    # 2x missing key, 1x no match, 1x invalid, 1x unexpected key.
    # Relational adaptation: heterogeneous `hairless` becomes a string
    # column checked with castable=True (try_cast conformance).
    cat_t = T.StructType(
        [
            T.StructField("hairless", T.StringType()),
            T.StructField("age", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(
                name="OXXO",
                height=180.0,
                owns=Row(
                    cats=[
                        Row(hairless="true", age=400.0),
                        Row(hairless="false", age=10.0),
                        Row(hairless="maybe", age=20.0),
                    ]
                ),
            )
        ],
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("height", T.DoubleType()),
                T.StructField(
                    "owns",
                    T.StructType([T.StructField("cats", T.ArrayType(cat_t))]),
                ),
            ]
        ),
    )
    sch = schema(
        {
            "name": str,
            "age": float,
            "owns": {
                "cats": [
                    {
                        "hairless": Field(type=bool, castable=True),
                        "age": Field(
                            type=float,
                            validate=lambda c: (
                                c <= 38,
                                {"expected": "<=38", "received": c.cast("string")},
                            ),
                        ),
                    }
                ],
                "apples": float,
            },
        }
    )
    got = sch.validate(df).violations.orderBy("code", "where").collect()
    assert [(g["code"], g["where"]) for g in got] == [
        ("invalid", "owns.cats.0.age"),
        ("missing key", "age"),
        ("missing key", "owns.apples"),
        ("no match", "owns.cats.2.hairless"),
        ("unexpected key", "height"),
    ]
    nm = [g for g in got if g["code"] == "no match"][0]
    assert (nm["received"], nm["value"]) == ("string", "maybe")
    inv = [g for g in got if g["code"] == "invalid"][0]
    assert (inv["expected"], inv["received"]) == ("<=38", "400.0")

    # option-filtered variant (README.md:258-274)
    got2 = (
        sch.validate(df, ignore_unexpected=True, ignore_required=True)
        .violations.orderBy("code")
        .collect()
    )
    assert [(g["code"], g["where"]) for g in got2] == [
        ("invalid", "owns.cats.0.age"),
        ("no match", "owns.cats.2.hairless"),
    ]


def test_verdicts_per_partition(spark):
    # BASELINE.json:14 — per-partition pass/fail verdicts
    df = spark.createDataFrame(
        [
            Row(part=0, v=1.0),
            Row(part=0, v=2.0),
            Row(part=1, v=None),
            Row(part=1, v=4.0),
        ],
        T.StructType(
            [T.StructField("part", T.LongType()), T.StructField("v", T.DoubleType())]
        ),
    )
    sch = schema({"v": float})
    vr = sch.validate(df, keys=["part"], ignore_unexpected=True)
    verd = {r["part"]: r for r in vr.verdicts(["part"]).collect()}
    assert verd[0]["verdict"] == "pass" and verd[0]["n_violations"] == 0
    assert verd[1]["verdict"] == "fail" and verd[1]["n_bad_rows"] == 1
