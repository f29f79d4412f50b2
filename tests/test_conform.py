"""conform() goldens ported from the reference
(/root/reference/test/basic.mjs:25-30, test/complexArray.mjs:20-34,
test/complexObject.mjs:36-92, test/conformance.mjs, test/arrays.mjs:6-9)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from schisma_spark import Field, Null, schema


def test_coercion_matrix(spark):
    # basic.mjs:25-30 — cross-type casts: '32'->32, 0->'0', 1->true,
    # false->null, 'abc'->0 (NaN->default)
    df = spark.createDataFrame(
        [Row(a="32", b=0.0, c=1.0, d=False, e="abc")],
    )
    sch = schema({"a": float, "b": str, "c": bool, "d": Null, "e": float})
    got = sch.conform(df).collect()[0]
    assert got["a"] == 32.0
    assert got["b"] == "0"        # String(0) -> '0'
    assert got["c"] is True       # Boolean(1) -> true
    assert got["d"] is None       # false -> null
    assert got["e"] == 0.0        # Number('abc') -> NaN -> default 0


def test_string_of_object_is_json(spark):
    # schisma.mjs:591-596 — String(obj) -> JSON.stringify
    df = spark.createDataFrame([Row(o=Row(key="value"))])
    got = schema({"o": str}).conform(df).collect()[0]
    assert got["o"] == '{"key":"value"}'


def test_conform_object_missing_and_unexpected(spark):
    # complexObject.mjs:36-92 — missing keys inserted w/ defaults,
    # unexpected keys dropped
    df = spark.createDataFrame([Row(id=1, keep=2.0, extra="drop me")])
    sch = schema({"keep": float, "added": Field(type=str, default="dflt")})
    out = sch.conform(df, keys=["id"])
    assert set(out.columns) == {"id", "keep", "added"}
    row = out.collect()[0]
    assert row["keep"] == 2.0 and row["added"] == "dflt"

    # remove_unexpected=False keeps the extra column
    out2 = sch.conform(df, keys=["id"], remove_unexpected=False)
    assert "extra" in out2.columns


def test_conform_nested_struct(spark):
    df = spark.createDataFrame(
        [Row(o=Row(x="5", junk=True))],
        T.StructType(
            [
                T.StructField(
                    "o",
                    T.StructType(
                        [
                            T.StructField("x", T.StringType()),
                            T.StructField("junk", T.BooleanType()),
                        ]
                    ),
                )
            ]
        ),
    )
    sch = schema({"o": {"x": float, "y": Field(type=float, default=9.0)}})
    got = sch.conform(df).collect()[0]
    assert got["o"].asDict() == {"x": 5.0, "y": 9.0}


def test_conform_array_per_element_repair(spark):
    # complexArray.mjs:20-34 — '32'->32, 'whoops'->0 (NaN->default path)
    df = spark.createDataFrame([Row(a=["32", "whoops", "7.5"])])
    sch = schema({"a": [float]})
    got = sch.conform(df).collect()[0]
    assert got["a"] == [32.0, 0.0, 7.5]


def test_grow_shrink_populate_arrays(spark):
    # arrays.mjs:6-9 + conform option mapping (schisma.mjs:409-411)
    df = spark.createDataFrame([Row(a=[1.0])])
    sch = schema({"a": [2.0, 3.0, 4.0]})  # literals: type+default per index
    got = sch.conform(df, grow_arrays=True).collect()[0]
    assert got["a"] == [1.0, 3.0, 4.0]  # grown with per-index defaults

    df2 = spark.createDataFrame([Row(a=[1.0, 2.0, 3.0, 4.0, 5.0])])
    got = sch.conform(df2, shrink_arrays=True).collect()[0]
    assert got["a"] == [1.0, 2.0, 3.0]

    df3 = spark.createDataFrame(
        [Row(a=None)],
        T.StructType([T.StructField("a", T.ArrayType(T.DoubleType()))]),
    )
    got = sch.conform(df3, populate_arrays=True).collect()[0]
    assert got["a"] == [2.0, 3.0, 4.0]  # missing -> create w/ populate


def test_union_conform_per_row(spark):
    # conformance.mjs:36-75 / deepSchema.mjs:23-72 — $typeof of two object
    # schemas resolved per-datum; each variant conformed losslessly.
    # Relational mapping: struct fields = union of variant keys; fields not
    # in the winning variant are nulled.
    st = T.StructType(
        [
            T.StructField("cat_name", T.StringType()),
            T.StructField("dog_name", T.StringType()),
            T.StructField("meows", T.BooleanType()),
            T.StructField("barks", T.BooleanType()),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(pet=Row(cat_name="tom", dog_name=None, meows=True, barks=None)),
            Row(pet=Row(cat_name=None, dog_name="rex", meows=None, barks=True)),
        ],
        T.StructType([T.StructField("pet", st)]),
    )
    cat = {"cat_name": str, "meows": bool}
    dog = {"dog_name": str, "barks": bool}
    sch = schema({"pet": Field(typeof=[cat, dog])})
    rows = sch.conform(df).collect()
    assert rows[0]["pet"]["cat_name"] == "tom" and rows[0]["pet"]["meows"] is True
    assert rows[0]["pet"]["dog_name"] is None
    assert rows[1]["pet"]["dog_name"] == "rex" and rows[1]["pet"]["barks"] is True
    assert rows[1]["pet"]["cat_name"] is None


def test_conform_missing_column_inserted(spark):
    df = spark.createDataFrame([Row(x=1.0)])
    sch = schema({"x": float, "missing_col": Field(type=float, default=3.5)})
    got = sch.conform(df).collect()[0]
    assert got["missing_col"] == 3.5


def test_conform_optional_null_stays(spark):
    df = spark.createDataFrame(
        [Row(v=None)],
        T.StructType([T.StructField("v", T.DoubleType())]),
    )
    sch = schema({"v": Field(type=float, required=False, default=1.0)})
    assert sch.conform(df).collect()[0]["v"] is None
    sch2 = schema({"v": Field(type=float, required=True, default=1.0)})
    assert sch2.conform(df).collect()[0]["v"] == 1.0


def test_union_object_insert_missing(spark):
    """ADVICE r1: insert_missing must apply under $typeof object unions —
    the winning branch's missing required keys get their defaults; fields
    only other branches produce come back null (widened union schema).
    The reference crashes on this input, so the relational semantics are
    the engine's own, documented here."""
    df = spark.createDataFrame(
        [Row(id=1, u=Row(a=1.0, c=2.0)), Row(id=2, u=Row(a=3.0, c=None))],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("u", T.StructType([
                T.StructField("a", T.DoubleType()),
                T.StructField("c", T.DoubleType()),
            ])),
        ]),
    )
    sch = schema({"u": Field(typeof=[
        {"a": float, "b": Field(type=float, default=9.0)},
        {"a": float, "c": Field(type=float, default=7.0)},
    ])})
    out = {r["id"]: r["u"] for r in sch.conform(df, keys=["id"]).collect()}
    # both rows resolve to the {a, c} branch (c is a declared key there);
    # row 2's null required c gets its default — previously silently dropped
    assert out[1].asDict() == {"a": 1.0, "b": None, "c": 2.0}
    assert out[2].asDict() == {"a": 3.0, "b": None, "c": 7.0}


def test_union_object_conflicting_field_types_try_cast(spark):
    """r2 ADVICE: two union alternatives output the same field name with
    DIFFERENT types; the union schema registers the first-seen type. The
    other branch's value must survive via try_cast to that type — not be
    silently replaced with NULL when its branch wins the row."""
    df = spark.createDataFrame(
        [Row(id=1, u=Row(a=1.0, b=None, x="7")),
         Row(id=2, u=Row(a=None, b=2.0, x="5")),
         Row(id=3, u=Row(a=None, b=2.0, x="abc"))],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("u", T.StructType([
                T.StructField("a", T.DoubleType()),
                T.StructField("b", T.DoubleType()),
                T.StructField("x", T.StringType()),
            ])),
        ]),
    )
    sch = schema({"u": Field(typeof=[
        {"a": float, "x": float},           # registers x as double
        {"b": float, "x": str},             # conforms x as string
    ])})
    out = {r["id"]: r["u"] for r in sch.conform(df, keys=["id"]).collect()}
    # rows 2/3 resolve to the {b, x: str} branch; its string x is cast to
    # the union's double instead of nulled
    assert out[2]["b"] == 2.0 and out[2]["x"] == 5.0
    assert out[3]["x"] is None  # genuinely uncastable value -> NULL


def test_union_object_boolean_date_conflict_plans(spark):
    """r3 ADVICE: _castable used to claim ANY atomic pair inter-casts, but
    Spark's try_cast fails ANALYSIS (not runtime-NULL) for boolean<->date/
    timestamp and numeric<->date — a union typing the same field boolean in
    one alternative and date in another raised AnalysisException at plan
    time. Those pairs must plan and fall back to NULL."""
    import datetime as dt

    df = spark.createDataFrame(
        [Row(id=1, u=Row(a=1.0, x=True)),
         Row(id=2, u=Row(a=None, x=False))],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("u", T.StructType([
                T.StructField("a", T.DoubleType()),
                T.StructField("x", T.BooleanType()),
            ])),
        ]),
    )
    sch = schema({"u": Field(typeof=[
        {"a": float, "x": bool},                # registers x as boolean
        {"a": float, "x": T.DateType()},        # conflicting date branch
    ])})
    out = {r["id"]: r["u"] for r in sch.conform(df, keys=["id"]).collect()}
    assert out[1].asDict() == {"a": 1.0, "x": True}

    # and the mirrored registration order (x lands as date first)
    df2 = spark.createDataFrame(
        [Row(id=1, u=Row(a=1.0, x=dt.date(2020, 1, 2)))],
        T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("u", T.StructType([
                T.StructField("a", T.DoubleType()),
                T.StructField("x", T.DateType()),
            ])),
        ]),
    )
    sch2 = schema({"u": Field(typeof=[
        {"a": float, "x": T.DateType()},
        {"a": float, "x": bool},
    ])})
    out2 = {r["id"]: r["u"] for r in sch2.conform(df2, keys=["id"]).collect()}
    assert out2[1].asDict() == {"a": 1.0, "x": dt.date(2020, 1, 2)}
