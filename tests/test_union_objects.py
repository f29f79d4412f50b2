"""Union of OBJECT alternatives in validate (conformance.mjs:36-75's
validate half): per-row best-match via the heuristic, violations only when
no variant fits."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from schisma_spark import Field, schema

ST = T.StructType(
    [
        T.StructField("cat_name", T.StringType()),
        T.StructField("dog_name", T.StringType()),
        T.StructField("meows", T.BooleanType()),
        T.StructField("barks", T.BooleanType()),
    ]
)

CAT = {"cat_name": str, "meows": bool}
DOG = {"dog_name": str, "barks": bool}


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, pet=Row(**r)) for i, r in enumerate(rows)],
        T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("pet", ST)]),
    )


def _base(**kw):
    d = {"cat_name": None, "dog_name": None, "meows": None, "barks": None}
    d.update(kw)
    return d


def test_variants_validate_cleanly(spark):
    # unexpected keys inside struct variants are the union-of-fields nulls;
    # ignore them at the variant level via schema unions (each variant
    # accepts only its own fields, so the OTHER variant's nulls must not
    # count against the winner) -> use ignore_unexpected
    df = _df(spark, [
        _base(cat_name="tom", meows=True),
        _base(dog_name="rex", barks=False),
    ])
    sch = schema({"pet": Field(typeof=[CAT, DOG])})
    got = sch.validate(df, keys=["id"], ignore_unexpected=True)
    assert got.violations.count() == 0


def test_no_variant_fits(spark):
    # neither name present: both variants miss their required key ->
    # best alternative still carries a missing-key violation
    df = _df(spark, [_base(meows=True)])
    sch = schema({"pet": Field(typeof=[CAT, DOG])})
    got = sch.validate(df, keys=["id"],
                       ignore_unexpected=True).violations.collect()
    assert len(got) >= 1
    assert all(g["code"] == "missing key" for g in got)
    assert {g["where"] for g in got} <= {"pet.cat_name", "pet.dog_name"}


def test_winner_determines_violations(spark):
    # cat variant matches except meows has a bad value -> winner is CAT
    # (higher h than DOG which misses everything); its violation surfaces
    df = _df(spark, [_base(cat_name="tom")])  # meows missing
    sch = schema({"pet": Field(typeof=[CAT, DOG])})
    got = sch.validate(df, keys=["id"],
                       ignore_unexpected=True).violations.collect()
    assert [(g["code"], g["where"]) for g in got] == [("missing key", "pet.meows")]
