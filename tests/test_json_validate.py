"""JSON-string validation: runtime per-row key sets — the full reference
semantics (unexpected/missing/regex/type) where they genuinely can't fold
into compile time."""

from __future__ import annotations

from pyspark.sql import Row

from schisma_spark import Field, schema
from schisma_spark.json_validate import validate_json


def _collect(res):
    return sorted(
        (r["id"], r["code"], r["where"]) for r in res.violations.collect()
    )


def test_json_validate_full_semantics(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, payload='{"k": 5, "name": "a"}'),          # clean
            Row(id=2, payload='{"k": "oops", "name": "b"}'),     # bad type
            Row(id=3, payload='{"name": "c"}'),                  # missing k
            Row(id=4, payload='{"k": 1, "name": "d", "zz": 9}'), # unexpected
            Row(id=5, payload="{not json"),                      # malformed
            Row(id=6, payload=None),                             # absent
        ]
    )
    sch = schema({"k": float, "name": str})
    res = validate_json(df, "payload", sch, keys=["id"])
    got = _collect(res)
    assert got == [
        (2, "no match", "k"),
        (3, "missing key", "k"),
        (4, "unexpected key", "zz"),
        (5, "invalid", None),
    ]

    # option surface applies
    res2 = validate_json(df, "payload", sch, keys=["id"],
                         ignore_unexpected=True, ignore_required=True)
    assert _collect(res2) == [(2, "no match", "k"), (5, "invalid", None)]


def test_json_regex_keys_runtime(spark):
    # regex keys matched per row at runtime (schisma.mjs:256-295)
    df = spark.createDataFrame(
        [
            Row(id=1, payload='{"x_lat": 1.5, "x_lon": "bad", "other": 1}'),
        ]
    )
    sch = schema({"$/^x_": [float]})
    got = _collect(validate_json(df, "payload", sch, keys=["id"]))
    assert got == [
        (1, "no match", "x_lon"),
        (1, "unexpected key", "other"),
    ]


def test_json_required_false(spark):
    df = spark.createDataFrame([Row(id=1, payload="{}")])
    sch = schema({"opt": Field(type=float, required=False)})
    assert validate_json(df, "payload", sch, keys=["id"]).violations.count() == 0
