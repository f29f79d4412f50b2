"""Runner sinks (E2), recursion helper, set-op drift."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark import Field, schema
from schisma_spark.checks.drift import new_categories
from schisma_spark.dsl import recursive
from schisma_spark.image.fixtures import dim_fmt, images_schema_dsl, images_table
from schisma_spark.runner import RunConfig, ValidationRun


def test_write_outputs(spark, tmp_path):
    imgs = images_table(spark, 400, seed=42)
    run = ValidationRun(images_schema_dsl(), RunConfig())
    vp, gp = str(tmp_path / "viols"), str(tmp_path / "verdicts")
    run.write_outputs(imgs, vp, gp,
                      dims={("fmt",): (dim_fmt(spark), ("fmt",))})
    viols = spark.read.parquet(vp)
    verd = spark.read.parquet(gp)
    assert verd.count() == 16
    assert viols.count() > 0
    # violations partitioned by part -> a part filter prunes files
    plan = viols.where(F.col("part") == 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan
    # the union carries row-level AND referential codes
    codes = {r["code"] for r in viols.select("code").distinct().collect()}
    assert "no match" in codes  # webp fmt referential violations


def test_recursive_schema(spark):
    # test/recursiveSchema.mjs:5-35 — recursion, depth-limited at compile
    tree = recursive(
        lambda child: {
            "name": str,
            "child": Field(typeof=[child], required=False),
        },
        depth=3,
    )
    st = T.StructType
    f = T.StructField
    lvl2 = st([f("name", T.StringType()), f("child", T.StringType())])
    lvl1 = st([f("name", T.StringType()), f("child", lvl2)])
    df = spark.createDataFrame(
        [
            Row(name="root", child=Row(name="c1", child=Row(name=None, child="x"))),
        ],
        st([f("name", T.StringType()), f("child", lvl1)]),
    )
    got = tree.validate(df).violations.collect()
    assert [(g["code"], g["where"]) for g in got] == [
        ("missing key", "child.child.name")
    ]


def test_new_categories(spark):
    cur = spark.createDataFrame([Row(v="a"), Row(v="b"), Row(v="c")])
    base = spark.createDataFrame([Row(v="a"), Row(v="b")])
    got = [r["v"] for r in new_categories(cur, base, "v").collect()]
    assert got == ["c"]
