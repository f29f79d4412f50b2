"""Baseline snapshot save/compare workflow (FIXTURES.md A4 end-to-end)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schisma_spark.checks.baseline import (
    BaselineSpec,
    compare_to_baseline,
    save_baseline,
)
from schisma_spark.image.fixtures import images_ref


def test_baseline_roundtrip_and_drift(spark, tmp_path):
    clean = images_ref(spark, 3000, seed=42).cache()
    spec = BaselineSpec(
        columns={"w": (0.0, 64.0, 16), "h": (0.0, 64.0, 16)},
        group_by=("part",),
    )
    bpath = str(tmp_path / "baseline")
    save_baseline(clean, spec, bpath)

    # same data -> everything passes with ks == 0
    same = compare_to_baseline(clean, bpath, threshold=0.1)
    rows = same.collect()
    assert len(rows) == 2 * 16
    assert all(r["verdict"] == "pass" and r["ks"] == 0.0 for r in rows)

    # shift w in two partitions -> exactly those (column w) fail
    shifted = clean.withColumn(
        "w",
        F.when(F.col("part").isin(2, 9), F.col("w") + 24).otherwise(F.col("w")),
    )
    got = compare_to_baseline(shifted, bpath, threshold=0.1)
    failed = {(r["column"], r["part"]) for r in got.collect()
              if r["verdict"] == "fail"}
    assert failed == {("w", 2), ("w", 9)}
    clean.unpersist()


def test_baseline_with_kll_sketch_columns(spark, tmp_path):
    """r2: sketch columns in the baseline workflow — no bin config needed,
    merge-capable state, same pass/fail surface."""
    clean = images_ref(spark, 2000, seed=42)
    spec = BaselineSpec(columns={}, group_by=(), sketch_columns=("w",))
    p = str(tmp_path / "b")
    save_baseline(clean, spec, p)
    same = compare_to_baseline(images_ref(spark, 2000, seed=42), p,
                               threshold=0.1)
    r = same.collect()[0]
    assert r["column"] == "w" and r["verdict"] == "pass"

    shifted = images_ref(spark, 2000, seed=42).withColumn(
        "w", F.col("w") + F.lit(40))
    bad = compare_to_baseline(shifted, p, threshold=0.1).collect()[0]
    assert bad["verdict"] == "fail" and bad["ks"] > 0.3
