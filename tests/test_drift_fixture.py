"""FIXTURES.md A4: drift baseline — regenerate `w` with a shifted
distribution in two partitions; the KS comparison must flag exactly those
partitions. Also covers the applyInPandas histogram twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schisma_spark.checks.drift import (
    drift_verdicts,
    fixed_histogram,
    grouped_histogram_pandas,
    ks_from_histograms,
    quantile_sketch,
)
from schisma_spark.image.fixtures import images_ref


@pytest.fixture(scope="module")
def base(spark):
    return images_ref(spark, 4000, seed=42).cache()


def test_drift_flags_shifted_partitions(spark, base):
    baseline = fixed_histogram(base, "w", 0.0, 64.0, 16, group_by=["part"])
    # shift w by +24 in partitions 5 and 11 only
    shifted = base.withColumn(
        "w",
        F.when(F.col("part").isin(5, 11), F.col("w") + 24).otherwise(F.col("w")),
    )
    current = fixed_histogram(shifted, "w", 0.0, 64.0, 16, group_by=["part"])
    verd = drift_verdicts(current, baseline, threshold=0.2, group_by=["part"])
    rows = {r["part"]: r for r in verd.collect()}
    assert len(rows) == 16
    flagged = {p for p, r in rows.items() if r["verdict"] == "fail"}
    assert flagged == {5, 11}
    assert all(rows[p]["ks"] == 0.0 for p in rows if p not in flagged)


def test_grouped_histogram_pandas_matches_jvm(spark, base):
    jvm = {
        (r["part"], r["bin"]): r["cnt"]
        for r in fixed_histogram(base, "w", 0.0, 64.0, 16,
                                 group_by=["part"]).collect()
    }
    pd_ = {
        (r["part"], r["bin"]): r["cnt"]
        for r in grouped_histogram_pandas(base, "w", 0.0, 64.0, 16,
                                          ["part"]).collect()
    }
    assert jvm == pd_


def test_quantile_sketch(spark, base):
    q = quantile_sketch(base, ["w", "h"], probs=(0.1, 0.5, 0.9)).collect()[0]
    assert len(q["q_w"]) == 3
    assert 16 <= q["q_w"][0] <= q["q_w"][2] <= 32
