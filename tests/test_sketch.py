"""KLL sketch checks (SURVEY §4.3.3; north_star names KLL/t-digest)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schisma_spark.checks import (
    kll_merge,
    kll_quantile_check,
    kll_quantiles,
    kll_sketch,
    ks_from_sketches,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_kll_quantiles_within_rank_error(spark, lineitem):
    # hard accuracy verdict: exact rank of each estimate within KLL_TOL
    # (3x the documented k=200 rank error)
    out = kll_quantile_check(lineitem, "l_quantity",
                             [0.1, 0.25, 0.5, 0.75, 0.9]).collect()
    assert [r["q"] for r in out] == [0.1, 0.25, 0.5, 0.75, 0.9]
    assert all(r["within_tol"] for r in out)


def test_kll_quantile_check_empty_input_visible(spark):
    """r2 ADVICE: an empty / all-null column must NOT vanish into zero
    rows — every probe comes back with within_tol = NULL (check could not
    run)."""
    df = spark.createDataFrame([(None,), (None,)], "v double")
    out = kll_quantile_check(df, "v", [0.25, 0.75]).collect()
    assert [r["q"] for r in out] == [0.25, 0.75]
    assert all(r["within_tol"] is None for r in out)


def test_kll_merge_equals_direct(spark, lineitem):
    # mergeability: per-partition sketches merged == quantiles from one
    # direct sketch, within rank error (the 100-TB resumable-baseline path)
    per_part = kll_sketch(lineitem.withColumn("_p", F.col("l_orderkey") % 8),
                          "l_quantity", group_by=["_p"])
    merged = kll_merge(per_part.select("sketch"))
    direct = kll_sketch(lineitem, "l_quantity")
    qm = {r["q"]: r["value"]
          for r in kll_quantiles(merged, [0.25, 0.5, 0.75]).collect()}
    qd = {r["q"]: r["value"]
          for r in kll_quantiles(direct, [0.25, 0.5, 0.75]).collect()}
    n = lineitem.where(F.col("l_quantity").isNotNull()).count()
    for q in (0.25, 0.5, 0.75):
        # compare by exact rank distance, not value distance
        rm = lineitem.where(F.col("l_quantity") <= qm[q]).count() / n
        rd = lineitem.where(F.col("l_quantity") <= qd[q]).count() / n
        assert abs(rm - q) < 0.04 and abs(rd - q) < 0.04


def test_ks_from_sketches(spark, lineitem):
    a = kll_sketch(lineitem, "l_quantity")
    same = ks_from_sketches(a, a).collect()[0]["ks"]
    assert same == pytest.approx(0.0, abs=0.04)

    shifted = kll_sketch(
        lineitem.withColumn("l_quantity", F.col("l_quantity") + 20.0),
        "l_quantity",
    )
    far = ks_from_sketches(a, shifted).collect()[0]["ks"]
    assert far > 0.3


def test_kll_sketch_state_is_small(spark, lineitem):
    # the whole point at 10^12 rows: fixed-size agg state
    row = kll_sketch(lineitem, "l_quantity").collect()[0]
    assert len(row["sketch"]) < 8192  # ~3 KB at k=200


def test_hll_distinct_check_and_merge(spark, lineitem):
    """HLL cardinality sketches (r3): accuracy verdict within HLL_TOL, and
    MERGEABILITY — per-group sketches unioned without rescanning equal the
    direct whole-table estimate (HLL union is exact over the same state)."""
    from schisma_spark.checks import (
        hll_distinct_check, hll_merge, hll_sketch,
    )

    row = hll_distinct_check(lineitem, "l_partkey").collect()[0]
    assert row["within_tol"]
    assert row["n_exact"] > 0

    direct = hll_sketch(lineitem, "l_partkey").select(
        F.hll_sketch_estimate("sketch").alias("e")).collect()[0]["e"]
    per_group = hll_sketch(lineitem, "l_partkey",
                           group_by=["l_returnflag"])
    merged = hll_merge(per_group).select(
        F.hll_sketch_estimate("sketch").alias("e")).collect()[0]["e"]
    assert merged == direct
