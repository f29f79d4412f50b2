"""Functional-dependency and per-key sequence checks (checks/dependency.py,
checks/sequence.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from schisma_spark.checks.dependency import fd_groups, fd_violations
from schisma_spark.checks.sequence import monotonic_violations, sequence_gaps


def test_fd_groups_null_safe(spark):
    df = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=1, v="a"),          # clean
         Row(k=2, v="a"), Row(k=2, v="b"),          # 2 values
         Row(k=3, v=None), Row(k=3, v="a"),         # NULL vs 'a' violates
         Row(k=4, v=None), Row(k=4, v=None)],       # all-NULL is ONE value
        "k int, v string",
    )
    got = {r["k"]: r.asDict() for r in fd_groups(df, ["k"], ["v"]).collect()}
    assert not got[1]["violating"] and got[1]["n_values"] == 1
    assert got[2]["violating"] and got[2]["n_values"] == 2
    assert got[3]["violating"] and got[3]["n_values"] == 2
    assert not got[4]["violating"] and got[4]["n_values"] == 1
    assert got[2]["n_rows"] == 2


def test_fd_violations_rows(spark):
    df = spark.createDataFrame(
        [Row(id=1, k=1, v="a"), Row(id=2, k=1, v="a"),
         Row(id=3, k=2, v="a"), Row(id=4, k=2, v="b")],
    )
    got = fd_violations(df, ["k"], ["v"], keys=["id"]).collect()
    # every row of the violating group is emitted, clean group never
    assert sorted(r["id"] for r in got) == [3, 4]
    assert all(r["code"] == "invalid" for r in got)
    assert all(r["where"] == "v" for r in got)
    assert {r["received"] for r in got} == {"a", "b"}


def test_sequence_gaps(spark):
    df = spark.createDataFrame(
        [Row(k=1, n=1), Row(k=1, n=2), Row(k=1, n=5),   # gap 3..4
         Row(k=2, n=3),                                  # leading 1..2
         Row(k=3, n=1), Row(k=3, n=1), Row(k=3, n=2),   # dup, no gap
         Row(k=4, n=None), Row(k=4, n=2)],               # NULL ignored
    )
    got = sorted(
        (r["k"], r["gap_start"], r["gap_end"], r["gap_len"])
        for r in sequence_gaps(df, ["k"], "n", start=1).collect())
    assert got == [(1, 3, 4, 2), (2, 1, 2, 2), (4, 1, 1, 1)]
    # without start: leading gaps disappear
    got2 = sorted(
        (r["k"], r["gap_start"], r["gap_end"])
        for r in sequence_gaps(df, ["k"], "n").collect())
    assert got2 == [(1, 3, 4)]


def test_monotonic_violations(spark):
    df = spark.createDataFrame(
        [Row(k=1, o=1, v=10.0), Row(k=1, o=2, v=None),
         Row(k=1, o=3, v=5.0),   # violates vs carried 10 (NULL skipped)
         Row(k=1, o=4, v=5.0),   # equal: fine non-strict, bad strict
         Row(k=2, o=1, v=1.0), Row(k=2, o=2, v=2.0)],
        "k int, o int, v double",
    )
    got = monotonic_violations(df, ["k"], ["o"], "v").collect()
    assert [(r["k"], r["o"]) for r in got] == [(1, 3)]
    assert got[0]["received"] == "5.0" and got[0]["value"] == "10.0"
    strict = monotonic_violations(df, ["k"], ["o"], "v", strict=True)
    assert sorted((r["k"], r["o"]) for r in strict.collect()) == [
        (1, 3), (1, 4)]


def test_fd_and_gaps_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [Row(id=1, k=1, v="a")], "id int, k int, v string")
    plan = fd_violations(df, ["k"], ["v"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fd_violations_null_determinant(spark):
    # the dirty-data case the check exists for: a NULL determinant group
    # with two cities must emit violation rows (a plain equi-join would
    # silently drop it — review regression)
    df = spark.createDataFrame(
        [Row(id=1, zip=None, city="NYC"), Row(id=2, zip=None, city="LA"),
         Row(id=3, zip="10001", city="NYC")],
        "id int, zip string, city string",
    )
    got = fd_violations(df, ["zip"], ["city"], keys=["id"]).collect()
    assert sorted(r["id"] for r in got) == [1, 2]
