"""Temporal operators: sessionize / session_stats / asof_join
(functions/temporal.py). The reference has no temporal semantics
(schisma.mjs typeof-only Date handling); these are engine operators, so
the tests are exact-expectation on synthetic frames plus plan-shape
guards (no range-explosion join, no cartesian)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from schisma_spark.functions import asof_join, session_stats, sessionize

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + timedelta(seconds=seconds)


def _events(spark, rows):
    # rows: (user, seconds_offset, event_id)
    return spark.createDataFrame(
        [(u, _ts(s), i) for u, s, i in rows],
        "user string, ts timestamp, event_id long",
    )


def test_sessionize_labels_and_strict_boundary(spark):
    df = _events(spark, [
        ("a", 0, 1),
        ("a", 100, 2),     # within gap
        ("a", 400, 3),     # diff == gap exactly -> SAME session (strict >)
        ("a", 701, 4),     # diff 301 > 300 -> new session
        ("b", 50, 5),      # other entity independent
    ])
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(df, "user", "ts", 300.0).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_tie_timestamps_share_session(spark):
    df = _events(spark, [("a", 0, 1), ("a", 0, 2), ("a", 1000, 3)])
    got = {r["event_id"]: r["session_id"]
           for r in sessionize(df, "user", "ts", 300.0,
                               order_tiebreak="event_id").collect()}
    assert got[1] == got[2] == 1 and got[3] == 2


def test_session_stats_aggregates(spark):
    df = _events(spark, [
        ("a", 0, 1), ("a", 120, 2), ("a", 1000, 3), ("a", 1010, 4),
    ])
    rows = {(r["user"], r["session_id"]): r
            for r in session_stats(df, "user", "ts", 300.0,
                                   id_col="event_id").collect()}
    s1 = rows[("a", 1)]
    assert s1["n_events"] == 2 and s1["span_sec"] == pytest.approx(120.0)
    assert s1["first_id"] == 1 and s1["last_id"] == 2
    s2 = rows[("a", 2)]
    assert s2["n_events"] == 2 and s2["span_sec"] == pytest.approx(10.0)


def _state(spark, rows, fields="user string, ts timestamp, v double, w string"):
    return spark.createDataFrame(
        [(u, _ts(s), *rest) for u, s, *rest in rows], fields
    )


def test_asof_join_backward_equal_ts_and_null(spark):
    left = _events(spark, [
        ("a", 50, 1),    # before any state -> NULL
        ("a", 100, 2),   # equal ts -> state at 100 matches
        ("a", 250, 3),   # latest prior = state at 200
        ("b", 500, 4),   # other key: only b-state applies
    ])
    right = _state(spark, [
        ("a", 100, 1.0, "x"),
        ("a", 200, 2.0, "y"),
        ("b", 10, 9.0, "z"),
    ])
    got = {r["event_id"]: r for r in asof_join(
        left, right, on=["user"], left_ts="ts", right_ts="ts",
        right_cols=["v", "w"]).collect()}
    assert got[1]["v_asof"] is None and got[1]["ts_asof"] is None
    assert got[2]["v_asof"] == 1.0 and got[2]["w_asof"] == "x"
    assert got[3]["v_asof"] == 2.0 and got[3]["ts_asof"] == _ts(200)
    assert got[4]["v_asof"] == 9.0
    # every left column survives untouched
    assert got[3]["ts"] == _ts(250)


def test_asof_join_struct_carry_no_field_resurrection(spark):
    # newer state has v=NULL: the whole-row carry must emit NULL, not the
    # older state's 1.0 (the bug a per-column last(ignorenulls) would have)
    left = _events(spark, [("a", 300, 1)])
    right = _state(spark, [("a", 100, 1.0, "x"), ("a", 200, None, "y")])
    row = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_cols=["v", "w"]).collect()[0]
    assert row["v_asof"] is None and row["w_asof"] == "y"
    assert row["ts_asof"] == _ts(200)


def test_asof_join_tolerance_voids_stale_state(spark):
    left = _events(spark, [("a", 100, 1), ("a", 1000, 2)])
    right = _state(spark, [("a", 90, 5.0, "x")])
    got = {r["event_id"]: r for r in asof_join(
        left, right, on=["user"], left_ts="ts", right_ts="ts",
        right_cols=["v"], tolerance_seconds=60.0).collect()}
    assert got[1]["v_asof"] == 5.0
    assert got[2]["v_asof"] is None and got[2]["ts_asof"] is None


def test_asof_join_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    lpd = pd.DataFrame({
        "user": rng.choice(["a", "b", "c"], 200),
        "ts": [_ts(int(s)) for s in rng.randint(0, 10000, 200)],
        "event_id": np.arange(200, dtype="int64"),
    })
    rpd = pd.DataFrame({
        "user": rng.choice(["a", "b", "c"], 60),
        "ts": [_ts(int(s)) for s in
               rng.choice(np.arange(0, 10000, 7), 60, replace=False)],
        "v": rng.rand(60),
    })
    got = (
        asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            on=["user"], left_ts="ts", right_ts="ts", right_cols=["v"])
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpd.sort_values("ts"), rpd.sort_values("ts"),
        on="ts", by="user", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["v_asof"], exp["v"], check_names=False)


def test_temporal_plans_have_no_cartesian(spark):
    left = _events(spark, [("a", 0, 1)])
    right = _state(spark, [("a", 0, 1.0, "x")])
    j = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_null_state_ts_never_matches(spark):
    # a state row with NULL ts must not be carried (review regression:
    # NULLs sort first and became the earliest state)
    from schisma_spark.functions import asof_join

    left = spark.createDataFrame(
        [Row(k="a", ts=100)], "k string, ts long")
    right = spark.createDataFrame(
        [Row(k="a", ts=None, v=9.0)], "k string, ts long, v double")
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_cols=["v"]).collect()
    assert len(got) == 1
    assert got[0]["v_asof"] is None and got[0]["ts_asof"] is None


def test_asof_join_rejects_internal_name_collisions(spark):
    from schisma_spark.functions import asof_join
    import pytest

    left = spark.createDataFrame(
        [Row(k="a", ts=1, _state="x")], "k string, ts long, _state string")
    right = spark.createDataFrame(
        [Row(k="a", ts=1, v=1.0)], "k string, ts long, v double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    # pre-existing suffixed output name also rejected
    left2 = spark.createDataFrame(
        [Row(k="a", ts=1, v_asof=1.0)], "k string, ts long, v_asof double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left2, right, on=["k"], left_ts="ts", right_ts="ts",
                  right_cols=["v"])


def test_asof_join_forward(spark):
    from schisma_spark.functions import asof_join

    right = spark.createDataFrame(
        [Row(k="a", ts=10, v=1.0), Row(k="a", ts=20, v=2.0)],
        "k string, ts long, v double")
    left = spark.createDataFrame(
        [Row(k="a", id=1, ts=5), Row(k="a", id=2, ts=15),
         Row(k="a", id=3, ts=25), Row(k="a", id=4, ts=10),
         Row(k="a", id=5, ts=None)],
        "k string, id int, ts long")
    got = {r["id"]: r for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], direction="forward").collect()}
    assert got[1]["v_asof"] == 1.0 and got[1]["ts_asof"] == 10
    assert got[2]["v_asof"] == 2.0
    assert got[3]["v_asof"] is None          # nothing after 25
    assert got[4]["v_asof"] == 1.0           # equal ts matches forward
    assert got[5]["v_asof"] is None          # NULL query ts: no match
    # backward on the same frame: NULL query ts also no match
    back = {r["id"]: r for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"]).collect()}
    assert back[5]["v_asof"] is None and back[1]["v_asof"] is None
    assert back[3]["v_asof"] == 2.0

    # forward tolerance: match farther than the window is voided
    tol = {r["id"]: r for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v"], direction="forward",
        tolerance_seconds=3e-6).collect()}
    assert tol[2]["v_asof"] is None          # 15 -> 20 is 5us > 3us
    assert tol[4]["v_asof"] == 1.0           # equal ts, gap 0
