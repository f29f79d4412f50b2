"""incremental_validate: delta-cost revalidation between snapshots.

The driver oracle proves incremental == full on the events corpus; these
tests pin the OTHER half of the contract — that validate_fn really only
sees the delta — plus carried/dropped semantics on a hand-built diff."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from schisma_spark import schema
from schisma_spark.json_validate import validate_json
from schisma_spark.validate import incremental_validate

SCH = {"k": float}


def _snap(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, payload=p) for i, p in rows],
        "event_id long, payload string")


def test_incremental_validate_delta_only(spark):
    old = _snap(spark, [
        (1, '{"k": 1.0}'),          # valid, unchanged
        (2, '{"k": "bad"}'),        # violation, REPAIRED in new
        (3, '{"k": 2.0}'),          # valid, BROKEN in new
        (4, '{"k": 3.0}'),          # valid, unchanged
        (5, '{}'),                  # missing-key violation, unchanged
        (6, '{"k": "gone"}'),       # violation, REMOVED in new
    ])
    new = _snap(spark, [
        (1, '{"k": 1.0}'),
        (2, '{"k": 9.0}'),
        (3, '{"k": "broken"}'),
        (4, '{"k": 3.0}'),
        (5, '{}'),
        (7, '{"k": "added-bad"}'),  # ADDED, violating
    ])
    sch = schema(SCH)
    seen = []

    def vfn(df):
        seen.append({r.event_id for r in df.select("event_id").collect()})
        return validate_json(df, "payload", sch,
                             keys=["event_id"]).violations

    prior = validate_json(old, "payload", sch, keys=["event_id"]).violations
    out = incremental_validate(old, new, "event_id", "payload", vfn, prior)
    got = sorted((r.event_id, r.code) for r in
                 out.select("event_id", "code", "where").collect())
    full = sorted((r.event_id, r.code) for r in
                  validate_json(new, "payload", sch, keys=["event_id"])
                  .violations.select("event_id", "code").collect())
    assert got == full                      # incremental == full
    assert seen == [{2, 3, 7}]              # validate_fn saw ONLY the delta
    ids = [i for i, _ in got]
    assert 5 in ids                          # carried (unchanged violation)
    assert 2 not in ids                      # repaired change cleared it
    assert 6 not in ids                      # removed row's violation gone
    assert 3 in ids and 7 in ids             # fresh delta violations


def test_incremental_validate_multi_col_fingerprint(spark):
    """payload_cols accepts several columns; a change in ANY re-validates."""
    old = spark.createDataFrame(
        [Row(event_id=1, a='{"k": 1.0}', b="x"),
         Row(event_id=2, a='{"k": 2.0}', b="y")],
        "event_id long, a string, b string")
    new = old.withColumn(
        "b", F.when(F.col("event_id") == 2, "CHANGED").otherwise(F.col("b")))
    sch = schema(SCH)
    seen = []

    def vfn(df):
        seen.append({r.event_id for r in df.select("event_id").collect()})
        return validate_json(df, "a", sch, keys=["event_id"]).violations

    prior = validate_json(old, "a", sch, keys=["event_id"]).violations
    incremental_validate(old, new, "event_id", ["a", "b"], vfn,
                         prior).collect()
    assert seen == [{2}]


def test_incremental_null_shift_between_columns_is_a_change(spark):
    # review regression: xxhash64 SKIPS NULL children, so a payload value
    # shifting between columns across a NULL used to collide and the
    # changed row was carried as unchanged; the isnull-marker fingerprint
    # must classify it as delta
    def snap2(rows):
        return spark.createDataFrame(
            [Row(event_id=i, a=a, b=b) for i, a, b in rows],
            "event_id long, a string, b string")

    old = snap2([(1, '{"k": "bad"}', None)])
    new = snap2([(1, None, '{"k": "bad"}')])
    seen = []

    def vfn(df):
        seen.append(df.count())
        return validate_json(
            df.withColumn("payload", F.coalesce("a", "b")),
            "payload", schema(SCH), keys=["event_id"]).violations

    prior = vfn(old)
    out = incremental_validate(old, new, "event_id", ["a", "b"],
                               vfn, prior)
    n = out.count()
    # the row IS delta: vfn saw it in the incremental pass (second call)
    assert seen[1] == 1
    assert n == 1  # fresh violation, not a stale carry + not doubled


def test_incremental_null_id_rows_are_validated(spark):
    # review regression: NULL-id new rows are classified delta but the
    # plain semi-join dropped them from validate_fn's input
    old = _snap(spark, [(1, '{"k": 1.0}')])
    new = spark.createDataFrame(
        [Row(event_id=1, payload='{"k": 1.0}'),
         Row(event_id=None, payload='{"k": "bad"}')],
        "event_id long, payload string")

    def vfn(df):
        return validate_json(df, "payload", schema(SCH),
                             keys=["event_id"]).violations

    out = incremental_validate(old, new, "event_id", "payload",
                               vfn, vfn(old))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["event_id"] is None
