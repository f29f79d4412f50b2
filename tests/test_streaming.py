"""Streaming surface: foreachBatch validation + windowed drift (E17)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from schisma_spark import Field, schema
from schisma_spark.image.fixtures import IMAGES_SCHEMA, images_schema_dsl, images_table
from schisma_spark.manifest import Manifest
from schisma_spark.streaming import validate_stream, windowed_drift_stream


def test_validate_stream_available_now(spark, tmp_path):
    inp = str(tmp_path / "in")
    imgs = images_table(spark, 400, seed=42)
    imgs.write.mode("overwrite").parquet(inp)

    q = validate_stream(
        spark,
        inp,
        images_schema_dsl(),
        IMAGES_SCHEMA,
        manifest_path=str(tmp_path / "manifest"),
        checkpoint_path=str(tmp_path / "ckpt"),
        violations_path=str(tmp_path / "viols"),
        keys=("image_id",),
    )
    q.awaitTermination(120)
    m = Manifest(str(tmp_path / "manifest"))
    recs = m.records()
    assert recs, "streaming run must append manifest records"
    assert sum(r["n_rows"] for r in recs) == 400
    assert any(r["verdict"] == "fail" for r in recs)
    viols = spark.read.parquet(str(tmp_path / "viols"))
    assert viols.count() > 0

    # restart with same checkpoint: already-processed files are NOT redone
    q2 = validate_stream(
        spark, inp, images_schema_dsl(), IMAGES_SCHEMA,
        manifest_path=str(tmp_path / "manifest"),
        checkpoint_path=str(tmp_path / "ckpt"),
        keys=("image_id",),
    )
    q2.awaitTermination(60)
    assert sum(r["n_rows"] for r in Manifest(str(tmp_path / "manifest")).records()) == 400


def test_windowed_drift_stream(spark, tmp_path):
    inp = str(tmp_path / "ev")
    df = spark.createDataFrame(
        [(i, f"2026-01-01 00:{i % 50:02d}:00", float(i % 40)) for i in range(200)],
        "id long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(df.schema).parquet(inp)
    hist = windowed_drift_stream(stream, "ts", "v", 0.0, 40.0, 8,
                                 window="10 minutes")
    # complete mode for the memory sink: append mode only emits windows
    # once the watermark passes them, which a single availableNow batch
    # never reaches — correct semantics, awkward for a one-shot test
    q = (
        hist.writeStream.format("memory")
        .queryName("drift_hist")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from drift_hist").collect()
    assert out
    assert sum(r["cnt"] for r in out) == 200
    assert {r["bin"] for r in out} <= set(range(8))


def test_windowed_kll_stream(spark, tmp_path):
    from schisma_spark.checks import kll_quantiles, ks_from_sketches
    from schisma_spark.checks.sketch import kll_sketch
    from schisma_spark.streaming import windowed_kll_stream

    inp = str(tmp_path / "ev3")
    df = spark.createDataFrame(
        [(i, f"2026-01-01 00:{i % 50:02d}:00", float(i % 40)) for i in range(400)],
        "id long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(df.schema).parquet(inp)
    sk = windowed_kll_stream(stream, "ts", "v", window="25 minutes")
    q = (
        sk.writeStream.format("memory").queryName("kll_win")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.awaitTermination(120)
    wins = spark.sql("select * from kll_win")
    rows = wins.collect()
    # 50 minutes of events / 25-minute tumbling windows -> 2 (3 when the
    # epoch-aligned window grid straddles the first/last event)
    assert len(rows) in (2, 3)
    assert all(len(r["sketch"]) < 8192 for r in rows)  # fixed-size state
    # window sketches are real KLL state: quantiles + drift compare work
    qs = kll_quantiles(wins.limit(1), [0.5]).collect()
    assert 0.0 <= qs[0]["value"] <= 40.0
    base = kll_sketch(df, "v")
    ks = ks_from_sketches(wins.limit(1).select("sketch"), base).collect()
    assert 0.0 <= ks[0]["ks"] <= 1.0


def test_stateful_exact_dedup_stream(spark, tmp_path):
    """r3: custom stateful operator (applyInPandasWithState) — cross-batch
    exact dedup whose keyed state survives a query restart through the
    checkpoint."""
    from schisma_spark.streaming import stateful_exact_dedup_stream

    inp = str(tmp_path / "dd_in")
    ck = str(tmp_path / "dd_ck")
    spark.createDataFrame(
        [(1, "a1"), (1, "a2"), (2, "b1")], "fp long, id string"
    ).write.mode("overwrite").parquet(inp)

    def run(name):
        # foreachBatch sink: unlike the memory sink it supports resuming
        # from the checkpoint, which is the point of this test
        rows = []
        stream = spark.readStream.schema("fp long, id string").parquet(inp)
        out = stateful_exact_dedup_stream(stream, "fp", "id")
        q = (
            out.writeStream
            .foreachBatch(lambda df, _bid: rows.extend(df.collect()))
            .outputMode("update").trigger(availableNow=True)
            .option("checkpointLocation", ck).start()
        )
        q.awaitTermination(120)
        return {r["fp"]: r for r in rows}

    r1 = run("dd1")
    assert r1[1]["is_new"] and r1[1]["n_dupes"] == 2
    assert r1[1]["first_id"] == "a1"
    assert r1[2]["is_new"] and r1[2]["n_dupes"] == 1

    # later drop: a duplicate of fp=1 plus a brand-new fp=3; the restarted
    # query recovers its state from the checkpoint and recognizes the dup
    spark.createDataFrame(
        [(1, "a3"), (3, "c1")], "fp long, id string"
    ).write.mode("append").parquet(inp)
    r2 = run("dd2")
    assert not r2[1]["is_new"] and r2[1]["n_dupes"] == 3
    assert r2[1]["first_id"] == "a1"   # pinned at first sight
    assert r2[3]["is_new"] and r2[3]["n_dupes"] == 1
    assert 2 not in r2                 # no new occurrences -> no emission


def test_stateful_dedup_stream_derives_schema_types(spark, tmp_path):
    """r4 ADVICE: out/state schemas come from stream_df.schema, so a
    string fingerprint + numeric id works — and first_id uses the id's
    NATIVE ordering (9 < 10 numerically, not lexicographically)."""
    from schisma_spark.streaming import stateful_exact_dedup_stream

    inp = str(tmp_path / "dd2_in")
    ck = str(tmp_path / "dd2_ck")
    spark.createDataFrame(
        [("x", 10), ("x", 9), ("y", 7)], "fp string, id long"
    ).write.mode("overwrite").parquet(inp)

    rows = []
    stream = spark.readStream.schema("fp string, id long").parquet(inp)
    out = stateful_exact_dedup_stream(stream, "fp", "id")
    q = (
        out.writeStream
        .foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(120)
    got = {r["fp"]: r for r in rows}
    assert got["x"]["n_dupes"] == 2 and got["x"]["first_id"] == 9
    assert got["y"]["n_dupes"] == 1 and got["y"]["first_id"] == 7


def test_decontaminate_stream_available_now(spark, tmp_path):
    """r6: stream-side decontamination — every arriving doc gets a
    decision row, verbatim leaks flagged, incremental restart only
    processes NEW files."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from schisma_spark.streaming import decontaminate_stream

    leak = ("the capital of france is paris and the answer to the "
            "benchmark question is forty two exactly as the key says")
    sch = T.StructType([T.StructField("doc_id", T.LongType()),
                        T.StructField("text", T.StringType())])
    inp, dec, ckpt = (str(tmp_path / p) for p in ("in", "dec", "ckpt"))
    rows = [Row(doc_id=i, text=leak if i % 5 == 0 else
                f"organic training document number {i} about spark "
                f"engines and shuffle behavior")
            for i in range(20)]
    spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(inp)
    eval_df = spark.createDataFrame([Row(text=leak)])

    q = decontaminate_stream(spark, inp, sch, eval_df, dec, ckpt,
                             min_overlap=2)
    q.awaitTermination(120)
    out = spark.read.parquet(dec)
    assert out.count() == 20
    flagged = {r["doc_id"] for r in out.where("contaminated").collect()}
    assert flagged == {0, 5, 10, 15}

    # new files only on restart: 10 more docs, one more leak
    more = [Row(doc_id=100 + i, text=leak if i == 3 else
                f"fresh document {i} with novel content entirely")
            for i in range(10)]
    spark.createDataFrame(more, sch).coalesce(1).write.mode(
        "append").parquet(inp)
    q2 = decontaminate_stream(spark, inp, sch, eval_df, dec, ckpt,
                              min_overlap=2)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(dec)
    assert out2.count() == 30                    # 20 old NOT reprocessed
    assert out2.where("contaminated").count() == 5


def test_incremental_dedup_stream_available_now(spark, tmp_path):
    """r6: the streaming ingest near-dup gate — arriving docs are
    checked against a static persisted corpus signature table; verbatim
    corpus copies are dropped with est_jac 1.0, fresh and NULL-text docs
    keep, one decision row per arriving doc, and a restart processes
    only NEW files."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from schisma_spark.functions.dedup import minhash_signatures_df
    from schisma_spark.streaming import incremental_dedup_stream

    known = ("the quick brown fox jumps over the lazy dog every single "
             "day in the training corpus")
    corpus = spark.createDataFrame(
        [Row(doc_id=500, text=known),
         Row(doc_id=501, text="a completely different corpus document "
                              "about columnar storage formats")],
        "doc_id long, text string")
    sigs = minhash_signatures_df(corpus, "text", "doc_id",
                                 hasher="portable", keep_empty=True)

    sch = T.StructType([T.StructField("doc_id", T.LongType()),
                        T.StructField("text", T.StringType())])
    inp, dec, ckpt = (str(tmp_path / p) for p in ("in", "dec", "ckpt"))
    rows = [Row(doc_id=i,
                text=known if i % 4 == 0 else
                None if i == 7 else
                f"organic fresh document number {i} about spark engines "
                f"and shuffle behavior") for i in range(12)]
    spark.createDataFrame(rows, sch).write.mode("overwrite").parquet(inp)

    q = incremental_dedup_stream(spark, inp, sch, sigs, dec, ckpt,
                                 hasher="portable", min_est_jac=0.5)
    q.awaitTermination(120)
    out = spark.read.parquet(dec)
    assert out.count() == 12
    dropped = {r["new_id"]: r for r in out.where("NOT keep").collect()}
    assert set(dropped) == {0, 4, 8}
    assert all(r["dup_of"] == 500 and r["est_jac"] == 1.0
               for r in dropped.values())
    assert out.where("new_id = 7 AND keep AND dup_of IS NULL").count() == 1

    # restart: only the new file is processed
    more = [Row(doc_id=100, text=known),
            Row(doc_id=101, text="novel content entirely new here today")]
    spark.createDataFrame(more, sch).coalesce(1).write.mode(
        "append").parquet(inp)
    q2 = incremental_dedup_stream(spark, inp, sch, sigs, dec, ckpt,
                                  hasher="portable", min_est_jac=0.5)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(dec)
    assert out2.count() == 14
    assert out2.where("NOT keep").count() == 4


def test_sessionize_stream(spark, tmp_path):
    from schisma_spark.streaming import sessionize_stream

    inp = str(tmp_path / "sess")
    rows = [
        # user 1: 3-event session, then a >30min gap, then 2 more
        (1, "2026-01-01 00:00:00", 1.0), (1, "2026-01-01 00:01:00", 2.0),
        (1, "2026-01-01 00:02:00", 3.0),
        (1, "2026-01-01 02:00:00", 4.0), (1, "2026-01-01 02:01:00", 5.0),
        # user 2: singleton
        (2, "2026-01-01 00:00:30", 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, v double") \
        .withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(inp)
    stream = spark.readStream.schema(df.schema).parquet(inp)
    sess = sessionize_stream(stream, "user_id", "ts",
                             gap="30 minutes", value_col="v")
    # complete mode for the memory sink (session windows reject update;
    # append would wait for the watermark a one-shot batch never passes)
    q = (
        sess.writeStream.format("memory").queryName("sess_out")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_sess")).start()
    )
    q.awaitTermination(120)
    out = {(r["user_id"], str(r["session_start"])): r
           for r in spark.sql("select * from sess_out").collect()}
    assert len(out) == 3
    s1 = out[(1, "2026-01-01 00:00:00")]
    assert s1["n_events"] == 3 and s1["sum_value"] == 6.0
    # window closes at last event + gap
    assert str(s1["session_end"]) == "2026-01-01 00:32:00"
    s2 = out[(1, "2026-01-01 02:00:00")]
    assert s2["n_events"] == 2 and s2["sum_value"] == 9.0
    assert out[(2, "2026-01-01 00:00:30")]["n_events"] == 1

    # batch twin (functions/temporal.py): same grouping, span relation
    # span_sec == (end - start) - gap
    from schisma_spark.functions import session_stats
    batch = {(r["user_id"], r["session_id"]): r
             for r in session_stats(df, "user_id", "ts", 1800.0).collect()}
    assert batch[(1, 1)]["n_events"] == 3
    assert batch[(1, 2)]["n_events"] == 2
    assert batch[(1, 1)]["span_sec"] == 120.0  # 00:00 -> 00:02
