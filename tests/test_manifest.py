"""Checkpoint/resume (FIXTURES.md C; BASELINE.json:14): kill after k
partitions, rerun, assert only the rest execute and final metrics equal an
uninterrupted run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schisma_spark.image.fixtures import images_schema_dsl, images_table
from schisma_spark.manifest import Manifest, run_resumable
from schisma_spark.runner import RunConfig, ValidationRun


@pytest.fixture()
def imgs(spark):
    return images_table(spark, 600, seed=42).cache()


def test_resume_skips_done_partitions(spark, imgs, tmp_path):
    run = ValidationRun(images_schema_dsl(), RunConfig())
    mpath = str(tmp_path / "manifest")

    # interrupted run: only 7 of 16 partitions complete
    r1 = run.run_resumable(imgs, mpath, batch_partitions=7)
    assert len(r1.manifest_records) == 7
    m = Manifest(mpath)
    assert len(m.done_partitions()) == 7

    # resumed run: exactly the remaining 9, no re-execution of done ones
    r2 = run.run_resumable(imgs, mpath)
    assert len(r2.manifest_records) == 9
    done_after = m.done_partitions()
    assert len(done_after) == 16
    parts_r2 = {r["partition"] for r in r2.manifest_records}
    parts_r1 = {r["partition"] for r in r1.manifest_records}
    assert not (parts_r1 & parts_r2)

    # metrics identical to an uninterrupted run
    clean_manifest = Manifest(str(tmp_path / "manifest2"))
    run_resumable(imgs, "part", lambda s: run.verdicts(s), clean_manifest)
    assert m.metrics() == clean_manifest.metrics()

    # third invocation: nothing left to do
    r3 = run.run_resumable(imgs, mpath)
    assert r3.manifest_records == []


def test_manifest_atomic_append(tmp_path):
    m = Manifest(str(tmp_path / "m"))
    m.append([{"partition": "0", "status": "done", "n_rows": 10,
               "n_violations": 0, "n_bad_rows": 0, "verdict": "pass"}])
    m.append([{"partition": "1", "status": "done", "n_rows": 5,
               "n_violations": 2, "n_bad_rows": 1, "verdict": "fail"}])
    assert m.done_partitions() == {"0", "1"}
    assert m.metrics()["n_rows"] == 15
    assert m.metrics()["n_violations"] == 2


def test_lineage_recorded(spark, imgs, tmp_path):
    run = ValidationRun(images_schema_dsl(), RunConfig())
    mpath = str(tmp_path / "m")
    run.run_resumable(imgs, mpath, lineage={"input": "synthetic://images",
                                            "seed": 42})
    recs = Manifest(mpath).records()
    assert all(r["lineage"]["seed"] == 42 for r in recs)
    assert all("finished_at" in r for r in recs)


def test_plan_remaining_partition_cap(spark, tmp_path):
    """Driver-bound contract (r1 VERDICT #9): an adversarially fine
    partition column fails loudly instead of collecting unbounded rows."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from schisma_spark.manifest import Manifest, plan_remaining

    df = spark.range(500).select(F.col("id").alias("part"),
                                 F.lit(1.0).alias("v"))
    m = Manifest(str(tmp_path / "m"))
    with _pytest.raises(ValueError, match="distinct values"):
        plan_remaining(df, "part", m, max_partitions=100)
    # at or below the cap it plans normally
    sub, remaining = plan_remaining(df, "part", m, max_partitions=500)
    assert len(remaining) == 500 and sub is not None
