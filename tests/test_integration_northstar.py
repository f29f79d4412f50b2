"""Grand tour: the full north-star pipeline in one test
(BASELINE.json:6,14,15) — synthesize image+caption table with planted
violations, run row checks + uniqueness + referential + drift vs a stored
baseline + Arrow decode/PSNR + caption equality, emit verdicts/violations
through the resumable runner with sinks, interrupt and resume, and check
every planted violation class is caught and the clean partition stays
clean."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schisma_spark.checks.baseline import BaselineSpec, compare_to_baseline, save_baseline
from schisma_spark.image.decode import caption_violations, decode_validate
from schisma_spark.image.fixtures import (
    dim_fmt,
    images_ref,
    images_schema_dsl,
    images_table,
)
from schisma_spark.manifest import Manifest
from schisma_spark.runner import RunConfig, ValidationRun


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("northstar")
    imgs = images_table(spark, 1500, seed=42).cache()
    ref = images_ref(spark, 1500, seed=42).cache()
    return root, imgs, ref


def test_full_pipeline(spark, world):
    root, imgs, ref = world
    run = ValidationRun(images_schema_dsl(), RunConfig(sample_k=100))
    dims = {("fmt",): (dim_fmt(spark), ("fmt",))}

    # -- interrupted run then resume (E12) --------------------------------
    written = []
    res1 = run.run_resumable(
        imgs, str(root / "manifest"), dims=dims, batch_partitions=6,
        sinks=lambda v, g: written.append((v.count(), g.count())),
    )
    assert len(res1.manifest_records) == 6 and written[0][1] == 6
    res2 = run.run_resumable(
        imgs, str(root / "manifest"), dims=dims,
        sinks=lambda v, g: written.append((v.count(), g.count())),
    )
    assert len(res2.manifest_records) == 10
    m = Manifest(str(root / "manifest"))
    assert len(m.done_partitions()) == 16
    assert m.metrics()["n_rows"] == 1500

    # -- violation classes all caught -------------------------------------
    viols = run.violations(imgs, dims=dims)
    codes = {(r["code"], r["where"]) for r in viols.collect()}
    assert ("missing key", "image_id") in codes          # nulls
    assert ("invalid", "w") in codes                     # range check
    assert ("invalid", "fmt") in codes                   # domain check
    assert any(c == "no match" and w == "fmt" for c, w in codes)  # referential
    # duplicated ids surface as uniqueness violations on image_id
    assert any(c == "invalid" and w == "image_id" for c, w in codes)
    # ... and the hot phash as uniqueness violations on phash
    assert any(c == "invalid" and w == "phash" for c, w in codes)

    # clean partition 3 has no row-level violations
    verd = {r["part"]: r["verdict"] for r in run.verdicts(imgs).collect()}
    assert verd[3] == "pass" and verd[7] == "fail"

    # -- payload path (E8): decode + PSNR + caption equality --------------
    checked = decode_validate(imgs)
    agg = checked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((~F.col("decode_ok")).cast("long")).alias("bad_decode"),
        F.sum((F.col("decode_ok") & ~F.col("pixels_ok")).cast("long")).alias("bad_px"),
    ).collect()[0]
    assert agg["n"] == 1500 and agg["bad_decode"] > 0 and agg["bad_px"] > 0
    cap = caption_violations(imgs, ref)
    assert cap.count() > 0
    assert cap.where(F.col("part") == 3).count() == 0

    # -- drift vs stored baseline (E7/A4) ----------------------------------
    spec = BaselineSpec(columns={"w": (0.0, 64.0, 16)}, group_by=("part",))
    save_baseline(ref, spec, str(root / "baseline"))
    shifted = imgs.withColumn(
        "w", F.when(F.col("part") == 5, F.col("w") + 24).otherwise(F.col("w"))
    )
    drift = compare_to_baseline(shifted, str(root / "baseline"), threshold=0.3)
    failed = {r["part"] for r in drift.collect() if r["verdict"] == "fail"}
    assert 5 in failed
