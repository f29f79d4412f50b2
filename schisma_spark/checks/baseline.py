"""Drift-baseline snapshots (FIXTURES.md A4): persist per-column histogram
state from a clean run, reload it later for KS comparison.

A baseline is a directory:
  hist/<column>/    — (group..., bin, cnt) fixed-bin parquet per column
  sketch/<column>/  — (group..., sketch) KLL parquet per sketch column (r2)
  meta.json         — per-column (lo, hi, nbins) + sketch_columns +
                      group_by, so compare() re-bins identically

Counts are mergeable-by-addition and KLL sketches merge via
``kll_merge_agg_double``, so incremental refreshes never re-read old data.
Sketch columns need NO bin config up front — the right choice when a
column's range is unknown at baseline time (histograms need lo/hi).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schisma_spark.checks.drift import drift_verdicts, fixed_histogram


@dataclass
class BaselineSpec:
    """Per-column binning config (lo, hi, nbins) for histogram columns;
    ``sketch_columns`` take a KLL sketch instead (no range config)."""

    columns: dict[str, tuple[float, float, int]]
    group_by: tuple[str, ...] = ()
    sketch_columns: tuple[str, ...] = ()


def save_baseline(df: DataFrame, spec: BaselineSpec, path: str) -> None:
    from schisma_spark.checks.sketch import kll_sketch

    os.makedirs(path, exist_ok=True)
    for col, (lo, hi, nbins) in spec.columns.items():
        h = fixed_histogram(df, col, lo, hi, nbins,
                            group_by=list(spec.group_by))
        h.write.mode("overwrite").parquet(os.path.join(path, "hist", col))
    for col in spec.sketch_columns:
        sk = kll_sketch(df, col, group_by=list(spec.group_by))
        sk.write.mode("overwrite").parquet(os.path.join(path, "sketch", col))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "columns": {k: list(v) for k, v in spec.columns.items()},
                "group_by": list(spec.group_by),
                "sketch_columns": list(spec.sketch_columns),
            },
            f,
        )


def load_spec(path: str) -> BaselineSpec:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return BaselineSpec(
        columns={k: tuple(v) for k, v in meta["columns"].items()},
        group_by=tuple(meta["group_by"]),
        sketch_columns=tuple(meta.get("sketch_columns", ())),
    )


def compare_to_baseline(
    df: DataFrame,
    path: str,
    threshold: float = 0.2,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Per-(column, group) KS verdicts of ``df`` against the stored
    baseline: ``column, group..., ks, verdict``."""
    spark: SparkSession = df.sparkSession
    spec = load_spec(path)
    from schisma_spark.checks.sketch import kll_sketch, ks_from_sketches

    outs = []
    for col, (lo, hi, nbins) in spec.columns.items():
        if columns is not None and col not in columns:
            continue
        base = spark.read.parquet(os.path.join(path, "hist", col))
        cur = fixed_histogram(df, col, lo, hi, nbins,
                              group_by=list(spec.group_by))
        v = drift_verdicts(cur, base, threshold,
                           group_by=list(spec.group_by))
        outs.append(v.select(F.lit(col).alias("column"), "*"))
    for col in spec.sketch_columns:
        if columns is not None and col not in columns:
            continue
        base = spark.read.parquet(os.path.join(path, "sketch", col))
        cur = kll_sketch(df, col, group_by=list(spec.group_by))
        ks = ks_from_sketches(cur, base, group_by=list(spec.group_by))
        v = ks.withColumn(
            "verdict",
            F.when(F.col("ks") <= threshold, F.lit("pass"))
            .otherwise(F.lit("fail")),
        )
        outs.append(v.select(F.lit(col).alias("column"), "*"))
    if not outs:
        raise ValueError(
            f"no baseline columns to compare: requested {list(columns or [])},"
            f" baseline has {list(spec.columns)}"
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
