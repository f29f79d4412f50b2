"""Drift-baseline snapshots (FIXTURES.md A4): persist per-column histogram
state from a clean run, reload it later for KS comparison.

A baseline is a directory:
  hist/<column>/  — (group..., bin, cnt) fixed-bin parquet per column
  meta.json       — per-column (lo, hi, nbins) + group_by, so compare()
                    re-bins the current data identically

Counts are mergeable-by-addition, so incremental refreshes are a
unionByName + re-aggregate away.
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
    """Per-column binning config: (lo, hi, nbins)."""

    columns: dict[str, tuple[float, float, int]]
    group_by: tuple[str, ...] = ()


def save_baseline(df: DataFrame, spec: BaselineSpec, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    for col, (lo, hi, nbins) in spec.columns.items():
        h = fixed_histogram(df, col, lo, hi, nbins,
                            group_by=list(spec.group_by))
        h.write.mode("overwrite").parquet(os.path.join(path, "hist", col))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "columns": {k: list(v) for k, v in spec.columns.items()},
                "group_by": list(spec.group_by),
            },
            f,
        )


def load_spec(path: str) -> BaselineSpec:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return BaselineSpec(
        columns={k: tuple(v) for k, v in meta["columns"].items()},
        group_by=tuple(meta["group_by"]),
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
    if not outs:
        raise ValueError(
            f"no baseline columns to compare: requested {list(columns or [])},"
            f" baseline has {list(spec.columns)}"
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
