"""Bounded violation sampling (SURVEY.md §2.B E11).

At 10^12 rows a violation sink can itself be petabytes; keep at most k
samples per (partition, code) with a rank window. ``row_number`` over a
partitioned window shuffles only the violation rows (already a tiny
fraction), never the input table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_violations(
    violations: DataFrame,
    k: int,
    part_cols: Sequence[str] = ("code",),
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    part_cols = list(part_cols)
    order_by = list(order_by or [c for c in violations.columns if c not in part_cols][:1])
    w = Window.partitionBy(*part_cols).orderBy(*order_by)
    return (
        violations.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
