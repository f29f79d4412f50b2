"""Per-key sequence checks (engine operators, validation tier).

Row-order constraints a per-value validator (schisma.mjs validates one
value at a time) cannot express: dense-sequence gaps (missing line
numbers, dropped segment files) and per-key monotonicity (out-of-order
event timestamps — the signal that decides watermark tuning upstream).

Scale shape (10^12 rows): both are ONE shuffle on the key + an
in-partition sort — the same cost envelope as the sessionizer
(functions/temporal.py); only (key, seq) / (key, order, value) columns
travel, never payloads. A key's history lands in one task, so the
assumption is bounded rows-per-key (true for per-order line numbers and
per-user events; pre-split pathological keys by range and stitch at the
boundary).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from schisma_spark.compiler import viol
from schisma_spark.result import INVALID


def sequence_gaps(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    start: int | None = None,
) -> DataFrame:
    """One row per maximal run of MISSING integers in a per-key sequence:
    ``<key cols>, gap_start, gap_end, gap_len``. Duplicate sequence
    values never open a gap (diff 0). With ``start`` given, a key whose
    minimum exceeds it reports the leading gap ``[start, min-1]`` too;
    NULL sequence values are ignored (they order first and carry no
    integer position)."""
    key = list(key_cols)
    s = F.col(seq_col).cast("long")
    # order by the LONG-cast value (r7, ADVICE): a string-typed sequence
    # column would sort lexicographically ('10' < '9') and produce wrong
    # or missing gaps; integral columns order identically either way
    w = Window.partitionBy(*key).orderBy(s)
    prev = F.lag(s).over(w)
    base = df.where(F.col(seq_col).isNotNull())
    if start is not None:
        lo = F.when(prev.isNull(), F.lit(int(start))).otherwise(prev + 1)
    else:
        lo = prev + 1
    return (
        base.select(*key, lo.alias("gap_start"),
                    (s - 1).alias("gap_end"))
        .where(F.col("gap_start").isNotNull()
               & (F.col("gap_start") <= F.col("gap_end")))
        .select(*key, "gap_start", "gap_end",
                (F.col("gap_end") - F.col("gap_start") + 1)
                .alias("gap_len"))
    )


def monotonic_violations(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    strict: bool = False,
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Violation rows (schisma code ``'invalid'``) for rows whose
    ``value_col`` moves backwards (or fails to strictly increase, with
    ``strict=True``) relative to the previous row of the same key in
    ``order_cols`` order — out-of-order event detection. ``order_cols``
    must be unique per key for a deterministic verdict (pass the event
    id as the last tiebreak). NULL values never violate and never become
    the carried previous value."""
    key = list(key_cols)
    order = list(order_cols)
    keys = list(keys or (key + order))
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col(value_col)
    prev = F.last(value_col, ignorenulls=True).over(w)
    return (
        df.withColumn("_prev", prev)
        .where(v.isNotNull() & F.col("_prev").isNotNull()
               & ((v < F.col("_prev")) if not strict
                  else (v <= F.col("_prev"))))
        .select(
            *keys,
            viol(
                INVALID,
                where=F.lit(value_col),
                expected=("strictly increasing per "
                          if strict else "non-decreasing per ")
                + ", ".join(key),
                received=v.cast("string"),
                value=F.col("_prev").cast("string"),
                message=F.lit("monotonicity violated"),
            ).alias("_v"),
        )
        .select(*keys, "_v.*")
    )
