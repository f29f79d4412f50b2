"""Per-column statistics in ONE hash aggregate (SURVEY.md §2.B E4).

Null fraction, min/max, count, distinct estimate, and (for string columns
checked against a numeric/bool/timestamp expectation) the try_cast type
conformance rate named in BASELINE.json:6. Catalyst turns the groupBy into
a two-phase partial+final hash aggregate automatically, so the map-side
combine that makes this scale to 10^12 rows is free. All N columns are
computed in the SAME pass — one scan, one shuffle of tiny partial states.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def column_stats(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    group_by: Sequence[str] | None = None,
    conformance: dict[str, T.DataType] | None = None,
) -> DataFrame:
    """Long-format per-column stats: one output row per (group, column).

    Output columns: ``group..., column, n_rows, n_null, null_frac,
    min_value, max_value, n_distinct, conform_frac`` (min/max stringified so
    heterogeneous columns stack; ``conform_frac`` is NULL unless the column
    appears in ``conformance``).
    """
    cols = list(cols or df.columns)
    group_by = list(group_by or [])
    conformance = conformance or {}
    dtypes = {f.name: f.dataType for f in df.schema.fields}

    per_col_structs = []
    for c in cols:
        col = F.col(c)
        dt = dtypes[c]
        orderable = not isinstance(dt, (T.MapType, T.ArrayType, T.StructType,
                                        T.BinaryType))
        mn = F.min(col).cast("string") if orderable else F.lit(None).cast("string")
        mx = F.max(col).cast("string") if orderable else F.lit(None).cast("string")
        if c in conformance:
            ok = col.try_cast(conformance[c]).isNotNull() | col.isNull()
            conform = (F.sum(ok.cast("long")) / F.count(F.lit(1))).cast("double")
        else:
            conform = F.lit(None).cast("double")
        per_col_structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(col.isNull().cast("long")).alias("n_null"),
                (F.sum(col.isNull().cast("long")) / F.count(F.lit(1)))
                .cast("double")
                .alias("null_frac"),
                mn.alias("min_value"),
                mx.alias("max_value"),
                F.approx_count_distinct(col).alias("n_distinct"),
                conform.alias("conform_frac"),
            ).alias(f"_s_{c}")
        )

    agg = (
        df.groupBy(*group_by).agg(*per_col_structs)
        if group_by
        else df.agg(*per_col_structs)
    )
    stacked = agg.select(
        *group_by,
        F.explode(F.array(*[F.col(f"_s_{c}") for c in cols])).alias("_s"),
    )
    return stacked.select(*group_by, "_s.*")
