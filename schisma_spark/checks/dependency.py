"""Functional-dependency check (engine operator, validation tier).

The reference validates one value at a time (schisma.mjs — no cross-row
semantics); an FD check is the table-level constraint a validation engine
needs on top: ``determinant -> dependent`` holds when every determinant
group carries exactly one distinct dependent tuple. The classic
data-quality rule (zip -> city, sku -> description) that per-row schema
validation cannot express.

Scale shape (10^12 rows): ONE hash aggregate on the determinant
(count_distinct partials combine map-side; dependent tuples travel as a
single struct) builds the per-group summary — no row data shuffles. The
violation-row emitter adds one equi-join of the corpus against the
VIOLATING determinant set only (AQE broadcasts it when FDs mostly hold,
the common case); clean groups never join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schisma_spark.compiler import viol
from schisma_spark.result import INVALID


def fd_groups(
    df: DataFrame,
    determinant: Sequence[str],
    dependent: Sequence[str],
) -> DataFrame:
    """Per-determinant-group FD summary: ``<determinant cols>, n_rows,
    n_values, violating`` where ``n_values`` counts DISTINCT dependent
    tuples (NULL-safe: a NULL dependent tuple counts as one value, so
    (NULL) vs ('x') IS a violation — count_distinct alone would skip
    NULLs and miss it)."""
    det = list(determinant)
    dep = list(dependent)
    # count_distinct skips NULL structs; count NULL presence separately
    # and add it back as one extra value
    dep_t = F.struct(*[F.col(c) for c in dep])
    all_null = F.lit(True)
    for c in dep:
        all_null = all_null & F.col(c).isNull()
    n_vals = (
        F.count_distinct(F.when(~all_null, dep_t))
        + F.max(F.when(all_null, F.lit(1)).otherwise(F.lit(0)))
    ).cast("long")
    return (
        df.groupBy(*det)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            n_vals.alias("n_values"),
        )
        .select(*det, "n_rows", "n_values",
                (F.col("n_values") > 1).alias("violating"))
    )


def fd_violations(
    df: DataFrame,
    determinant: Sequence[str],
    dependent: Sequence[str],
    keys: Sequence[str] | None = None,
) -> DataFrame:
    """Violation rows (schisma code ``'invalid'``) for every row whose
    determinant group breaks the FD. ``where`` is the dependent path,
    ``received`` the row's dependent tuple, ``expected`` names the FD."""
    det = list(determinant)
    dep = list(dependent)
    keys = list(keys or det)
    bad = (
        fd_groups(df, det, dep)
        .where(F.col("violating"))
        .select(*[F.col(c).alias(f"_bad_{c}") for c in det])
    )
    # NULL-safe equi-join: a NULL determinant group (zip=NULL with two
    # cities) is exactly the dirty data this check exists for — a plain
    # `on=det` join would silently drop it (NULL != NULL)
    cond = F.lit(True)
    for c in det:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_bad_{c}"))
    where = ".".join(dep)
    fd_name = f"{', '.join(det)} -> {', '.join(dep)}"
    return (
        df.join(bad, on=cond)
        .select(
            *keys,
            viol(
                INVALID,
                where=F.lit(where),
                expected=f"functional dependency {fd_name}",
                received=F.concat_ws(
                    "|", *[F.col(c).cast("string") for c in dep]),
                message=F.lit("functional dependency violated"),
            ).alias("_v"),
        )
        .select(*keys, "_v.*")
    )
