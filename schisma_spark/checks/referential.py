"""Referential-integrity checks via anti-joins (SURVEY.md §2.B E6).

BASELINE.json:6: "referential checks via broadcast/shuffle hash join
against dimension tables". Small dims get an explicit ``broadcast()`` so
the check is shuffle-free on the fact side; large dims take a shuffle-hash
hint plus AQE skew-join splitting (enabled in the runner session config),
which is Spark's native answer to hot foreign keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schisma_spark.compiler import viol
from schisma_spark.result import NO_MATCH


def fk_violations(
    fact: DataFrame,
    dim: DataFrame,
    fk_cols: Sequence[str],
    pk_cols: Sequence[str] | None = None,
    keys: Sequence[str] | None = None,
    strategy: str = "broadcast",  # broadcast | shuffle_hash | auto
    null_ok: bool = True,
) -> DataFrame:
    """Violation rows for fact rows whose FK has no match in ``dim``.

    ``strategy='broadcast'`` wraps the dim side in ``F.broadcast`` (correct
    default for dimension tables); ``'shuffle_hash'`` adds the join hint for
    dims too big to broadcast; ``'auto'`` lets AQE decide.
    """
    fk_cols = list(fk_cols)
    pk_cols = list(pk_cols or fk_cols)
    keys = list(keys or fk_cols)
    dim_keys = dim.select(*[F.col(p).alias(f) for p, f in zip(pk_cols, fk_cols)]).distinct()
    if strategy == "broadcast":
        dim_keys = F.broadcast(dim_keys)
    elif strategy == "shuffle_hash":
        dim_keys = dim_keys.hint("shuffle_hash")
    probe = fact
    if null_ok:
        cond = F.lit(False)
        for f in fk_cols:
            cond = cond | F.col(f).isNull()
        probe = fact.where(~cond)
    missing = probe.join(dim_keys, on=fk_cols, how="left_anti")
    where = ".".join(fk_cols)
    return missing.select(
        *keys,
        viol(
            NO_MATCH,
            where=F.lit(where),
            expected=f"fk into dim({', '.join(pk_cols)})",
            received=F.concat_ws("|", *[F.col(f).cast("string") for f in fk_cols]),
            message=F.lit("dangling foreign key"),
        ).alias("_v"),
    ).select(*keys, "_v.*")
