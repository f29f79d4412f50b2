"""Schema INFERENCE: DataFrame -> schisma DSL schema (the profiler dual).

The reference goes one way only — schema to data (``create``,
schisma.mjs:560-640) and schema against data (``validate``); inference is
the engine extension every validation deployment starts with: profile an
existing table once, pin the result as the contract, and validate every
later ingest against it (the Great-Expectations "profiler" workflow).

Guarantee (tested): ``schema(infer_schema(df)).validate(df)`` has ZERO
violations on the profiled data itself — the inferred contract is the
tightest one this DSL can state that the data already satisfies.

Scale notes:

- inference is driver-side over ``df.schema`` plus (optionally) ONE
  aggregate pass for observed-null tightening — a single map-side-partial
  count per column, no shuffle wider than one row;
- the null scan NEVER touches binary columns: an ``isNull`` on a binary
  column forces the scan to read the payload (the 90x stats-path
  slowdown CLAUDE.md records) — binary columns are assumed nullable
  instead, which only loosens the contract;
- nested struct/array interiors are assumed nullable (tightening them
  would need per-field scans); top-level columns are tightened from the
  observed pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark.dsl import Field, Null


def _leaf(dt: T.DataType):
    """Spark atomic type -> DSL literal. Exact-atom types map to the bare
    Python type (strict typeof equality); narrower/variant numerics and
    NTZ timestamps map to ``castable=True`` fields (try_cast conformance
    — the value set is representable, the physical type differs)."""
    if isinstance(dt, T.DoubleType):
        return float
    if isinstance(dt, T.LongType):
        return int
    if isinstance(dt, T.StringType):
        return str
    if isinstance(dt, T.BooleanType):
        return bool
    if isinstance(dt, T.BinaryType):
        return bytes
    if isinstance(dt, T.TimestampType):
        return T.TimestampType()
    if isinstance(dt, T.DateType):
        return T.DateType()
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return Field(type=int, castable=True)
    if isinstance(dt, (T.FloatType, T.DecimalType)):
        return Field(type=float, castable=True)
    if isinstance(dt, T.TimestampNTZType):
        return Field(type=T.TimestampType(), castable=True)
    raise TypeError(f"cannot infer a schema leaf for Spark type {dt!r}")


def _literal_for(dt: T.DataType, nullable: bool, strict: bool = False):
    """``strict`` (nulls='never') forces bare types at EVERY depth —
    nested interiors included, not just top-level columns."""
    if strict:
        nullable = False
    if isinstance(dt, T.StructType):
        lit = {f.name: _literal_for(f.dataType, f.nullable, strict)
               for f in dt}
    elif isinstance(dt, T.ArrayType):
        lit = [_literal_for(dt.elementType, dt.containsNull, strict)]
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError(
                f"cannot infer map with non-string keys: {dt!r}")
        lit = {"$/.*": [_literal_for(dt.valueType, dt.valueContainsNull,
                                     strict)]}
    else:
        lit = _leaf(dt)
    return Field(typeof=[lit, Null]) if nullable else lit


def infer_schema(
    df: DataFrame,
    nulls: str = "observed",
) -> dict:
    """Infer a schisma DSL schema literal (pass it to ``schema(...)``)
    from a DataFrame.

    ``nulls``:

    - ``'observed'`` (default): run one aggregate pass; top-level
      columns with zero observed NULLs get the bare type (strict — a
      later NULL is a violation), columns with NULLs (and all binary
      columns, never scanned) get ``[type, Null]`` unions.
    - ``'metadata'``: trust ``df.schema`` nullability flags, no job.
    - ``'never'``: bare types everywhere (strictest; validation flags
      any NULL).
    """
    if nulls not in ("observed", "metadata", "never"):
        raise ValueError(f"nulls must be observed|metadata|never: {nulls}")

    if nulls == "observed":
        scannable = [f.name for f in df.schema
                     if not isinstance(f.dataType, T.BinaryType)]
        if scannable:
            # backtick-quoted resolution: a raw name containing dots
            # would resolve as a nested-field path (review finding)
            def _c(name):
                return F.col("`" + name.replace("`", "``") + "`")
            counts = df.agg(*[
                F.sum(_c(c).isNull().cast("long")).alias(c)
                for c in scannable
            ]).first()
            # empty df -> sum() is NULL -> treat as zero observed nulls
            has_null = {c: bool(counts[c]) for c in scannable}
        else:
            has_null = {}
        nullable = {
            f.name: has_null.get(f.name, True) for f in df.schema
        }
    elif nulls == "metadata":
        nullable = {f.name: f.nullable for f in df.schema}
    else:
        nullable = {f.name: False for f in df.schema}

    strict = nulls == "never"
    return {
        f.name: _literal_for(f.dataType, nullable[f.name], strict)
        for f in df.schema
    }
