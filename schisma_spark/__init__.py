"""schisma_spark — a PySpark-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the validate / conform / create
semantics of the reference ``kettek/schisma`` (/root/reference,
``src/schisma.mjs``), re-expressed as Catalyst column expressions over
DataFrames: a declarative schema DSL compiles to (StructType, constraint
Columns); validation is one fused projection + one aggregation; conform is
one repair projection; aggregate checks (column stats, salted uniqueness,
referential joins, distribution drift) run as built-in hash aggregates and
broadcast/shuffle joins.

Public surface::

    from schisma_spark import schema, Field, Null
    sch = schema({"w": int, "fmt": Field(type=str, default="raw")})
    result = sch.validate(df)          # -> ValidationResult
    fixed  = sch.conform(df)           # -> DataFrame
    row    = sch.create()              # -> dict (driver-side defaults)
"""

from schisma_spark.dsl import Field, Null, Schema, schema
from schisma_spark.infer import infer_schema
from schisma_spark.result import (
    EXACT_MATCH,
    INVALID,
    MISSING_KEY,
    NO_MATCH,
    PARTIAL_MATCH,
    PROBLEM_CODES,
    UNEXPECTED_KEY,
    UNHANDLED,
    VALID,
    VIOLATION_SCHEMA,
)

__all__ = [
    "schema",
    "infer_schema",
    "Schema",
    "Field",
    "Null",
    "VIOLATION_SCHEMA",
    "PROBLEM_CODES",
    "UNHANDLED",
    "PARTIAL_MATCH",
    "EXACT_MATCH",
    "NO_MATCH",
    "UNEXPECTED_KEY",
    "MISSING_KEY",
    "INVALID",
    "VALID",
]

__version__ = "0.1.0"
