"""JSON-string validation: the reference's per-object semantics over truly
semi-structured data.

A DataFrame column's key set is static, so most of the reference's runtime
checks fold into compile time (compiler.py). A JSON **string** column is
the one place rows genuinely carry different key sets — here the full
runtime semantics apply per row:

- malformed JSON -> INVALID
- unexpected keys (schisma.mjs:300-305) via parsed map keys, with regex
  matchers (schisma.mjs:256-295) honored at run time
- missing required keys (schisma.mjs:306-310)
- type checks on values via try_cast conformance (values arrive as JSON
  scalars rendered to strings; a JSON string cannot carry host types)

Implementation: ``from_json`` to ``map<string,string>`` + the engine's
MapType object check with children forced to ``castable`` semantics. One
projection, JVM-side; no Python.
"""

from __future__ import annotations

import copy

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark.compiler import Opts, _check_map, empty_varr, viol
from schisma_spark.dsl import AtomAlt, Node, ObjectAlt, Schema
from schisma_spark.result import INVALID, VIOLATION_FIELDS
from schisma_spark.validate import ValidationResult


def _force_castable(node: Node) -> Node:
    n = copy.copy(node)
    n.castable = True
    n.alts = [
        _force_castable(a) if isinstance(a, Node) else a for a in node.alts
    ]
    return n


def json_checks(col: Column, sch: Schema, opts: Opts) -> Column:
    """array<violation> for one JSON string column."""
    alt = sch.root.alts[0]
    if not isinstance(alt, ObjectAlt):
        raise TypeError("json schema root must be an object")
    alt = ObjectAlt(
        fields={k: _force_castable(v) for k, v in alt.fields.items()},
        regex=[(p, [_force_castable(n) for n in alts_]) for p, alts_ in alt.regex],
    )
    m = F.from_json(col, T.MapType(T.StringType(), T.StringType()))
    res = _check_map(alt, None, m, T.MapType(T.StringType(), T.StringType()),
                     F.lit(None).cast("string"), opts)
    malformed = F.array(
        viol(INVALID, where=None, expected="json object",
             received=F.substring(col, 1, 64), message="malformed json")
    )
    return (
        F.when(col.isNull(), empty_varr())  # null column = absent payload;
                                            # required-ness is the caller's
                                            # row-schema concern
        .when(m.isNull(), malformed)
        .otherwise(res.viols)
    )


def validate_json(
    df: DataFrame,
    json_col: str,
    sch: Schema,
    keys: list[str] | None = None,
    ignore_unexpected: bool = False,
    ignore_required: bool = False,
) -> ValidationResult:
    opts = Opts(ignore_unexpected=ignore_unexpected,
                ignore_required=ignore_required)
    keys = list(keys or [])
    viols = json_checks(F.col(json_col), sch, opts)
    return ValidationResult(df=df, keys=keys, viols_col=viols)
