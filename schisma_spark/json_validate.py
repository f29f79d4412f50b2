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


def conform_json(
    df: DataFrame,
    json_col: str,
    sch: Schema,
    remove_unexpected: bool = True,
    insert_missing: bool = True,
) -> DataFrame:
    """Repair a JSON string column in place: parse -> drop unexpected keys
    (regex-matched keys kept), insert required-key defaults, coerce value
    types per the JS table -> re-serialize. The output column keeps its
    name AND position; malformed JSON is replaced by the schema's create()
    JSON. One projection, JVM-side (`from_json`/`map_*`/`to_json`)."""
    import json as _json

    from schisma_spark import typeatoms as ta
    from schisma_spark.conform import Conformer
    from schisma_spark.create import create_value, js_string
    from schisma_spark.dsl import AtomAlt, _UNSET

    alt = sch.root.alts[0]
    if not isinstance(alt, ObjectAlt):
        raise TypeError("json schema root must be an object")
    col = F.col(json_col)
    m = F.from_json(col, T.MapType(T.StringType(), T.StringType()))
    conf = Conformer(remove_unexpected, insert_missing, False, False, False)
    forced = ObjectAlt(
        fields={k: _force_castable(v) for k, v in alt.fields.items()},
        regex=alt.regex,
    )
    repaired, _ = conf._within_map(forced, m, T.MapType(T.StringType(),
                                                        T.StringType()))
    # value coercion for fixed keys: try every atom ALTERNATIVE in order
    # (union fields keep values any alternative accepts) before defaulting
    entries = repaired
    for k, child in forced.fields.items():
        atoms = [a.atom for a in child.alts
                 if isinstance(a, AtomAlt) and a.atom is not ta.NULL]
        if not atoms or all(a is ta.STRING for a in atoms):
            continue
        dflt = create_value(child, _UNSET)
        cur = F.element_at(entries, F.lit(k))
        candidates = [
            cur.try_cast(a.spark_type).cast("string")
            if a is not ta.STRING else cur
            for a in atoms
        ]
        fixed_val = F.coalesce(
            *candidates,
            F.lit(None if dflt is None else js_string(dflt)),
        )
        cleaned = F.map_filter(entries, lambda k2, _v: k2 != F.lit(k))
        entries = F.when(
            cur.isNotNull(),
            F.map_concat(cleaned, F.create_map(F.lit(k), fixed_val)),
        ).otherwise(entries)
    default_json = _json.dumps(
        {k: create_value(v, _UNSET) for k, v in alt.fields.items()
         if v.required},
        separators=(",", ":"),
    )
    out = (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(m.isNull(), F.lit(default_json))  # malformed -> create()
        .otherwise(F.to_json(entries))
        .alias(json_col)
    )
    return df.select(
        *[out if c == json_col else F.col(c) for c in df.columns]
    )
