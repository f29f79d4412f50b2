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


def _json_scalar(c: Column) -> Column:
    """JSON text of one typed value, with correct quoting/escaping, via
    ``to_json(array(v))`` minus the brackets."""
    s = F.to_json(F.array(c))
    return s.substr(F.lit(2), F.length(s) - F.lit(2))


def conform_json(
    df: DataFrame,
    json_col: str,
    sch: Schema,
    remove_unexpected: bool = True,
    insert_missing: bool = True,
) -> DataFrame:
    """Repair a JSON string column in place: parse -> drop unexpected keys
    (regex-matched keys kept, original value types preserved via VariantType),
    insert required-key defaults, coerce fixed-key value types -> re-serialize
    TYPED: numbers/booleans come back unquoted JSON values, exactly like the
    malformed->``create()`` path (and like the reference, whose conform yields
    real JS numbers — schisma.mjs:579-607). Output key order is deterministic:
    fixed keys in schema order, then kept dynamic keys in input order.
    The output column keeps its name AND position; malformed JSON is replaced
    by the schema's create() JSON. One projection, JVM-side."""
    import json as _json

    from schisma_spark import typeatoms as ta
    from schisma_spark.create import create_value
    from schisma_spark.dsl import AtomAlt, _UNSET

    alt = sch.root.alts[0]
    if not isinstance(alt, ObjectAlt):
        raise TypeError("json schema root must be an object")
    col = F.col(json_col)
    # ONE parse: the variant map carries both the type-preserved values and
    # (via a '$'-string extraction per fixed key) the stringly view the
    # coercion table needs — an earlier version parsed the column twice
    # (map<string,string> + map<string,variant>)
    mv = F.from_json(col, "map<string,variant>")

    frags: list[Column] = []
    for k, child in alt.fields.items():
        cur = F.try_variant_get(F.element_at(mv, F.lit(k)), "$", "string")
        key_lit = _json.dumps(k) + ":"
        atoms = [a.atom for a in child.alts
                 if isinstance(a, AtomAlt) and a.atom is not ta.NULL]
        dflt = create_value(child, _UNSET)
        dflt_frag = (
            F.lit(key_lit + _json.dumps(dflt, separators=(",", ":")))
            if (child.required and insert_missing) else F.lit(None).cast("string")
        )
        if atoms:
            # try every atom alternative in order (union fields keep values
            # any alternative accepts), rendering TYPED; none accepts ->
            # default (Number('abc') -> NaN -> default, schisma.mjs:579-584)
            cands = []
            for a in atoms:
                if a is ta.STRING:
                    cands.append(F.concat(F.lit(key_lit), _json_scalar(cur)))
                else:
                    cv = cur.try_cast(a.spark_type)
                    cands.append(F.when(cv.isNotNull(),
                                        F.concat(F.lit(key_lit),
                                                 _json_scalar(cv))))
            present = F.coalesce(
                *cands,
                F.lit(key_lit + _json.dumps(dflt, separators=(",", ":")))
                if dflt is not None else F.lit(None).cast("string"),
            )
            frags.append(F.when(cur.isNotNull(), present).otherwise(dflt_frag))
        else:
            # object/array/composite child: embed the original value's JSON
            # untouched (variant round-trip; fixes the old re-quote of
            # nested objects through map<string,string>). Presence gates on
            # the filtered-map rendering, NOT on `cur` — the '$'-string
            # extraction of an object/array variant is NULL even when the
            # key is present
            one = F.to_json(F.map_filter(mv, lambda k2, _v: k2 == F.lit(k)))
            frags.append(F.when(
                F.length(one) > 2,
                one.substr(F.lit(2), F.length(one) - F.lit(2)),
            ).otherwise(dflt_frag))

    # dynamic keys: keep regex-matched (or everything when
    # remove_unexpected=False), values type-preserved through variant
    fixed_keys = list(alt.fields)
    pats = [p for p, _ in alt.regex]

    def _dyn_keep(k2: Column, _v: Column) -> Column:
        cond = ~k2.isin(*fixed_keys) if fixed_keys else F.lit(True)
        if remove_unexpected:
            pat_ok = F.lit(False)
            for p in pats:
                pat_ok = pat_ok | k2.rlike(p)
            cond = cond & pat_ok
        return cond

    dyn = F.to_json(F.map_filter(mv, _dyn_keep))
    frags.append(F.when(F.length(dyn) > 2,
                        dyn.substr(F.lit(2), F.length(dyn) - F.lit(2))))

    body = F.array_join(
        F.filter(F.array(*frags), lambda x: x.isNotNull()), ","
    )
    default_json = _json.dumps(
        {k: create_value(v, _UNSET) for k, v in alt.fields.items()
         if v.required},
        separators=(",", ":"),
    )
    out = (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(mv.isNull(), F.lit(default_json))  # malformed -> create()
        .otherwise(F.concat(F.lit("{"), body, F.lit("}")))
        .alias(json_col)
    )
    return df.select(
        *[out if c == json_col else F.col(c) for c in df.columns]
    )
