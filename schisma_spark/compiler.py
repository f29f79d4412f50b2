"""Check compiler: schema nodes -> fused Catalyst column expressions.

This is the engine's replacement for the reference's recursive descent
interpreter (``_validate``, /root/reference/src/schisma.mjs:137-357). Where
the reference walks one JS value at a time, we compile the whole walk ONCE
on the driver into three Columns per node:

- ``viols`` — ``array<violation-struct>`` of flattened problem results with
  dot-paths already built (the reference flattens after the fact,
  schisma.mjs:117-133; we emit flat from the start, PARTIAL carriers never
  materialize — schisma.mjs:132 drops them anyway)
- ``code``  — the node's own result code (for union scoring / non-error mode)
- ``h``     — the union heuristic value (``_getHeuristics``,
  schisma.mjs:359-394): EXACT +2 (+children), problems -1, others +1,
  PARTIAL = sum of children

Union (``$typeof``) resolution picks the first argmax of ``h`` across
alternatives (``_getBestResult``, schisma.mjs:359-363) — expressed as
``array_position(h_arr, array_max(h_arr))`` so the whole heuristic runs
vectorized in the JVM for every row at once. No Python executes per row
anywhere in this module.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schisma_spark import typeatoms as ta
from schisma_spark.dsl import ArrayAlt, AtomAlt, Node, ObjectAlt
from schisma_spark.result import (
    EXACT_MATCH,
    INVALID,
    MISSING_KEY,
    NO_MATCH,
    PARTIAL_MATCH,
    PROBLEM_CODES,
    UNEXPECTED_KEY,
    VALID,
    VIOLATION_STRUCT,
)

VIOL_ARR_T = T.ArrayType(VIOLATION_STRUCT)


@dataclass(frozen=True)
class Opts:
    """Validate option surface — same names/defaults as the reference
    (schisma.mjs:110; README.md:243-250). ``match_array`` is accepted but
    inert, faithfully: the reference documents it and never reads it in
    ``_validate`` (SURVEY.md §2.A R3)."""

    ignore_unexpected: bool = False
    ignore_required: bool = False
    ignore_short_arrays: bool = True
    ignore_long_arrays: bool = True
    match_array: str = "any"
    flatten_errors: bool = True   # results are always emitted flat
    filter_non_errors: bool = True


@dataclass
class CheckRes:
    """Compiled result for one node applied to one column expr.

    ``n`` is the violation COUNT as pure integer arithmetic (CASE WHEN +
    adds), carried alongside the struct-building ``viols`` array: the
    verdict/stats path aggregates ``n`` only, so it never constructs a
    violation struct — higher-order ``filter``/``array`` expressions are
    CodegenFallback and would knock the whole stage out of whole-stage
    codegen (measured r2: the fused verdicts stage had ZERO codegen spans
    and scaled at 0.55; counting keeps the stage fully code-generated).
    ``n`` is None where counting would need the structs anyway (array /
    map element walks — HOF-bound paths); ``count()`` falls back to
    ``size(viols)`` there."""

    viols: Column  # array<violation>
    code: Column   # string
    h: Column      # int
    n: Column | None = None  # int violation count, codegen-friendly

    def count(self) -> Column:
        return self.n if self.n is not None else F.size(self.viols)


# ---------------------------------------------------------------------------
# small helpers


def _s(x) -> Column:
    if x is None:
        return F.lit(None).cast("string")
    return x if isinstance(x, Column) else F.lit(str(x))


def viol(code, where=None, expected=None, received=None, value=None,
         message=None, type_index=None) -> Column:
    ti = (
        F.lit(None).cast("int")
        if type_index is None
        else (type_index if isinstance(type_index, Column) else F.lit(type_index)).cast("int")
    )
    return F.struct(
        _s(code).alias("code"),
        _s(where).alias("where"),
        _s(expected).alias("expected"),
        _s(received).alias("received"),
        _s(value).alias("value"),
        _s(message).alias("message"),
        ti.alias("type_index"),
    )


def empty_varr() -> Column:
    return F.array().cast(VIOL_ARR_T)


def varr(*conditional_structs: Column) -> Column:
    """array of maybe-null violation structs -> compacted array."""
    if not conditional_structs:
        return empty_varr()
    return F.filter(F.array(*conditional_structs), lambda x: x.isNotNull())


def stringify(c: Column, dtype: T.DataType) -> Column:
    """Portable string rendering of a value for the ``value`` field."""
    if isinstance(dtype, (T.StructType, T.MapType, T.ArrayType)):
        return F.to_json(c)
    if isinstance(dtype, T.BinaryType):
        return F.base64(c)
    if isinstance(dtype, T.NullType):
        return F.lit(None).cast("string")
    return c.cast("string")


def describe_expected(node: Node) -> str:
    """Human label for what a node expects (used in NO_MATCH.expected)."""
    names = []
    for a in node.alts:
        if isinstance(a, AtomAlt):
            names.append(a.atom.name)
        elif isinstance(a, ArrayAlt):
            names.append("array")
        elif isinstance(a, ObjectAlt):
            names.append("object")
        elif isinstance(a, Node):
            names.append(describe_expected(a))
    return "|".join(names) if names else "value"


def _const(viols: Column, code: str, h: int,
           n: Column | None = None) -> CheckRes:
    return CheckRes(viols, F.lit(code), F.lit(h).cast("int"), n)


def _i(x) -> Column:
    return F.lit(int(x)).cast("int") if not isinstance(x, Column) else x.cast("int")


def _bool_n(ok: Column) -> Column:
    """when(~ok, 1, 0) as int — the codegen-friendly violation count of a
    single conditional check."""
    return F.when(~ok, F.lit(1)).otherwise(F.lit(0)).cast("int")


def is_problem(code: Column) -> Column:
    return code.isin(*PROBLEM_CODES)


# ---------------------------------------------------------------------------
# node check


def check_node(node: Node, c: Column, dtype: T.DataType, where: Column,
               opts: Opts, type_index=None, root: bool = False) -> CheckRes:
    """Compile the full check for ``node`` against column expr ``c`` of
    static type ``dtype``. ``where`` is a (possibly NULL at root) string
    Column holding the dot-path of ``c``."""
    if node.unmarshal is not None:
        c = node.unmarshal.fn(c)
        dtype = node.unmarshal.returns

    if node.validate is not None:
        # $validate short-circuits type dispatch (schisma.mjs:141-172).
        # The user fn may return: a bool Column; (bool Column, message);
        # (bool Column, dict of violation-field overrides) — the engine twin
        # of the reference's merged error object (schisma.mjs:153-157) — or a
        # LIST of such specs, the twin of the array-of-sub-results branch
        # (schisma.mjs:143-152): one violation row per failed sub-result.
        res = node.validate(c)
        if isinstance(res, list):
            return _check_validate_list(res, c, dtype, where, type_index,
                                        root=root)
        extra: dict = {}
        if isinstance(res, tuple):
            res, second = res
            extra = dict(second) if isinstance(second, dict) else {"message": second}
        ok = F.coalesce(res, F.lit(True))  # undefined/true -> valid
        fields = {
            "where": where,
            "value": stringify(c, dtype),
            "type_index": type_index,
            **extra,
        }
        viols = varr(F.when(~ok, viol(INVALID, **fields)))
        code = F.when(ok, F.lit(VALID)).otherwise(F.lit(INVALID))
        h = F.when(ok, F.lit(1)).otherwise(F.lit(-1)).cast("int")
        return CheckRes(viols, code, h, _bool_n(ok))

    results = [
        check_alt(alt, i if len(node.alts) > 1 else type_index, node, c,
                  dtype, where, opts)
        for i, alt in enumerate(node.alts)
    ]
    if not results:
        return _const(empty_varr(), VALID, 1, _i(0))
    if len(results) == 1:
        return results[0]
    # union resolution: first argmax of h (schisma.mjs:357-363)
    h_arr = F.array(*[r.h for r in results])
    best = F.array_position(h_arr, F.array_max(h_arr)).cast("int")
    viols = F.element_at(F.array(*[r.viols for r in results]), best)
    code = F.element_at(F.array(*[r.code for r in results]), best)
    n = (
        F.element_at(F.array(*[r.n for r in results]), best)
        if all(r.n is not None for r in results) else None
    )
    return CheckRes(viols, code, F.array_max(h_arr), n)


def checked_value(node: Node, c: Column, dtype: T.DataType, where: Column,
                  opts: Opts, root: bool = False) -> CheckRes:
    """Check a node against a value position where SQL NULL means the JS
    value ``null`` (array elements, map values) rather than an absent key."""
    base = check_node(node, c, dtype, where, opts, root=root)
    if node.accepts_null() or node.validate is not None:
        return base
    nm = viol(
        NO_MATCH, where=where, expected=describe_expected(node),
        received="null", value=None,
    )
    return CheckRes(
        F.when(c.isNull(), F.array(nm)).otherwise(base.viols),
        F.when(c.isNull(), F.lit(NO_MATCH)).otherwise(base.code),
        F.when(c.isNull(), F.lit(-1)).otherwise(base.h).cast("int"),
        None if base.n is None else
        F.when(c.isNull(), F.lit(1)).otherwise(base.n).cast("int"),
    )


def _check_validate_list(specs: list, c: Column, dtype: T.DataType,
                         where: Column, type_index,
                         root: bool = False) -> CheckRes:
    """Array-return ``$validate`` (schisma.mjs:143-152, exercised in the
    test/class.mjs:38-50 style): the fn returned a list of sub-result specs,
    each ``ok_col`` or ``(ok_col, message_or_fields)``. Fields may carry a
    relative ``where`` (string or Column) and a ``code`` (default INVALID).

    Flatten parity (schisma.mjs:113, 117-133, verified against the
    reference): when the node is the ROOT of the validate call
    (``root=True``, the carrier-unwrap at schisma.mjs:113) the INVALID
    carrier is dropped; NESTED, an INVALID carrier row is emitted at the
    node's path first, then one row per failed sub with ``where`` prefixed
    by the node path (NULL root paths concat away, like everywhere else). Non-problem subs land in the
    reference's never-flattened ``results`` list — no rows here either.
    The reference's raw-value array fallback (schisma.mjs:148-149) crashes
    its own flatten under default conf, so it has no engine twin."""
    subs, any_bad = [], F.lit(False)
    for item in specs:
        if isinstance(item, tuple):
            ok_i, second = item
            extra = dict(second) if isinstance(second, dict) else {"message": second}
        else:
            ok_i, extra = item, {}
        sub_where = extra.pop("where", None)
        w_i = where if sub_where is None else F.concat_ws(".", where, _s(sub_where))
        code_i = extra.pop("code", INVALID)
        ok_i = F.coalesce(ok_i, F.lit(True))
        subs.append(F.when(~ok_i, viol(code_i, where=w_i, **extra)))
        any_bad = any_bad | ~ok_i
    n = _i(0)
    for item in specs:
        ok_i = item[0] if isinstance(item, tuple) else item
        n = n + _bool_n(F.coalesce(ok_i, F.lit(True)))
    if root:
        carriers = []
    else:
        carrier_cond = any_bad & where.isNotNull()
        carriers = [F.when(
            carrier_cond,
            viol(INVALID, where=where, value=stringify(c, dtype),
                 type_index=type_index),
        )]
        n = n + F.when(carrier_cond, F.lit(1)).otherwise(F.lit(0))
    return CheckRes(
        varr(*carriers, *subs),
        F.when(any_bad, F.lit(INVALID)).otherwise(F.lit(VALID)),
        F.when(any_bad, F.lit(-1)).otherwise(F.lit(1)).cast("int"),
        n.cast("int"),
    )


# ---------------------------------------------------------------------------
# alternatives


def check_alt(alt, idx, node: Node, c: Column, dtype: T.DataType,
              where: Column, opts: Opts) -> CheckRes:
    if isinstance(alt, Node):
        return check_node(alt, c, dtype, where, opts, type_index=idx)
    if isinstance(alt, AtomAlt):
        return _check_atom(alt.atom, idx, node, c, dtype, where)
    if isinstance(alt, ArrayAlt):
        return _check_array(alt, idx, c, dtype, where, opts)
    if isinstance(alt, ObjectAlt):
        return _check_object(alt, idx, c, dtype, where, opts)
    raise TypeError(f"bad alternative {alt!r}")


def _check_atom(atom: ta.TypeAtom, idx, node: Node, c: Column,
                dtype: T.DataType, where: Column) -> CheckRes:
    """Primitive/Class typeof check (schisma.mjs:336-351), decided statically
    per column where possible (a Spark column has one type)."""
    if atom is ta.NULL:
        ok = c.isNull()
        nm = viol(NO_MATCH, where=where, expected="null",
                  received=ta.js_typeof(dtype), value=stringify(c, dtype),
                  type_index=idx)
        return CheckRes(
            varr(F.when(~ok, nm)),
            F.when(ok, F.lit(EXACT_MATCH)).otherwise(F.lit(NO_MATCH)),
            F.when(ok, F.lit(2)).otherwise(F.lit(-1)).cast("int"),
            _bool_n(ok),
        )

    sm = ta.static_match(atom, dtype)
    if sm == "match":
        return _const(empty_varr(), EXACT_MATCH, 2, _i(0))

    # engine extension: Field(castable=True) turns the typeof check into a
    # try_cast conformance check (SURVEY.md §2.A R6 / E4 conformance rate)
    if node.castable and isinstance(dtype, T.StringType) and atom in (
        ta.NUMBER, ta.BIGINT, ta.BOOLEAN, ta.TIMESTAMP, ta.DATE,
    ):
        ok = c.try_cast(atom.spark_type).isNotNull() | c.isNull()
        nm = viol(NO_MATCH, where=where, expected=atom.name,
                  received=ta.js_typeof(dtype), value=stringify(c, dtype),
                  type_index=idx)
        return CheckRes(
            varr(F.when(~ok, nm)),
            F.when(ok, F.lit(EXACT_MATCH)).otherwise(F.lit(NO_MATCH)),
            F.when(ok, F.lit(2)).otherwise(F.lit(-1)).cast("int"),
            _bool_n(ok),
        )

    if sm == "integral":
        ok = c.isNull() | (c == F.floor(c))
        nm = viol(NO_MATCH, where=where, expected=atom.name,
                  received=ta.js_typeof(dtype), value=stringify(c, dtype),
                  type_index=idx)
        return CheckRes(
            varr(F.when(~ok, nm)),
            F.when(ok, F.lit(EXACT_MATCH)).otherwise(F.lit(NO_MATCH)),
            F.when(ok, F.lit(2)).otherwise(F.lit(-1)).cast("int"),
            _bool_n(ok),
        )

    # static mismatch: every (non-null) value is NO_MATCH
    nm = viol(NO_MATCH, where=where, expected=atom.name,
              received=ta.js_typeof(dtype), value=stringify(c, dtype),
              type_index=idx)
    return _const(F.array(nm), NO_MATCH, -1, _i(1))


def _check_array(alt: ArrayAlt, idx, c: Column, dtype: T.DataType,
                 where: Column, opts: Opts) -> CheckRes:
    """Array check (schisma.mjs:181-229): per-element best-of element
    schemas, long arrays -> UNEXPECTED_KEY per extra index, short arrays ->
    MISSING_KEY per missing index (both off by default)."""
    if not isinstance(dtype, T.ArrayType):
        nm = viol(NO_MATCH, where=where, expected="array",
                  received=ta.js_typeof(dtype), value=stringify(c, dtype),
                  type_index=idx)
        return _const(F.array(nm), NO_MATCH, -1, _i(1))

    ed = dtype.elementType
    m = len(alt.elems)

    if m == 0:
        # schema literal []: no element types, length-insensitive
        # (schisma.mjs:31-33) — except every index is "long" when
        # ignoreLongArrays=False (schema length is 0)
        if opts.ignore_long_arrays:
            return _const(empty_varr(), EXACT_MATCH, 2, _i(0))
        uk = F.transform(
            c,
            lambda _x, i: viol(
                UNEXPECTED_KEY,
                where=F.concat_ws(".", where, i.cast("string")),
            ),
        )
        any_long = F.size(c) > 0
        return CheckRes(
            uk,
            F.when(any_long, F.lit(PARTIAL_MATCH)).otherwise(F.lit(EXACT_MATCH)),
            F.when(any_long, -F.size(c)).otherwise(F.lit(2)).cast("int"),
            F.size(c).cast("int"),
        )

    def elem_res(x: Column, i: Column) -> Column:
        w = F.concat_ws(".", where, i.cast("string"))
        if not opts.ignore_long_arrays:
            uk = viol(UNEXPECTED_KEY, where=w)
            long_struct = F.struct(
                F.array(uk).alias("v"), F.lit(True).alias("p"),
                F.lit(-1).cast("int").alias("h"),
            )
        # best element schema (schisma.mjs:203-207)
        rs = [checked_value(s, x, ed, w, opts) for s in alt.elems]
        if len(rs) == 1:
            r = rs[0]
            v_, code_, h_ = r.viols, r.code, r.h
        else:
            h_arr = F.array(*[r.h for r in rs])
            b = F.array_position(h_arr, F.array_max(h_arr)).cast("int")
            v_ = F.element_at(F.array(*[r.viols for r in rs]), b)
            code_ = F.element_at(F.array(*[r.code for r in rs]), b)
            h_ = F.array_max(h_arr)
        base = F.struct(
            v_.alias("v"), is_problem(code_).alias("p"), h_.alias("h")
        )
        if not opts.ignore_long_arrays:
            return F.when(i >= F.lit(m), long_struct).otherwise(base)
        return base

    elems = F.transform(c, elem_res)
    all_viols = F.flatten(F.transform(elems, lambda e: e["v"]))
    any_prob = F.exists(elems, lambda e: e["p"])
    sum_h = F.aggregate(elems, F.lit(0).cast("int"),
                        lambda a, e: a + e["h"])

    n_short = F.lit(0)
    short_viols = empty_varr()
    if not opts.ignore_short_arrays:
        missing = F.when(
            F.size(c) < m,
            F.transform(
                F.sequence(F.size(c), F.lit(m - 1)),
                lambda i: viol(MISSING_KEY,
                               where=F.concat_ws(".", where, i.cast("string")),
                               type_index=i),
            ),
        ).otherwise(empty_varr())
        short_viols = missing
        n_short = F.greatest(F.lit(0), F.lit(m) - F.size(c))
        any_prob = any_prob | (F.size(c) < m)

    viols = F.concat(all_viols, short_viols)
    h = (sum_h - n_short + F.when(any_prob, F.lit(0)).otherwise(F.lit(2))).cast("int")
    code = F.when(any_prob, F.lit(PARTIAL_MATCH)).otherwise(F.lit(EXACT_MATCH))
    res = CheckRes(viols, code, h)
    # null array value guarded by checked_value/parent
    return res


# ---------------------------------------------------------------------------
# objects


def _child_contrib(child: Node, cc: Column, cdt: T.DataType, w: Column,
                   opts: Opts):
    """One fixed key's contribution to an object result, with the relational
    null-as-absent convention (SURVEY.md §2.A R9): NULL + required ->
    MISSING_KEY; NULL + optional -> skipped; nodes that accept null get the
    value semantics."""
    if child.accepts_null():
        r = check_node(child, cc, cdt, w, opts)
        return r.viols, is_problem(r.code), r.h, r.n
    base = check_node(child, cc, cdt, w, opts)
    if child.required and not opts.ignore_required:
        mk = F.array(viol(MISSING_KEY, where=w))
        viols = F.when(cc.isNull(), mk).otherwise(base.viols)
        prob = F.when(cc.isNull(), F.lit(True)).otherwise(is_problem(base.code))
        h = F.when(cc.isNull(), F.lit(-1)).otherwise(base.h).cast("int")
        n = None if base.n is None else \
            F.when(cc.isNull(), F.lit(1)).otherwise(base.n).cast("int")
    else:
        viols = F.when(cc.isNull(), empty_varr()).otherwise(base.viols)
        prob = F.when(cc.isNull(), F.lit(False)).otherwise(is_problem(base.code))
        h = F.when(cc.isNull(), F.lit(0)).otherwise(base.h).cast("int")
        n = None if base.n is None else \
            F.when(cc.isNull(), F.lit(0)).otherwise(base.n).cast("int")
    return viols, prob, h, n


def _best_of_patterns(pattern_alts: list[list[Node]], v: Column,
                      vdt: T.DataType, w: Column, opts: Opts):
    """Best result for a key matched by >=1 regex patterns: each pattern's
    alternatives reduce via the union heuristic; across patterns, non-problem
    results are preferred then best-h first-wins (schisma.mjs:256-295)."""
    per_pattern = []
    for alts in pattern_alts:
        rs = [checked_value(s, v, vdt, w, opts) for s in alts]
        if len(rs) == 1:
            per_pattern.append(rs[0])
        else:
            h_arr = F.array(*[r.h for r in rs])
            b = F.array_position(h_arr, F.array_max(h_arr)).cast("int")
            per_pattern.append(
                CheckRes(
                    F.element_at(F.array(*[r.viols for r in rs]), b),
                    F.element_at(F.array(*[r.code for r in rs]), b),
                    F.array_max(h_arr),
                    F.element_at(F.array(*[r.n for r in rs]), b)
                    if all(r.n is not None for r in rs) else None,
                )
            )
    if len(per_pattern) == 1:
        r = per_pattern[0]
        return r.viols, is_problem(r.code), r.h, r.n
    # composite score: non-problems rank above all problems, then h
    scores = F.array(
        *[
            (r.h + F.when(is_problem(r.code), F.lit(-100000)).otherwise(F.lit(0))).cast("int")
            for r in per_pattern
        ]
    )
    b = F.array_position(scores, F.array_max(scores)).cast("int")
    viols = F.element_at(F.array(*[r.viols for r in per_pattern]), b)
    code = F.element_at(F.array(*[r.code for r in per_pattern]), b)
    n = (F.element_at(F.array(*[r.n for r in per_pattern]), b)
         if all(r.n is not None for r in per_pattern) else None)
    return viols, is_problem(code), \
        F.element_at(F.array(*[r.h for r in per_pattern]), b), n


def check_object_fields(alt: ObjectAlt, getter, present: list[str],
                        where: Column, opts: Opts,
                        exempt: set[str] = frozenset()) -> CheckRes:
    """Shared object-shape check for the root DataFrame and struct columns:
    ``getter(key) -> (Column, DataType)`` over the statically-known key set
    ``present``. Regex keys resolve at COMPILE time here — the key set of a
    DataFrame / StructType is static, so the reference's runtime regex loop
    (schisma.mjs:256-295) folds into plan construction."""
    contribs = []  # (viols, prob, h, n)
    # fixed keys in schema
    for k, child in alt.fields.items():
        if k in present:
            cc, cdt = getter(k)
            w = F.concat_ws(".", where, F.lit(k))
            contribs.append(_child_contrib(child, cc, cdt, w, opts))
        else:
            # column absent entirely from the data's schema
            if child.required and not opts.ignore_required:
                w = F.concat_ws(".", where, F.lit(k))
                contribs.append(
                    (F.array(viol(MISSING_KEY, where=w)), F.lit(True),
                     F.lit(-1).cast("int"), _i(1))
                )
    # keys present but not fixed: regex match (declaration order) else
    # unexpected (schisma.mjs:256-305)
    fixed = set(alt.fields)
    for k in present:
        if k in fixed or k in exempt:
            continue
        pats = [alts for (pat, alts) in alt.regex if re.search(pat, k)]
        cc, cdt = getter(k)
        w = F.concat_ws(".", where, F.lit(k))
        if pats:
            contribs.append(_best_of_patterns(pats, cc, cdt, w, opts))
        elif not opts.ignore_unexpected:
            uk = viol(UNEXPECTED_KEY, where=w, received=stringify(cc, cdt))
            contribs.append((F.array(uk), F.lit(True), F.lit(-1).cast("int"),
                             _i(1)))

    if not contribs:
        return _const(empty_varr(), EXACT_MATCH, 2, _i(0))
    viols = F.concat(*[t[0] for t in contribs]) if len(contribs) > 1 \
        else contribs[0][0]
    any_prob = contribs[0][1]
    for t in contribs[1:]:
        any_prob = any_prob | t[1]
    sum_h = contribs[0][2]
    for t in contribs[1:]:
        sum_h = sum_h + t[2]
    if all(t[3] is not None for t in contribs):
        sum_n = contribs[0][3]
        for t in contribs[1:]:
            sum_n = sum_n + t[3]
        sum_n = sum_n.cast("int")
    else:
        sum_n = None
    code = F.when(any_prob, F.lit(PARTIAL_MATCH)).otherwise(F.lit(EXACT_MATCH))
    h = (sum_h + F.when(any_prob, F.lit(0)).otherwise(F.lit(2))).cast("int")
    return CheckRes(viols, code, h, sum_n)


def _check_object(alt: ObjectAlt, idx, c: Column, dtype: T.DataType,
                  where: Column, opts: Opts) -> CheckRes:
    """Object alternative against a struct or map column
    (schisma.mjs:230-335)."""
    if isinstance(dtype, T.StructType):
        fields = {f.name: f.dataType for f in dtype.fields}

        def getter(k):
            return c.getField(k), fields[k]

        res = check_object_fields(alt, getter, list(fields), where, opts)
        # a null struct value = NO_MATCH 'object' vs 'null' (schisma.mjs:240-248)
        nm = F.array(viol(NO_MATCH, where=where, expected="object",
                          received="null", type_index=idx))
        return CheckRes(
            F.when(c.isNull(), nm).otherwise(res.viols),
            F.when(c.isNull(), F.lit(NO_MATCH)).otherwise(res.code),
            F.when(c.isNull(), F.lit(-1)).otherwise(res.h).cast("int"),
            None if res.n is None else
            F.when(c.isNull(), F.lit(1)).otherwise(res.n).cast("int"),
        )
    if isinstance(dtype, T.MapType):
        return _check_map(alt, idx, c, dtype, where, opts)
    nm = viol(NO_MATCH, where=where, expected="object",
              received=ta.js_typeof(dtype), value=stringify(c, dtype),
              type_index=idx)
    return _const(F.array(nm), NO_MATCH, -1, _i(1))


def _check_map(alt: ObjectAlt, idx, c: Column, dtype: T.MapType,
               where: Column, opts: Opts) -> CheckRes:
    """Object alternative over an open-keyed MapType column: the runtime
    twin of the regex-key loop (schisma.mjs:256-295) using map higher-order
    functions — fixed keys via element_at, per-entry regex dispatch via
    transform over map_entries. Keys are dynamic per row here, so this is
    the one place regex matching happens at run time (`rlike`)."""
    from schisma_spark.functions.portable import bind as _bind

    vdt = dtype.valueType
    # per-field contributions as LET-BOUND (v, p, h) structs: the
    # element_at evaluates once per row regardless of how many times the
    # child check references the value, and the struct shape lets the
    # combine below reference each field exactly once (interpreted stages
    # — Generate/Filter — do no common-subexpression elimination, so every
    # textual duplicate re-evaluates; measured 5x on the variant twin)
    field_structs = []
    for k, child in alt.fields.items():
        w = F.concat_ws(".", where, F.lit(k))

        def _mk(child, w):
            def body(cc: Column) -> Column:
                v_, p_, h_, _n = _child_contrib(child, cc, vdt, w, opts)
                return F.struct(v_.alias("v"), p_.alias("p"),
                                h_.cast("int").alias("h"))
            return body

        field_structs.append(_bind(F.element_at(c, F.lit(k)), _mk(child, w)))

    fixed_arr = F.array(*[F.lit(k) for k in alt.fields]) if alt.fields \
        else F.array().cast("array<string>")

    def entry_res(e: Column) -> Column:
        from schisma_spark.functions.portable import bind

        k, v = e["key"], e["value"]
        w = F.concat_ws(".", where, k)
        # every MATCHING pattern is tried and the best result kept —
        # non-problems preferred over problems, then max h
        # (schisma.mjs:256-295: results list consulted before errors).
        # The per-pattern results are materialized ONCE into a bound array
        # of structs; the argmax then just indexes it (inlining the check
        # tree into scores + three selection arrays multiplied the work and
        # codegen size ~4x).
        NOMATCH = -(10**9)
        uk_v = F.array(viol(UNEXPECTED_KEY, where=w,
                            received=stringify(v, vdt)))
        if opts.ignore_unexpected:
            unexpected = F.struct(empty_varr().alias("v"),
                                  F.lit(False).alias("p"),
                                  F.lit(0).cast("int").alias("h"))
        else:
            unexpected = F.struct(uk_v.alias("v"), F.lit(True).alias("p"),
                                  F.lit(-1).cast("int").alias("h"))
        if not alt.regex:
            expr = unexpected
        else:
            per_structs = []
            for pat, alts in alt.regex:
                v_, p_, h_, _n_ = _best_of_patterns([alts], v, vdt, w, opts)
                score = (
                    h_.cast("long")
                    + F.when(p_, F.lit(-100000)).otherwise(F.lit(0))
                )
                per_structs.append(
                    F.struct(
                        F.when(k.rlike(pat), score)
                        .otherwise(F.lit(NOMATCH).cast("long")).alias("s"),
                        v_.alias("v"), p_.alias("p"),
                        h_.cast("int").alias("h"),
                    )
                )

            def pick(arr: Column) -> Column:
                scores = F.transform(arr, lambda x: x["s"])
                mx = F.array_max(scores)
                best = F.array_position(scores, mx).cast("int")
                chosen = F.element_at(arr, best)
                return F.when(
                    mx > NOMATCH,
                    F.struct(chosen["v"].alias("v"), chosen["p"].alias("p"),
                             chosen["h"].alias("h")),
                ).otherwise(unexpected)

            expr = bind(F.array(*per_structs), pick)
        skip = F.struct(empty_varr().alias("v"), F.lit(False).alias("p"),
                        F.lit(0).cast("int").alias("h"))
        return F.when(F.array_contains(fixed_arr, k), skip).otherwise(expr)

    # dynamic entries: the transform is bound once — flatten/exists/
    # aggregate iterate the bound array instead of re-running the whole
    # per-entry dispatch three times
    def _dyn(es: Column) -> Column:
        return F.struct(
            F.flatten(F.transform(es, lambda e: e["v"])).alias("v"),
            F.exists(es, lambda e: e["p"]).alias("p"),
            F.aggregate(es, F.lit(0).cast("int"),
                        lambda a, e: a + e["h"]).alias("h"),
        )

    field_structs.append(_bind(F.transform(F.map_entries(c), entry_res),
                               _dyn))

    def _combine(cs: Column) -> Column:
        return F.struct(
            F.flatten(F.transform(cs, lambda s: s["v"])).alias("v"),
            F.exists(cs, lambda s: s["p"]).alias("p"),
            F.aggregate(cs, F.lit(0).cast("int"),
                        lambda a, s: a + s["h"]).alias("h"),
        )

    agg = _bind(F.array(*field_structs), _combine)
    code = F.when(agg["p"], F.lit(PARTIAL_MATCH)).otherwise(
        F.lit(EXACT_MATCH))
    h = (agg["h"] + F.when(agg["p"], F.lit(0)).otherwise(F.lit(2)))
    nm = F.array(viol(NO_MATCH, where=where, expected="object",
                      received="null", type_index=idx))
    return CheckRes(
        F.when(c.isNull(), nm).otherwise(agg["v"]),
        F.when(c.isNull(), F.lit(NO_MATCH)).otherwise(code),
        F.when(c.isNull(), F.lit(-1)).otherwise(h).cast("int"),
    )
