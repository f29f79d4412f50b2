"""Property-based tests (hypothesis) — beyond the reference's
example-based goldens (its closest is test/automated.mjs:19-77, the
primitive-pair matrix). Driver-side properties run without Spark; one
Spark property cross-checks conform against the driver-side create()."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from schisma_spark import Field, schema
from schisma_spark.create import create_value, js_boolean, js_number, js_string
from schisma_spark.dsl import parse

finite_floats = st.floats(allow_nan=False, allow_infinity=False, width=64)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    finite_floats,
    st.text(max_size=30),
)


@given(scalars)
@settings(max_examples=300, deadline=None)
def test_js_number_total_and_idempotent(v):
    out = js_number(v)
    assert isinstance(out, float)
    if not math.isnan(out):
        assert js_number(out) == out  # numbers are fixed points


@given(scalars)
@settings(max_examples=300, deadline=None)
def test_js_string_total(v):
    out = js_string(v)
    assert isinstance(out, str)
    assert js_string(out) == out  # strings are fixed points


@given(scalars)
@settings(max_examples=300, deadline=None)
def test_js_boolean_matches_js_semantics(v):
    out = js_boolean(v)
    assert isinstance(out, bool)
    if isinstance(v, str):
        assert out == (len(v) > 0)  # only '' is falsy among strings


@given(scalars)
@settings(max_examples=200, deadline=None)
def test_create_conform_closure(v):
    """create(data) always yields a value that validates cleanly against
    the same leaf schema (the conform fixed-point property)."""
    for typ, pred in [
        (float, lambda x: isinstance(x, float)),
        (str, lambda x: isinstance(x, str)),
        (bool, lambda x: isinstance(x, bool)),
    ]:
        node = parse(Field(type=typ, default=typ()))
        out = create_value(node, v)
        assert pred(out), (typ, v, out)
        # idempotence: conforming a conformed value is identity
        assert create_value(node, out) == out or (
            isinstance(out, float) and math.isnan(out)
        )


@given(st.lists(scalars, max_size=6), st.integers(min_value=0, max_value=3))
@settings(max_examples=100, deadline=None)
def test_create_populate_arrays_shape(elems, depth):
    sch = schema({"a": [float] * max(1, depth)})
    out = sch.create(populate_arrays=True)
    assert out["a"] == [0.0] * max(1, depth)


@given(
    st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=4),
        st.one_of(finite_floats, st.text(max_size=8)),
        max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_object_create_only_required(keys_values):
    defn = {
        k: Field(type=float if isinstance(v, float) else str,
                 required=bool(hash(k) % 2))
        for k, v in keys_values.items()
    }
    if not defn:
        return
    sch = schema(defn)
    out = sch.create()
    assert set(out) == {k for k, f in defn.items() if f.required}
