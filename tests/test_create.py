"""create()/createProperty goldens ported from the reference
(/root/reference/test/basic.mjs:4-23, test/schemaObject.mjs:78-84,
test/createProperty.mjs:4-45). Driver-side only — no Spark needed."""

from schisma_spark import Field, Null, schema


def test_create_zero_values():
    # basic.mjs:4-23 — zero values for each kind
    assert schema({"s": str}).create() == {"s": ""}
    assert schema({"n": float}).create() == {"n": 0.0}
    assert schema({"i": int}).create() == {"i": 0}
    assert schema({"b": bool}).create() == {"b": False}
    assert schema({"z": Null}).create() == {"z": None}
    assert schema({"o": {"x": float}}).create() == {"o": {"x": 0.0}}
    assert schema({"a": [float]}).create() == {"a": []}


def test_create_defaults():
    # schemaObject.mjs:78-84 — $default literal
    sch = schema({"v": Field(type=float, default=32.0)})
    assert sch.create() == {"v": 32.0}
    # primitive literal doubles as default (schisma.mjs:74-93)
    assert schema({"v": 42.0}).create() == {"v": 42.0}
    assert schema({"v": "hi"}).create() == {"v": "hi"}
    # $default thunk (schisma.mjs:539-541)
    sch = schema({"v": Field(type=float, default=lambda d: 7.0)})
    assert sch.create() == {"v": 7.0}


def test_create_skips_optional_and_regex_keys():
    # schisma.mjs:559-566 — only $required keys, skip $/ keys
    sch = schema(
        {
            "keep": float,
            "opt": Field(type=float, required=False),
            "$/^x_": [float],
        }
    )
    assert sch.create() == {"keep": 0.0}


def test_create_populate_arrays():
    sch = schema({"a": [float, str]})
    assert sch.create(populate_arrays=True) == {"a": [0.0, ""]}


def test_create_default_deep_cloned():
    d = {"inner": [1, 2]}
    sch = schema({"v": Field(type=dict, typeof=[{"inner": [int]}], default=d)})
    got = sch.create()
    assert got == {"v": {"inner": [1, 2]}}
    got["v"]["inner"].append(3)
    assert sch.create() == {"v": {"inner": [1, 2]}}  # clone, not alias


def test_coercion_create():
    # basic.mjs:25-30 / automated.mjs — constructor coercions with data
    sch = schema({"n": float})
    assert sch.create({"x": 1}) == {"n": 0.0}  # object member missing -> zero
    from schisma_spark.create import create_value
    from schisma_spark.dsl import parse

    n = parse(Field(type=float, default=0.0))
    assert create_value(n, "32") == 32.0
    assert create_value(n, "whoops") == 0.0  # NaN -> default (schisma.mjs:579-584)
    assert create_value(n, True) == 1.0
    s = parse(Field(type=str))
    assert create_value(s, 0) == "0"  # String(0) -> '0'
    assert create_value(s, {"key": "value"}) == '{"key":"value"}'  # JSON.stringify
    b = parse(Field(type=bool))
    assert create_value(b, 1) is True
    assert create_value(b, "") is False
    assert create_value(b, "false") is True  # JS truthiness
    z = parse(Null)
    assert create_value(z, False) is None


def test_create_property():
    # createProperty.mjs:4-45 — dot-path + $N
    sch = schema({"a": {"B": 0.0}})
    assert sch.create_property("a") == {"B": 0.0}
    assert sch.create_property("a.B") == 0.0
    sch = schema({"variadic": Field(typeof=[str, float])})
    assert sch.create_property("variadic.$0") == ""
    assert sch.create_property("variadic.$1") == 0.0
    assert sch.create_property("missing.path") is None
    sch = schema({"a": {"string": str}})
    assert sch.create_property("a.string", "test") == "test"
