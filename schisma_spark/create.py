"""create() / createProperty(): driver-side default instantiation.

Port of the reference semantics (/root/reference/src/schisma.mjs:536-652):
``$default`` literals deep-cloned (:542-544), ``$default`` thunks called with
the data (:539-541), zero values ``'' / 0 / false / null`` (:567-578), objects
keep only required keys and skip regex keys (:559-566), arrays are ``[]``
unless ``populate_arrays`` (:553-557), and the data-coercion path follows JS
constructor semantics (:579-607): ``Number('abc') -> NaN -> default``,
``String(obj) -> JSON.stringify``, ``Boolean`` = JS truthiness.

These run on the driver (no Spark job) — the Column-level twins used by
``conform()`` live in :mod:`schisma_spark.conform`.
"""

from __future__ import annotations

import copy
import datetime as _dt
import json
import math
import re
from typing import Any

from schisma_spark import typeatoms as ta
from schisma_spark.dsl import _UNSET, ArrayAlt, AtomAlt, Node, ObjectAlt

_JS_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def js_number(data: Any) -> float:
    """JS ``Number(x)`` — returns NaN for unconvertible input."""
    if data is None:
        return 0.0
    if isinstance(data, bool):
        return 1.0 if data else 0.0
    if isinstance(data, (int, float)):
        return float(data)
    if isinstance(data, str):
        s = data.strip()
        if s == "":
            return 0.0
        if _JS_NUM_RE.match(s):
            return float(s)
        return math.nan
    if isinstance(data, list):
        if len(data) == 0:
            return 0.0
        if len(data) == 1:
            return js_number(data[0])
        return math.nan
    return math.nan  # dicts, bytes, etc -> NaN


def js_string(data: Any) -> str:
    """JS ``String(x)`` with the reference's object special-case
    (JSON.stringify for objects, schisma.mjs:591-596)."""
    if data is None:
        return "null"
    if isinstance(data, bool):
        return "true" if data else "false"
    if isinstance(data, float):
        if math.isnan(data):
            return "NaN"
        if data == int(data) and abs(data) < 1e21:
            return str(int(data))
        return repr(data)
    if isinstance(data, (dict, list)):
        return json.dumps(data, separators=(",", ":"))
    if isinstance(data, (bytes, bytearray)):
        return bytes(data).decode("utf-8", "replace")
    return str(data)


def js_boolean(data: Any) -> bool:
    """JS truthiness: falsy = 0, '', null, NaN, false; [] and {} are truthy."""
    if data is None:
        return False
    if isinstance(data, (dict, list)):
        return True
    if isinstance(data, float) and math.isnan(data):
        return False
    return bool(data)


def _coerce_atom(atom: ta.TypeAtom, node: Node, data: Any,
                 populate_arrays: bool) -> Any:
    """The data-given constructor path (schisma.mjs:579-607)."""
    if atom is ta.NUMBER:
        v = js_number(data)
        if math.isnan(v):
            return create_value(node, _UNSET, populate_arrays)  # NaN -> default
        return v
    if atom is ta.BIGINT:
        v = js_number(data) if not isinstance(data, int) or isinstance(data, bool) \
            else float(data)
        if math.isnan(v):
            return create_value(node, _UNSET, populate_arrays)
        return int(v)
    if atom is ta.STRING:
        return js_string(data)
    if atom is ta.BOOLEAN:
        return js_boolean(data)
    if atom is ta.NULL:
        return None
    if atom is ta.BINARY:
        if isinstance(data, (bytes, bytearray)):
            return bytes(data)
        return js_string(data).encode("utf-8")
    if atom is ta.TIMESTAMP:
        if isinstance(data, _dt.datetime):
            return data
        if isinstance(data, (int, float)) and not isinstance(data, bool):
            return _dt.datetime.fromtimestamp(data / 1000.0, tz=_dt.timezone.utc)
        if isinstance(data, str):
            try:
                return _dt.datetime.fromisoformat(data)
            except ValueError:
                return None
        return None
    if atom is ta.DATE:
        if isinstance(data, _dt.date):
            return data
        if isinstance(data, str):
            try:
                return _dt.date.fromisoformat(data)
            except ValueError:
                return None
        return None
    return "FIXME"  # unreachable, kept for parity (schisma.mjs:609)


def create_value(node: Node, data: Any = _UNSET,
                 populate_arrays: bool = False) -> Any:
    """``create(conf, data)`` (schisma.mjs:536-610)."""
    if node.has_default:
        if callable(node.default):
            return node.default(None if data is _UNSET else data)
        if data is _UNSET:
            return copy.deepcopy(node.default)
    if node.unmarshal is not None and data is not _UNSET:
        py = getattr(node.unmarshal, "py", None)
        if py is not None:
            return py(data)
        # Column-only unmarshal cannot run on driver-side values; fall through.
    if not node.alts:
        return None
    alt = node.alts[0]  # first alternative wins (schisma.mjs:549)
    if isinstance(alt, Node):
        return create_value(alt, data, populate_arrays)
    if isinstance(alt, ArrayAlt):
        if populate_arrays:
            return [create_value(e, _UNSET, populate_arrays) for e in alt.elems]
        return []
    if isinstance(alt, ObjectAlt):
        out = {}
        for k, v in alt.fields.items():  # regex keys skipped (schisma.mjs:562)
            if not v.required:
                continue
            out[k] = create_value(v, _UNSET, populate_arrays)
        return out
    if isinstance(alt, AtomAlt):
        if data is _UNSET:
            return alt.atom.zero
        return _coerce_atom(alt.atom, node, data, populate_arrays)
    return "FIXME"


def create_property(node: Node, which: str = "", data: Any = _UNSET,
                    populate_arrays: bool = False) -> Any:
    """Dot-path navigation + ``$N`` alternative selection
    (schisma.mjs:631-652). Missing path -> None (JS ``undefined``)."""
    if which == "":
        return create_value(node, data, populate_arrays)
    key, _, rest = which.partition(".")
    target: Node | None = None
    if key.startswith("$") and key[1:].isdigit():
        idx = int(key[1:])
        if idx < len(node.alts):
            a = node.alts[idx]
            target = a if isinstance(a, Node) else Node(kind="Class", alts=[a])
    else:
        if node.alts and isinstance(node.alts[0], ObjectAlt):
            target = node.alts[0].fields.get(key)
        elif node.alts and isinstance(node.alts[0], Node):
            return create_property(node.alts[0], which, data, populate_arrays)
    if target is None:
        return None
    return create_property(target, rest, data, populate_arrays)
