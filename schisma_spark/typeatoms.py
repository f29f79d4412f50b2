"""Type atoms: the leaf types of the schema DSL and their Spark mappings.

The reference's leaf types are JS constructors (``Number, String, Boolean,
BigInt``, ``Schisma.Null``, user classes — /root/reference/src/schisma.mjs:70-93,
675-677). Here each atom carries its Spark ``DataType``, a JS-``typeof``-style
name used in ``expected``/``received`` violation fields, and the zero value
used by ``create()`` (/root/reference/src/schisma.mjs:567-578).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Any

from pyspark.sql import types as T


@dataclass(frozen=True)
class TypeAtom:
    name: str          # js-typeof-ish name used in expected/received
    spark_type: T.DataType
    zero: Any          # create() zero value (schisma.mjs:567-578)


NUMBER = TypeAtom("number", T.DoubleType(), 0.0)       # JS Number
BIGINT = TypeAtom("bigint", T.LongType(), 0)           # JS BigInt / integral
STRING = TypeAtom("string", T.StringType(), "")
BOOLEAN = TypeAtom("boolean", T.BooleanType(), False)
NULL = TypeAtom("null", T.NullType(), None)            # Schisma.Null analog
BINARY = TypeAtom("binary", T.BinaryType(), b"")       # engine extension
TIMESTAMP = TypeAtom("timestamp", T.TimestampType(), None)  # Date analog
DATE = TypeAtom("date", T.DateType(), None)

#: python type literal -> atom (DSL surface: ``{"w": int}``)
PY_TYPE_ATOMS = {
    float: NUMBER,
    int: BIGINT,
    str: STRING,
    bool: BOOLEAN,
    bytes: BINARY,
    bytearray: BINARY,
    _dt.datetime: TIMESTAMP,
    _dt.date: DATE,
}

_INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
_FLOATING = (T.DoubleType, T.FloatType)
_NUMERIC = _INTEGRAL + _FLOATING + (T.DecimalType,)


def js_typeof(dtype: T.DataType) -> str:
    """JS-style ``typeof`` name for a Spark column type, used for the
    ``received`` field of NO_MATCH violations (schisma.mjs:336-344)."""
    if isinstance(dtype, _NUMERIC):
        return "number"
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, (T.StructType, T.MapType)):
        return "object"
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, T.NullType):
        return "null"
    return dtype.simpleString()


def static_match(atom: TypeAtom, dtype: T.DataType) -> str:
    """Compile-time type-conformance decision for a column of ``dtype``
    checked against ``atom``. Returns one of:

    - ``'match'``    — every non-null value matches (JS typeof-equality)
    - ``'integral'`` — floating column vs BIGINT: per-value integrality check
    - ``'mismatch'`` — every non-null value is a NO_MATCH

    Mirrors the reference's ``typeof o !== typeof this.create()`` check
    (schisma.mjs:337) lifted to whole columns: a Spark column has ONE type,
    so the typeof test is decidable at compile time except for the
    numeric-family split.
    """
    if atom is NUMBER:
        return "match" if isinstance(dtype, _NUMERIC) else "mismatch"
    if atom is BIGINT:
        if isinstance(dtype, _INTEGRAL):
            return "match"
        if isinstance(dtype, _FLOATING + (T.DecimalType,)):
            return "integral"
        return "mismatch"
    if atom is STRING:
        return "match" if isinstance(dtype, T.StringType) else "mismatch"
    if atom is BOOLEAN:
        return "match" if isinstance(dtype, T.BooleanType) else "mismatch"
    if atom is BINARY:
        return "match" if isinstance(dtype, T.BinaryType) else "mismatch"
    if atom is TIMESTAMP:
        return (
            "match"
            if isinstance(dtype, (T.TimestampType, T.TimestampNTZType))
            else "mismatch"
        )
    if atom is DATE:
        return "match" if isinstance(dtype, T.DateType) else "mismatch"
    if atom is NULL:
        # null-ness is per-value (a nullable column of any type can hold it)
        return "integral"  # sentinel: per-value check
    return "mismatch"
