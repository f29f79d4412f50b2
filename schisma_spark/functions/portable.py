"""Portable deterministic hashing.

Spark's ``xxhash64``/``hash`` have no DuckDB twins, so every hash that
feeds an oracle-checked result uses an md5-hex-prefix construction that
evaluates identically in Spark and ANSI-ish SQL:

    Spark : conv(substring(md5(x), 1, 8), 16, 10)::long
    DuckDB: ('0x' || substr(md5(x), 1, 8))::int64

(verified equal: 'hello world' -> 1589001147 on both). 15 hex chars = 60
bits still fits a signed int64 on both sides. For purely internal hashing
(salts, buckets) prefer ``F.xxhash64`` — cheaper, JVM-native.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH32_MAX = 0xFFFFFFFF


def hash32(c: Column) -> Column:
    """32-bit portable hash (non-negative, fits int64 exactly)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def hash32_native(*cols: Column) -> Column:
    """32-bit NATIVE hash (xxhash64 masked): ~an order of magnitude cheaper
    than the md5 construction (no hex round-trip, fully code-generated,
    multi-arg without string concat) but has no DuckDB twin — the
    production path for hash-heavy operators (minhash/simhash) when oracle
    parity is not required. Same non-negative 32-bit range as hash32."""
    return F.xxhash64(*cols).bitwiseAND(F.lit(HASH32_MAX))


def hash60(c: Column) -> Column:
    """60-bit portable hash."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def lit_doubles(values) -> Column:
    """Literal ``array<double>`` (or ``array<array<double>>``) via ONE
    parsed SQL expression. ``F.lit`` converts Python lists element-wise
    over py4j — 1.2 s for 3,072 floats (measured, r4); the SQL string is
    a single call (~2 ms) and ``Double.parseDouble`` of ``repr(x)``
    round-trips exactly (both sides IEEE nearest), so values are
    bit-identical. The ``D`` suffix forces DOUBLE — a bare ``1.0`` parses
    as DECIMAL in Spark SQL."""
    def _d(x) -> str:
        return repr(float(x)) + "D"

    if values and isinstance(values[0], (list, tuple)):
        inner = ",".join(
            "array(" + ",".join(_d(x) for x in row) + ")" for row in values
        )
        return F.expr(f"array({inner})")
    return F.expr("array(" + ",".join(_d(x) for x in values) + ")")


def lit_longs(values) -> Column:
    """Literal ``array<bigint>`` via one parsed SQL expression (see
    ``lit_doubles``). MIN_LONG can't be written directly — the parser
    reads the positive magnitude first, which overflows — so it is
    spelled as an expression."""
    def _l(x) -> str:
        x = int(x)
        if x == -(1 << 63):
            return "(-9223372036854775807L - 1L)"
        return f"{x}L"

    return F.expr("array(" + ",".join(_l(x) for x in values) + ")")


def bind(value: Column, body) -> Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE per row
    and pass it to ``body`` as a lambda variable.

    Why: composing Column helpers inlines the argument expression at every
    reference — ``simhash`` naively recomputes its per-token hash array 32
    times (once per bit), turning O(tokens) into O(32*tokens) md5 calls,
    and Catalyst's CollapseProject can undo a materializing select. A
    higher-order-function lambda variable is evaluated once, giving real
    let semantics inside a single expression tree.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
