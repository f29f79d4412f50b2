"""Result codes and the violation-row schema.

Mirrors the reference's ``SchismaResult`` error-object model
(/root/reference/src/schisma_result.mjs:12-57): the same eight codes, the
same ``isProblem`` partition (/root/reference/src/schisma_result.mjs:25-33).
Where the reference materializes one JS object per result, we emit one
DataFrame **row** per violation with the same fields flattened
(``code, where, expected, received, value, message, type_index``), plus the
row key the violation belongs to.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Codes — byte-identical strings to /root/reference/src/schisma_result.mjs:34-57
UNHANDLED = "unhandled"
PARTIAL_MATCH = "partial match"
EXACT_MATCH = "exact match"
NO_MATCH = "no match"
UNEXPECTED_KEY = "unexpected key"
MISSING_KEY = "missing key"
INVALID = "invalid"
VALID = "valid"

#: codes that count as errors — /root/reference/src/schisma_result.mjs:25-33
PROBLEM_CODES = (PARTIAL_MATCH, NO_MATCH, UNEXPECTED_KEY, MISSING_KEY, INVALID)

#: struct carried per violation while still packed in an array column.
#: ``value`` and ``received`` are stringified (violations are heterogeneous).
VIOLATION_STRUCT = T.StructType(
    [
        T.StructField("code", T.StringType(), False),
        T.StructField("where", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
        T.StructField("received", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("type_index", T.IntegerType(), True),
    ]
)

#: full violation-row schema once exploded (key columns prepended by caller).
VIOLATION_SCHEMA = VIOLATION_STRUCT

VIOLATION_FIELDS = [f.name for f in VIOLATION_STRUCT.fields]
