"""LIVE reference-run parity for VALIDATE: run the actual reference
engine (node) on planted documents and compare violation (code, where)
pairs against the engine's dynamic-typing path (``validate_variant``) —
complementing the static goldens with a live execution.

Compared on (code, where) only: the engine fills ``expected`` on type
NO_MATCH rows where the reference's class-check path leaves it undefined
(documented benign divergence, SURVEY §8). Skipped without node.
"""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest
from pyspark.sql import Row

from schisma_spark import Field, schema
from schisma_spark.variant_validate import validate_variant

REF = "/root/reference/src/schisma.mjs"

NODE_SCRIPT = """
import(%r).then(m => {
  const schisma = m.default
  const sch = schisma({
    a: Number,
    b: String,
    c: { d: Boolean },
  })
  const inputs = %s
  for (const o of inputs) {
    const errs = sch.validate(o).map(e => ({code: e.code, where: e.where}))
    console.log(JSON.stringify(errs))
  }
})
"""

INPUTS = [
    {"a": 1, "b": "x", "c": {"d": True}},                  # clean
    {"a": "no", "b": "x", "c": {"d": True}},               # type no match
    {"b": "x", "c": {"d": True}},                          # missing a
    {"a": 1, "b": "x", "c": {}},                           # missing nested d
    {"a": 1, "b": "x", "c": {"d": False, "zz": 1}},        # nested unexpected
    {"a": 1, "b": "x", "c": {"d": 0}},                     # nested no match
    {"a": 1, "b": "x", "c": {"d": True}, "junk": 2},       # root unexpected
    {"a": [], "b": 5, "c": {"d": "s"}},                    # multiple
]


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_validate_variant_matches_live_reference_run(spark):
    script = NODE_SCRIPT % (REF, json.dumps(INPUTS))
    out = subprocess.run(["node", "-e", script], capture_output=True,
                         text=True, timeout=60, check=True)
    ref = [sorted((e["code"], e["where"]) for e in json.loads(line))
           for line in out.stdout.strip().splitlines()]
    assert len(ref) == len(INPUTS)

    sch = schema({"a": float, "b": str, "c": {"d": bool}})
    df = spark.createDataFrame(
        [Row(id=i, p=json.dumps(o)) for i, o in enumerate(INPUTS)]
    )
    res = validate_variant(df, "p", sch, keys=["id"])
    got: dict[int, list] = {i: [] for i in range(len(INPUTS))}
    for r in res.violations.collect():
        got[r["id"]].append((r["code"], r["where"]))
    for i in range(len(INPUTS)):
        assert sorted(got[i]) == ref[i], \
            f"input {i} {INPUTS[i]}: engine={sorted(got[i])} ref={ref[i]}"


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_validate_randomized_regex_key_sweep(spark):
    """r3 VERDICT #7: seeded randomized VALIDATE sweep incl. ``$/``-regex
    keys (reference runtime loop schisma.mjs:256-295) against a LIVE
    reference run — 60 documents, fixed+regex schema, per-key
    best-of-matching-patterns, cross-pattern keys, JSON nulls, junk keys.
    Compared on sorted (code, where) pairs per document."""
    import random

    script = """
import(%r).then(m => {
  const schisma = m.default
  const sch = schisma({
    a: Number,
    "$/^x_": [Number, Boolean],
    "$/_s$": [String],
  })
  const inputs = %s
  for (const o of inputs) {
    const errs = sch.validate(o).map(e => ({code: e.code, where: e.where}))
    console.log(JSON.stringify(errs))
  }
})
"""
    rng = random.Random(13)
    val_pool = [0, 7, -2.5, "txt", "", True, False, None]
    key_pool = ["x_1", "x_2", "x_9", "foo_s", "bar_s", "x_a_s",  # x_a_s
                "zz", "junk"]  # matches BOTH patterns; zz/junk match none
    inputs = []
    for _ in range(60):
        o = {}
        if rng.random() < 0.8:
            o["a"] = rng.choice(val_pool)
        for k in key_pool:
            if rng.random() < 0.35:
                o[k] = rng.choice(val_pool)
        inputs.append(o)

    out = subprocess.run(["node", "-e", script % (REF, json.dumps(inputs))],
                         capture_output=True, text=True, timeout=120,
                         check=True)
    ref = [sorted((e["code"], e["where"]) for e in json.loads(line))
           for line in out.stdout.strip().splitlines()]
    assert len(ref) == len(inputs)
    # non-vacuous: the seeded corpus must actually exercise violations
    assert sum(1 for r in ref if r) >= 15
    assert {c for r in ref for c, _ in r} >= {"no match", "missing key",
                                              "unexpected key"}

    sch = schema({"a": float, "$/^x_": [Field(typeof=[float, bool])],
                  "$/_s$": [str]})
    df = spark.createDataFrame(
        [Row(id=i, p=json.dumps(o)) for i, o in enumerate(inputs)]
    )
    res = validate_variant(df, "p", sch, keys=["id"])
    got: dict[int, list] = {i: [] for i in range(len(inputs))}
    for r in res.violations.collect():
        got[r["id"]].append((r["code"], r["where"]))
    mismatches = [
        (i, inputs[i], sorted(got[i]), ref[i])
        for i in range(len(inputs)) if sorted(got[i]) != ref[i]
    ]
    assert not mismatches, mismatches[:5]


@pytest.mark.skipif(shutil.which("node") is None, reason="node unavailable")
def test_create_matches_live_reference_run():
    """create() parity against a live reference run, both option settings
    (populateArrays toggles default instances inside arrays). Driver-side
    only — no Spark."""
    script = """
import(%r).then(m => {
  const schisma = m.default
  const sch = schisma({
    a: Number,
    b: { bA: String, bB: [Boolean] },
    c: [ { cA: Number } ],
  })
  console.log(JSON.stringify(sch.create({})))
  console.log(JSON.stringify(sch.create({populateArrays: true})))
})
""" % REF
    out = subprocess.run(["node", "-e", script], capture_output=True,
                         text=True, timeout=60, check=True)
    plain, populated = [json.loads(line)
                        for line in out.stdout.strip().splitlines()]

    sch = schema({"a": float, "b": {"bA": str, "bB": [bool]},
                  "c": [{"cA": float}]})
    assert sch.create() == plain
    assert sch.create(populate_arrays=True) == populated
