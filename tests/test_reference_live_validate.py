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
