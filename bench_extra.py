"""r7 auxiliary benchmarks (guide §1.4) — NOT part of the driver contract.

Isolates the expensive operators with the noop sink (computation timed,
sink excluded), splits DataFrame-construction from execution wall, and —
when a round-start worktree exists at ``$SPARK_GRAFT_OLD_TREE`` (default
/tmp/r6tree) — runs interleaved same-session A/Bs of the round's changed
operators against their round-start implementations (the CLAUDE.md
weather discipline: compare ratios inside ONE session, never absolute
walls across sessions).

Usage: python -u bench_extra.py [noop] [ab]
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from schisma_spark.session import build_session  # noqa: E402
from schisma_spark.sources import fan_out  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OLD_TREE = os.environ.get("SPARK_GRAFT_OLD_TREE", "/tmp/r6tree")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, n=3):
    fn()
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        d = time.perf_counter() - t0
        best = d if best is None else min(best, d)
    print(f"{name:36s} {best:6.2f}s", flush=True)
    return best


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[modname] = m
    spec.loader.exec_module(m)
    return m


def main():
    what = set(sys.argv[1:]) or {"noop", "ab"}
    spark = build_session(app="bench-extra-r7", master=f"local[{CPUS}]",
                          arrow_batch_rows=4096)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dfo = fan_out(docs)

    if "noop" in what:
        print("== noop-sink isolation (computation only) ==", flush=True)
        from schisma_spark.functions.dedup import (
            minhash_near_dups, simhash64_near_dups, word_shingles,
        )
        from schisma_spark.functions.portable import hash32
        from schisma_spark.functions.similarity import cosine_near_dups

        hs = F.array_distinct(
            F.transform(word_shingles(F.col("text"), 3), lambda s: hash32(s)))
        timed("md5 shingle projection",
              lambda: _noop(dfo.select("doc_id", hs.alias("hs"))))
        timed("minhash_near_dups",
              lambda: _noop(minhash_near_dups(
                  dfo, "text", "doc_id", threshold=0.2, n_hashes=16,
                  bands=4)))
        timed("simhash64_near_dups",
              lambda: _noop(simhash64_near_dups(
                  dfo, "text", "doc_id", max_hamming=3)))
        e2 = fan_out(emb.select("vec_id", "embedding"))
        timed("cosine_near_dups",
              lambda: _noop(cosine_near_dups(
                  e2, "vec_id", "embedding", 64, 0.99, n_tables=8,
                  n_planes=6)))
        from schisma_spark import schema, Field
        from schisma_spark.dsl import Null
        from schisma_spark.variant_validate import validate_variant

        eid = F.col("event_id")
        vev = fan_out(ev.select(
            "event_id",
            F.when(eid % 7 == 0, F.lit('{"k": "bad"}'))
            .when(eid % 11 == 0, F.lit("{}"))
            .when(eid % 13 == 0, F.lit('{"k": null}'))
            .otherwise(F.col("props")).alias("payload")))
        sch = schema({"k": Field(typeof=[float, Null])})
        timed("validate_variant violations",
              lambda: _noop(validate_variant(
                  vev, "payload", sch, keys=["event_id"]).violations))

    if "ab" in what and os.path.isdir(OLD_TREE):
        print(f"== interleaved A/B vs {OLD_TREE} (ratio <1 = r7 faster) ==",
              flush=True)
        old_d = _load("r6_dedup", f"{OLD_TREE}/schisma_spark/functions/dedup.py")
        old_s = _load("r6_sim", f"{OLD_TREE}/schisma_spark/functions/similarity.py")
        old_v = _load("r6_vv", f"{OLD_TREE}/schisma_spark/variant_validate.py")
        old_r = _load("r6_rec", f"{OLD_TREE}/schisma_spark/recursive_validate.py")
        import schisma_spark.functions.dedup as new_d
        import schisma_spark.functions.similarity as new_s
        import schisma_spark.recursive_validate as new_r
        import schisma_spark.variant_validate as new_v
        from schisma_spark import schema, Field
        from schisma_spark.dsl import Null

        e2 = fan_out(emb.select("vec_id", "embedding"))
        probes = e2.where(F.col("vec_id") % 50 == 0)
        k = F.from_json(F.col("props"), "map<string,bigint>")["k"]
        doc = F.format_string(
            '{"name":"n","children":[{"name":%s}]}',
            F.when(k % 3 == 0, k.cast("string")).otherwise(F.lit('"c"')))
        rv_in = fan_out(ev.select("event_id", doc.alias("doc")))
        eid = F.col("event_id")
        vev = fan_out(ev.select(
            "event_id",
            F.when(eid % 7 == 0, F.lit('{"k": "bad"}'))
            .otherwise(F.col("props")).alias("payload")))
        sch = schema({"k": Field(typeof=[float, Null])})

        def pairs_hp(m):
            dups = dfo.select("doc_id", "text").where(
                F.col("doc_id") % 25 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text")
            aug = dfo.select("doc_id", "text").unionByName(dups)
            sig = F.when(F.col("doc_id") % 41 == 0,
                         F.lit(None).cast("long")).otherwise(
                m.simhash64(F.col("text")))
            s = aug.select(F.col("doc_id").cast("long").alias("doc_id"),
                           sig.alias("sig"))
            return m.hamming_near_dups(s.where(F.col("sig").isNotNull()),
                                       "sig", "doc_id", max_hamming=3)

        cases = {
            "cc_chain (signature graph)": (
                lambda: old_d.connected_components(pairs_hp(old_d)).collect(),
                lambda: new_d.connected_components(pairs_hp(new_d)).collect()),
            "cosine_near_dups": (
                lambda: old_s.cosine_near_dups(
                    e2, "vec_id", "embedding", 64, 0.99, n_tables=8,
                    n_planes=6).collect(),
                lambda: new_s.cosine_near_dups(
                    e2, "vec_id", "embedding", 64, 0.99, n_tables=8,
                    n_planes=6).collect()),
            "lsh_ann_topk": (
                lambda: old_s.lsh_ann_topk(
                    e2, probes, "vec_id", "embedding", dim=64, k=5,
                    n_tables=8, n_planes=3).collect(),
                lambda: new_s.lsh_ann_topk(
                    e2, probes, "vec_id", "embedding", dim=64, k=5,
                    n_tables=8, n_planes=3).collect()),
            "validate_variant": (
                lambda: old_v.validate_variant(
                    vev, "payload", sch,
                    keys=["event_id"]).violations.collect(),
                lambda: new_v.validate_variant(
                    vev, "payload", sch,
                    keys=["event_id"]).violations.collect()),
            "recursive_validate": (
                lambda: old_r.validate_json_recursive(
                    rv_in, "doc", {"name": str}, keys=["event_id"]).count(),
                lambda: new_r.validate_json_recursive(
                    rv_in, "doc", {"name": str}, keys=["event_id"]).count()),
        }
        for name, (o, n) in cases.items():
            o()
            n()
        for _rep in range(3):
            for name, (o, n) in cases.items():
                t0 = time.perf_counter(); n(); tn = time.perf_counter() - t0
                t0 = time.perf_counter(); o(); to = time.perf_counter() - t0
                print(f"{name:30s} old={to:5.2f}s new={tn:5.2f}s "
                      f"ratio={tn / to:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
