"""Capture .explain('formatted') for the r7-touched queries.

Usage: python tools/capture_plans_r07.py <repo_root> <out_dir> <suffix>
e.g.   python tools/capture_plans_r07.py /tmp/r6tree plans/r07 before
       python tools/capture_plans_r07.py /root/repo plans/r07 after

Runs ONE Spark session; writes <out_dir>/<query>_<suffix>.txt. For the
iterative operators (connected_components-based) the captured plan is the
returned labels frame plus the pair-generation stage the loop consumes —
the loop itself is imperative and its structure is described in
OPTIMIZATION_r07.md.
"""

from __future__ import annotations

import io
import os
import sys

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from schisma_spark.session import build_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "minhash_near_dups", "containment_near_dups", "simhash_near_dups",
    "simhash64_near_dups", "cosine_near_dups", "lsh_ann_topk",
    "ivf_ann_topk", "ann_topk", "embedding_decontaminate",
    "validate_variant_events", "recursive_validate",
    "dedup_clusters", "curation_keep_list", "signature_curation",
    "embedding_curation", "incremental_validate", "remove_dup_spans",
    "dup_spans", "strip_boilerplate", "image_decode_psnr",
]


def main():
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app=f"plans-{suffix}", master="local[32]",
                          arrow_batch_rows=4096)
    entry_path = os.path.join(repo, "__spark_entry__.py")
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    Q = entry.queries()

    def explain_str(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    for name in QUERIES:
        if name == "image_decode_psnr":
            # bench-local shape: decode over the cached image table
            cache = os.path.join(repo, ".bench_cache")
            import glob

            cands = sorted(glob.glob(os.path.join(cache, "images_*_p16")))
            if not cands:
                continue
            from schisma_spark.image.decode import decode_validate

            imgs = spark.read.parquet(cands[-1])
            df = decode_validate(imgs).agg(
                F.sum(F.col("decode_ok").cast("long")),
                F.sum(F.col("pixels_ok").cast("long")))
        elif name not in Q:
            continue
        else:
            try:
                df = Q[name](spark, SF)
            except Exception as e:  # pragma: no cover
                print(f"SKIP {name}: {e}", flush=True)
                continue
        try:
            txt = explain_str(df)
        except Exception as e:  # pragma: no cover
            print(f"EXPLAIN-FAIL {name}: {e}", flush=True)
            continue
        with io.open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
