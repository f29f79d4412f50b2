"""r7 profiling harness: per-query construction vs execution walls, job
counts, and piecewise stage timings for the heavy bench rows.

Usage: python -u tools/profile_r07.py [section ...]
Sections: cc curation recursive variant minhash containment misc fanout
(default: all). One Spark session (CLAUDE.md: never two concurrent).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schisma_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

spark = build_session(app="profile-r07", master=f"local[{CPUS}]",
                      arrow_batch_rows=4096)
sc = spark.sparkContext
tracker = sc.statusTracker()


def timed(name, build_fn, n=3, warm=True):
    """Time DataFrame CONSTRUCTION and EXECUTION separately; count jobs."""
    if warm:
        build_fn().collect()
    best_b, best_e, jobs = None, None, None
    for i in range(n):
        g = f"{name}-{i}"
        sc.setJobGroup(g, name)
        t0 = time.perf_counter()
        df = build_fn()
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        jb = len(tracker.getJobIdsForGroup(g))
        sc.setJobGroup("", "")
        b, e = t1 - t0, t2 - t1
        if best_e is None or (b + e) < (best_b + best_e):
            best_b, best_e, jobs = b, e, jb
    print(f"{name:42s} build={best_b:6.3f}s exec={best_e:6.3f}s "
          f"jobs={jobs}", flush=True)
    return best_b, best_e


def probe():
    t0 = time.perf_counter()
    (spark.range(0, 320_000_000, 1, CPUS * 2)
     .select(F.shiftright(F.xxhash64("id"), 24).alias("h"))
     .agg(F.sum("h")).collect())
    print(f"probe: {time.perf_counter()-t0:.3f}s", flush=True)


def main():
    sections = set(sys.argv[1:]) or {
        "cc", "curation", "recursive", "variant", "minhash",
        "containment", "misc", "fanout"}

    import __spark_entry__ as entry

    Q = entry.queries()

    def q(name):
        fn = Q[name]
        return lambda: fn(spark, SF_DIR)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"documents rows={docs.count()}", flush=True)

    if "fanout" in sections:
        from schisma_spark.sources import fan_out
        t0 = time.perf_counter()
        for _ in range(5):
            fan_out(docs.select("doc_id", "text"))
        print(f"fan_out construction x5: {time.perf_counter()-t0:.3f}s",
              flush=True)

    if "cc" in sections:
        from schisma_spark.functions.dedup import (
            connected_components, minhash_near_dups,
        )
        # pairs alone vs CC(pairs)
        timed("minhash_near_dups(q)", q("minhash_near_dups"))
        stats = {}

        def cc():
            pairs = minhash_near_dups(
                entry.fan_out(docs), "text", "doc_id", threshold=0.2,
                n_hashes=16, bands=4)
            return connected_components(pairs, stats_out=stats)
        timed("dedup_clusters(q)", cc)
        print(f"  cc rounds={stats.get('rounds')}", flush=True)

        # CC on tiny precomputed pairs (isolates round overhead)
        pre = minhash_near_dups(entry.fan_out(docs), "text", "doc_id",
                                threshold=0.2, n_hashes=16, bands=4).collect()
        pre_df = spark.createDataFrame(pre)
        timed("cc_only(precomputed_pairs)",
              lambda: connected_components(pre_df))

    if "curation" in sections:
        probe()
        timed("curation_keep_list(q)", q("curation_keep_list"))
        timed("signature_curation(q)", q("signature_curation"))
        timed("embedding_curation(q)", q("embedding_curation"))
        timed("embedding_decontaminate(q)", q("embedding_decontaminate"))

    if "curparts" in sections:
        probe()
        from schisma_spark.functions.dedup import (
            connected_components, hamming_near_dups, simhash64,
        )
        from schisma_spark.functions.similarity import (
            cosine_near_dups, valid_vector,
        )
        from schisma_spark.sources import fan_out

        # --- signature_curation internals (entry body replicated) ---
        d = fan_out(docs.select("doc_id", "text"))
        dups = d.where(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text")
        aug = d.unionByName(dups)
        sigc = F.when(F.col("doc_id") % 41 == 0,
                      F.lit(None).cast("long")).otherwise(
            simhash64(F.col("text")))

        def sig_df():
            return aug.select(F.col("doc_id").cast("long").alias("doc_id"),
                              sigc.alias("sig"))
        timed("sig: simhash64 projection", lambda: sig_df())
        timed("sig: hamming_near_dups pairs",
              lambda: hamming_near_dups(
                  sig_df().where(F.col("sig").isNotNull()), "sig", "doc_id",
                  max_hamming=3))
        pre = hamming_near_dups(
            sig_df().where(F.col("sig").isNotNull()), "sig", "doc_id",
            max_hamming=3).collect()
        pre_df = spark.createDataFrame(pre)
        print(f"  sig pairs={len(pre)}", flush=True)
        timed("sig: cc(pre pairs)", lambda: connected_components(pre_df))

        # --- embedding_curation internals ---
        emb = fan_out(spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
                      .select("vec_id", "embedding"))
        edups = emb.where(F.col("vec_id") % 25 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        eaug = emb.unionByName(edups)
        print(f"  embeddings rows={emb.count()}", flush=True)
        timed("emb: cosine_near_dups pairs",
              lambda: cosine_near_dups(
                  eaug.where(valid_vector(F.col("embedding"))),
                  "vec_id", "embedding", 64, 0.99, n_tables=8, n_planes=6))
        epre = cosine_near_dups(
            eaug.where(valid_vector(F.col("embedding"))),
            "vec_id", "embedding", 64, 0.99, n_tables=8,
            n_planes=6).collect()
        print(f"  emb pairs={len(epre)}", flush=True)
        epre_df = spark.createDataFrame(epre)
        timed("emb: cc(pre pairs)", lambda: connected_components(epre_df))

    if "recursive" in sections:
        timed("recursive_validate(q)", q("recursive_validate"))

    if "variant" in sections:
        timed("validate_variant_events(q)", q("validate_variant_events"))
        timed("incremental_validate(q)", q("incremental_validate"))
        timed("conform_variant_events(q)", q("conform_variant_events"))
        timed("conform_json_events(q)", q("conform_json_events"))

    if "containment" in sections:
        timed("containment_near_dups(q)", q("containment_near_dups"))

    if "minhash" in sections:
        timed("lsh_ann_topk(q)", q("lsh_ann_topk"))
        timed("remove_dup_spans(q)", q("remove_dup_spans"))
        timed("dup_spans(q)", q("dup_spans"))
        timed("strip_boilerplate(q)", q("strip_boilerplate"))

    if "misc" in sections:
        timed("seq_gaps_lineitem(q)", q("seq_gaps_lineitem"))
        timed("bigram_logprob(q)", q("bigram_logprob"))
        timed("decontaminate_pairs(q)", q("decontaminate_pairs"))
        timed("corpus_diff(q)", q("corpus_diff"))
        timed("domain_psl(q)", q("domain_psl"))

    spark.stop()


if __name__ == "__main__":
    main()
