"""Regression guards on physical-plan properties the engine promises
(SURVEY §7 hard-part (e), §4.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schisma_spark.image.fixtures import images_schema_dsl, images_table


@pytest.fixture(scope="module")
def img_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("imgs") / "t")
    images_table(spark, 200, seed=42).write.parquet(p)
    return p


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_stats_path_never_reads_bytes(spark, img_parquet):
    df = spark.read.parquet(img_parquet)
    sch = images_schema_dsl()
    verd = sch.validate(df, keys=["image_id", "part"],
                        ignore_unexpected=True).verdicts(["part"])
    plan = _plan(verd)
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and all("bytes" not in l for l in read), \
        "stats path must not read the payload column"


def test_violations_filter_below_explode(spark, img_parquet):
    # Catalyst infers size(viols)>0 under the Generate: clean rows are
    # filtered before the explode (verified once in /verify; guard it)
    df = spark.read.parquet(img_parquet)
    sch = images_schema_dsl()
    v = sch.validate(df, keys=["image_id"], ignore_unexpected=True).violations
    plan = _plan(v)
    assert "Generate explode" in plan or "Generate" in plan
    assert "size(" in plan  # inferred pre-filter present


def test_validate_single_scan_no_shuffle(spark, img_parquet):
    df = spark.read.parquet(img_parquet)
    sch = images_schema_dsl()
    v = sch.validate(df, keys=["image_id"], ignore_unexpected=True).violations
    plan = _plan(v)
    assert "Exchange" not in plan, "row validation must be shuffle-free"
    assert plan.count("Scan parquet") == 1


def test_resume_pruning_pushes_in_filter(spark, img_parquet):
    df = spark.read.parquet(img_parquet)
    pruned = df.where(F.col("part").isin([0, 1, 2]))
    plan = _plan(pruned)
    assert "PushedFilters: [In(part" in plan


def test_verdicts_count_is_struct_free(spark, img_parquet):
    # r2: the verdict/stats aggregate uses the threaded integer count, so
    # the plan contains NO violation-struct construction (higher-order
    # filter()/struct() are CodegenFallback and disabled whole-stage
    # codegen; measured 3.4x slower at 40M rows)
    df = spark.read.parquet(img_parquet)
    sch = images_schema_dsl()
    verd = sch.validate(df, keys=["image_id", "part"],
                        ignore_unexpected=True).verdicts(["part"])
    plan = verd._jdf.queryExecution().executedPlan().toString()
    assert "lambdafunction" not in plan and "missing key" not in plan, \
        "verdict aggregate must not build violation structs"


def test_count_column_matches_struct_size(spark, img_parquet):
    # the codegen count and the struct array must agree row-by-row
    from pyspark.sql import functions as F

    df = spark.read.parquet(img_parquet)
    sch = images_schema_dsl()
    res = sch.validate(df, keys=["image_id", "part"], ignore_unexpected=True)
    assert res.nviols_col is not None
    bad = df.select(
        F.size(res.viols_col).alias("a"), res.nviols_col.alias("b")
    ).where(F.col("a") != F.col("b")).count()
    assert bad == 0


def test_lsh_self_join_not_cartesian(spark):
    """cosine_near_dups / lsh_ann_topk candidate generation must join on
    (table_id, bucket) — never a cartesian/broadcast-nested-loop over the
    vector table (the O(N^2) shape the LSH exists to avoid)."""
    from pyspark.sql import Row
    from schisma_spark.functions.similarity import (
        cosine_near_dups, lsh_ann_topk,
    )

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 7), 1.0, 0.5, 0.25])
         for i in range(50)]
    )
    nd = cosine_near_dups(emb, "vec_id", "embedding", dim=4, threshold=0.99,
                          n_tables=2, n_planes=2)
    plan = nd._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    topk = lsh_ann_topk(emb, emb.where(F.col("vec_id") % 10 == 0),
                        "vec_id", "embedding", dim=4, k=3,
                        n_tables=2, n_planes=2)
    plan2 = topk._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_ivf_join_not_cartesian(spark):
    """ivf_ann_topk candidates must join on the cell key — assignment is a
    pure projection against literal centroids (no join at all), and the
    probe-cell join is an equi-join, never cartesian/nested-loop."""
    from pyspark.sql import Row
    from schisma_spark.functions.similarity import ivf_ann_topk

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 7), 1.0, 0.5, 0.25])
         for i in range(60)]
    )
    out = ivf_ann_topk(emb, emb.where(F.col("vec_id") % 10 == 0),
                       "vec_id", "embedding", dim=4, k=3,
                       n_centroids=4, n_probe=2, sample_mod=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_text_near_dup_plans_not_cartesian(spark):
    """r5: every banded near-dup operator must stay an equi-join on its
    band keys end to end — a refactor that loses the join keys would
    silently plan a cartesian / nested-loop and only blow up at scale."""
    from pyspark.sql import Row
    from schisma_spark.functions.dedup import (
        containment_near_dups, hamming_near_dups, minhash_near_dups,
        simhash64_near_dups, simhash_near_dups,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"the quick brown fox number {i} jumps over "
                            f"the lazy dog {i % 3}") for i in range(30)]
    )
    sigs = spark.createDataFrame(
        [Row(id=i, sig=(i * 7919) % (1 << 32)) for i in range(30)]
    )
    plans = {
        "minhash": minhash_near_dups(docs, "text", "doc_id",
                                     threshold=0.5),
        "simhash32": simhash_near_dups(docs, "text", "doc_id"),
        "simhash64": simhash64_near_dups(docs, "text", "doc_id"),
        "hamming": hamming_near_dups(sigs, "sig", "id", max_hamming=3),
        "containment": containment_near_dups(docs, "text", "doc_id",
                                             max_doc_freq=8),
    }
    for name, out in plans.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_incremental_dedup_plan_not_cartesian(spark):
    """r6: the batch-vs-corpus candidate join must stay an equi-join on
    (band_idx, band_hash) and the decision join on new_id — the whole
    point of the incremental shape is that NOTHING scales with
    |corpus| x |batch|."""
    from pyspark.sql import Row
    from schisma_spark.functions.dedup import (
        incremental_dedup, minhash_signatures_df,
    )

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"the quick brown fox number {i} jumps over "
                            f"the lazy dog while the animals watch")
         for i in range(25)]
    )
    batch = spark.createDataFrame(
        [Row(doc_id=1000 + i, text=f"the quick brown fox number {i} jumps "
                                   f"over the lazy dog while the animals "
                                   f"watch") for i in range(5)]
    )
    sigs = minhash_signatures_df(corpus, "text", "doc_id")
    out = incremental_dedup(batch, sigs, "text", "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_plans_not_cartesian(spark):
    """r5: the composed curation pipelines (text + embedding) inherit the
    near-dup join shapes — guard the whole composition too."""
    from pyspark.sql import Row
    from schisma_spark.functions.curate import (
        curation_keep_list, embedding_keep_list,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"the quick brown fox number {i} jumps over "
                            f"the lazy dog while the other animals watch")
         for i in range(25)]
    )
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 5), 1.0, 0.5, 0.25])
         for i in range(25)]
    )
    for name, out in {
        "text": curation_keep_list(docs, threshold=0.5),
        "embedding": embedding_keep_list(emb, "vec_id", "embedding",
                                         dim=4, n_tables=2, n_planes=2),
    }.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_decontaminate_and_boilerplate_plans_equi_join(spark):
    """r6: decontaminate's eval-set membership and strip_boilerplate's
    boilerplate-set anti-join must plan as equi-joins (hash/broadcast-
    hash), never cartesian/nested-loop — the corpus side is 10^12 rows
    at the design point, the set side is small by construction."""
    from pyspark.sql import Row
    from schisma_spark.functions.dedup import decontaminate
    from schisma_spark.functions.text import strip_boilerplate

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"the quick brown fox number {i} jumps over "
                            f"the lazy dog\nAll rights reserved.")
         for i in range(30)]
    )
    ev = spark.createDataFrame(
        [Row(text="the quick brown fox number 3 jumps over the lazy dog")]
    )
    for name, out in {
        "decontaminate": decontaminate(docs, ev, "text", "doc_id"),
        "boilerplate": strip_boilerplate(docs, "text", "doc_id",
                                         min_docs=10),
    }.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pack_chunk_single_exchange_no_global_window(spark):
    """r6: chunk packing must plan exactly ONE exchange (hash by shard)
    and its window must partition by shard — a global (unpartitioned)
    window would funnel 10^12 rows through one task at the design
    point."""
    from pyspark.sql import Row
    from schisma_spark.functions.pack import pack_sequences

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"some words here number {i} padded out")
         for i in range(50)]
    )
    out = pack_sequences(docs, budget=16, n_shards=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan
    assert "Exchange rangepartitioning" not in plan
    window_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert window_lines and all("shard" in ln for ln in window_lines)


def test_vocab_topk_and_weighted_sample_plan_shapes(spark):
    """r6 ledger claims, asserted: vocab_stats' top-k plans
    TakeOrderedAndProject (per-partition top-k, never a global sort
    task) and weighted_sample is a shuffle-free filter projection."""
    from pyspark.sql import Row
    from schisma_spark.functions.curate import weighted_sample
    from schisma_spark.functions.text import vocab_stats

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta token{i % 7}", source=f"s{i % 3}")
         for i in range(40)]
    )
    vplan = (vocab_stats(docs, top_k=5)
             ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in vplan
    assert "Exchange rangepartitioning" not in vplan   # no global sort

    wplan = (weighted_sample(docs, {"s0": 0.5})
             ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in wplan
