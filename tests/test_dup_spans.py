"""Cross-document duplicated-span coverage (dedup.dup_spans).

Hand-computed layouts plus a pure-Python interval-union replay: the
operator's lag-based union increment must equal the brute-force
"mark every covered token" count on every doc.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from schisma_spark.functions.dedup import dup_spans


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_dup_spans_hand_layout(spark):
    # k=3: d1/d2 share "c d e" and "d e f" (positions 2..4 in d1, 0..2
    # in d2); d3 is unique; d4 repeats a span INTERNALLY only (must not
    # be flagged — cross-doc means distinct docs).
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g"),
        Row(doc_id=2, text="c d e f x y"),
        Row(doc_id=3, text="p q r s t u"),
        Row(doc_id=4, text="m n o m n o m n o"),
    ])
    got = _rows(dup_spans(df, "text", "doc_id", k=3, min_docs=2))
    # d1: dup windows at pos 2 ("c d e") and 3 ("d e f") -> union covers
    # tokens 2..5 = 4 tokens
    assert got[1]["n_words"] == 7 and got[1]["n_windows"] == 5
    assert got[1]["n_dup_windows"] == 2 and got[1]["dup_tokens"] == 4
    assert abs(got[1]["dup_token_frac"] - 4 / 7) < 1e-6
    # d2: dup windows at pos 0, 1 -> tokens 0..3 = 4 of 6
    assert got[2]["n_dup_windows"] == 2 and got[2]["dup_tokens"] == 4
    # d3: clean
    assert got[3]["n_dup_windows"] == 0 and got[3]["dup_tokens"] == 0
    assert got[3]["dup_token_frac"] == 0.0
    # d4: internal repetition only -> count_distinct(doc)=1, not flagged
    assert got[4]["n_dup_windows"] == 0


def test_dup_spans_every_row_contract(spark):
    # NULL text, blank text, and text shorter than k all keep their row
    # with zeros
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="   "),
         Row(doc_id=3, text="a b")],
        "doc_id int, text string",
    )
    got = _rows(dup_spans(df, "text", "doc_id", k=3))
    assert set(got) == {1, 2, 3}
    for d in (1, 2):
        assert got[d]["n_words"] == 0 and got[d]["n_windows"] == 0
        assert got[d]["dup_token_frac"] == 0.0
    assert got[3]["n_words"] == 2 and got[3]["n_windows"] == 0


def test_dup_spans_union_matches_bruteforce(spark):
    # Deterministic pseudo-random corpus over a tiny vocab (lots of
    # overlapping collisions), replayed in pure Python with per-token
    # marking — validates the lag-based interval-union math.
    vocab = ["a", "b", "c", "d"]
    texts = {}
    state = 1
    for doc in range(12):
        n = 5 + (doc * 7) % 9
        toks = []
        for _ in range(n):
            state = (state * 1103515245 + 12345) % (2 ** 31)
            toks.append(vocab[state % len(vocab)])
        texts[doc] = " ".join(toks)
    k = 3
    wins = {d: [" ".join(t.split()[i:i + k])
                for i in range(len(t.split()) - k + 1)]
            for d, t in texts.items()}
    docs_per_win = {}
    for d, ws in wins.items():
        for w in set(ws):
            docs_per_win.setdefault(w, set()).add(d)
    expect = {}
    for d, ws in wins.items():
        covered = set()
        ndw = 0
        for i, w in enumerate(ws):
            if len(docs_per_win[w]) >= 2:
                ndw += 1
                covered.update(range(i, i + k))
        expect[d] = (ndw, len(covered))

    df = spark.createDataFrame(
        [Row(doc_id=d, text=t) for d, t in texts.items()])
    got = _rows(dup_spans(df, "text", "doc_id", k=k, min_docs=2))
    for d, (ndw, cov) in expect.items():
        assert got[d]["n_dup_windows"] == ndw, d
        assert got[d]["dup_tokens"] == cov, d


def test_dup_spans_native_hasher_same_verdicts(spark):
    # 64-bit native hasher must produce identical flags on a
    # collision-free corpus
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g"),
        Row(doc_id=2, text="c d e f x y"),
        Row(doc_id=3, text="p q r s t u"),
    ])
    p = _rows(dup_spans(df, "text", "doc_id", k=3, hasher="portable"))
    n = _rows(dup_spans(df, "text", "doc_id", k=3, hasher="native"))
    assert p == n


def test_dup_spans_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d")], "doc_id int, text string")
    plan = dup_spans(df, "text", "doc_id", k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_remove_dup_spans_hand_layout(spark):
    from schisma_spark.functions.dedup import remove_dup_spans

    # d1/d2 share "c d e"/"d e f" (k=3): d1 loses tokens 2..5, d2 0..3
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e f g"),
        Row(doc_id=2, text="c d e f x y"),
        Row(doc_id=3, text="p q r s t u"),
        Row(doc_id=4, text=None),
    ], "doc_id int, text string")
    got = _rows(remove_dup_spans(df, "text", "doc_id", k=3, min_docs=2))
    assert got[1]["clean_text"] == "a b g" and got[1]["n_removed"] == 4
    assert got[2]["clean_text"] == "x y" and got[2]["n_removed"] == 4
    assert got[3]["clean_text"] == "p q r s t u"
    assert got[3]["n_removed"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_tokens"] == 0


def test_remove_dup_spans_consistent_with_dup_spans(spark):
    # n_removed must equal dup_spans' dup_tokens on the same corpus
    from schisma_spark.functions.dedup import dup_spans, remove_dup_spans

    vocab = ["a", "b", "c", "d"]
    state, rows = 7, []
    for doc in range(15):
        n = 4 + (doc * 5) % 11
        toks = []
        for _ in range(n):
            state = (state * 1103515245 + 12345) % (2 ** 31)
            toks.append(vocab[state % len(vocab)])
        rows.append(Row(doc_id=doc, text=" ".join(toks)))
    df = spark.createDataFrame(rows)
    stats = _rows(dup_spans(df, "text", "doc_id", k=3, min_docs=2))
    removed = _rows(remove_dup_spans(df, "text", "doc_id", k=3,
                                     min_docs=2))
    for d in stats:
        assert removed[d]["n_removed"] == stats[d]["dup_tokens"], d
        # survivors + removed == all tokens
        n_clean = (len(removed[d]["clean_text"].split())
                   if removed[d]["clean_text"] else 0)
        assert n_clean + removed[d]["n_removed"] == stats[d]["n_words"]


def test_dup_window_min_docs_paths_equivalent(spark):
    # min_docs=2 fast path (min!=max) must select the same hash set as
    # the general countDistinct path on a collision-rich corpus
    from schisma_spark.functions.dedup import (
        _dup_window_hashes, _window_hashes,
    )

    vocab = ["a", "b", "c"]
    state, rows = 3, []
    for doc in range(20):
        n = 4 + (doc * 3) % 8
        toks = []
        for _ in range(n):
            state = (state * 1103515245 + 12345) % (2 ** 31)
            toks.append(vocab[state % len(vocab)])
        rows.append(Row(doc_id=doc, text=" ".join(toks)))
    df = spark.createDataFrame(rows)
    pos = df.select(
        "doc_id",
        F.posexplode(_window_hashes(F.col("text"), 3, "portable"))
        .alias("_pos", "_h"))
    fast = {r["_h"] for r in _dup_window_hashes(pos, "doc_id", 2).collect()}
    # force the general path with the same semantics
    general = {
        r["_h"] for r in pos.groupBy("_h")
        .agg(F.countDistinct("doc_id").alias("d"))
        .where(F.col("d") >= 2).select("_h").collect()
    }
    assert fast == general and fast  # equal and non-trivial
    # min_docs=3 still exercises the countDistinct path
    tri = {r["_h"] for r in _dup_window_hashes(pos, "doc_id", 3).collect()}
    assert tri <= general
