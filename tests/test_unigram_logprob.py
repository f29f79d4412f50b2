"""Unigram log-probability quality scoring (text.unigram_logprob)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from schisma_spark.functions.text import unigram_logprob


def _rows(df):
    return {r[df.columns[0]]: r.asDict() for r in df.collect()}


def test_unigram_logprob_hand_math(spark):
    # corpus: tf(a)=3, tf(b)=2, tf(c)=1 -> total=6, V=3, D=6+0.5*4=8
    df = spark.createDataFrame([
        Row(doc_id=1, text="a a b"),
        Row(doc_id=2, text="a b c"),
    ])
    got = _rows(unigram_logprob(df, "text", "doc_id", alpha=0.5))
    d = 8.0
    lp1 = (2 * math.log(3.5) + math.log(2.5)) / 3 - math.log(d)
    lp2 = (math.log(3.5) + math.log(2.5) + math.log(1.5)) / 3 - math.log(d)
    assert abs(got[1]["logprob_mean"] - lp1) < 1e-6
    assert abs(got[2]["logprob_mean"] - lp2) < 1e-6
    assert got[1]["logprob_mean"] > got[2]["logprob_mean"]  # common > rare
    assert abs(got[2]["ppl"] - math.exp(-lp2)) < 1e-4
    assert got[1]["n_tokens"] == 3


def test_unigram_logprob_empty_docs_score_null(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a"), Row(doc_id=2, text=None),
         Row(doc_id=3, text="  ")],
        "doc_id int, text string",
    )
    got = _rows(unigram_logprob(df, "text", "doc_id"))
    assert set(got) == {1, 2, 3}
    for d in (2, 3):
        assert got[d]["n_tokens"] == 0
        assert got[d]["logprob_mean"] is None and got[d]["ppl"] is None


def test_unigram_logprob_frozen_vocab_oov(spark):
    # score against a frozen reference vocab: OOV tokens get the
    # smoothed tf=0 mass, never -inf/NULL
    ref = spark.createDataFrame([Row(term="a", tf=9), Row(term="b", tf=1)])
    df = spark.createDataFrame([
        Row(doc_id=1, text="a a"),
        Row(doc_id=2, text="zzz qqq"),  # fully OOV
    ])
    got = _rows(unigram_logprob(df, "text", "doc_id",
                                vocab_df=ref, alpha=0.5))
    d = 10 + 0.5 * 3
    assert abs(got[1]["logprob_mean"] - math.log(9.5 / d)) < 1e-6
    assert abs(got[2]["logprob_mean"] - math.log(0.5 / d)) < 1e-6
    assert got[2]["logprob_mean"] < got[1]["logprob_mean"]


def test_unigram_logprob_duplicate_vocab_terms_merged(spark):
    # duplicate rows in a user vocabulary must not multiply token rows
    ref = spark.createDataFrame(
        [Row(term="a", tf=4), Row(term="a", tf=5), Row(term="b", tf=1)])
    df = spark.createDataFrame([Row(doc_id=1, text="a a")])
    got = _rows(unigram_logprob(df, "text", "doc_id",
                                vocab_df=ref, alpha=0.5))
    d = 10 + 0.5 * 3
    assert got[1]["n_tokens"] == 2
    assert abs(got[1]["logprob_mean"] - math.log(9.5 / d)) < 1e-6


def test_bigram_logprob_hand_math(spark):
    from schisma_spark.functions.text import bigram_logprob

    # unigrams a:3 b:3 solo:1 -> V=3, denom D = ln(c1 + 0.5*(V+1))
    # = ln(3 + 2) for both prefixes; bigrams: "a b":3, "b a":1
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b a b"),
        Row(doc_id=2, text="a b"),
        Row(doc_id=3, text="solo"),        # < 2 tokens -> NULL score
    ])
    got = _rows(bigram_logprob(df, "text", "doc_id", alpha=0.5))
    d = math.log(3 + 0.5 * 4)
    m1 = (2 * (math.log(3.5) - d) + (math.log(1.5) - d)) / 3
    m2 = math.log(3.5) - d
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["logprob_mean"] - m1) < 1e-6
    assert abs(got[2]["logprob_mean"] - m2) < 1e-6
    assert got[3]["n_bigrams"] == 0 and got[3]["logprob_mean"] is None


def test_bigram_beats_unigram_on_scrambled_text(spark):
    from schisma_spark.functions.text import bigram_logprob, unigram_logprob

    # fluent docs repeat the SAME word order; the scrambled doc uses the
    # identical bag of words in an order never seen elsewhere
    fluent = "the cat sat on the mat"
    df = spark.createDataFrame(
        [Row(doc_id=i, text=fluent) for i in range(5)]
        + [Row(doc_id=99, text="mat the on sat cat the")])
    bg = _rows(bigram_logprob(df, "text", "doc_id"))
    ug = _rows(unigram_logprob(df, "text", "doc_id"))
    # unigram CANNOT separate them (same bag of words)
    assert abs(ug[99]["logprob_mean"] - ug[0]["logprob_mean"]) < 1e-9
    # bigram ranks the scrambled doc clearly lower
    assert bg[99]["logprob_mean"] < bg[0]["logprob_mean"] - 0.5
