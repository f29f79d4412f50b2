"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, fingerprinting.

All whole-column expressions (JVM, codegen) over the ``documents`` table
shape; each has an exact DuckDB twin (regex classes restricted to the
RE2 ∩ java.util.regex common subset).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from schisma_spark.functions.portable import bind, hash60

#: BPE-ish tokenization: letter runs | digit runs | single non-space symbol
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: language-ID stopword alternations (whole-word). Deterministic n-gram-free
#: heuristic; ties resolve in declaration order.
LANG_STOPWORDS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|you|that|it|he)\b",
    "de": r"\b(der|die|und|das|ist|ich|nicht|mit|ein|zu)\b",
    "fr": r"\b(le|la|et|les|des|un|une|est|que|dans)\b",
    "es": r"\b(el|los|las|una|es|y|en|se|por|con)\b",
}

PUNCT_RE = r"[.,;:!?]"
EN_STOP_RE = LANG_STOPWORDS["en"]


def token_count_ws(c: Column) -> Column:
    """Whitespace token count; 0 for empty/blank.
    DuckDB: len(string_split_regex(trim(t), '\\s+')) with blank guard."""
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_regex(c: Column) -> Column:
    """BPE-ish token count. DuckDB: len(regexp_extract_all(t, TOKEN_RE))."""
    return F.regexp_count(c, F.lit(TOKEN_RE))


def punct_ratio(c: Column) -> Column:
    return (
        F.regexp_count(c, F.lit(PUNCT_RE)) / F.greatest(F.length(c), F.lit(1))
    ).cast("double")


def stopword_ratio(c: Column, lang: str = "en",
                   words: Column | None = None) -> Column:
    """Stopword hits per word. ``words`` lets callers pass an already-bound
    word count so the split isn't recomputed (quality_score does)."""
    denom = token_count_ws(c) if words is None else words
    return (
        F.regexp_count(F.lower(c), F.lit(LANG_STOPWORDS[lang]))
        / F.greatest(denom, F.lit(1))
    ).cast("double")


def quality_score(c: Column) -> Column:
    """Deterministic 0..1 quality heuristic: four equal-weight indicators
    (word count in [10, 10000], mean word length in [3, 12], punctuation
    ratio < 0.1, stopword ratio > 0.03). DuckDB twin is the same CASE
    arithmetic. The word count is let-bound (referenced by three
    indicators; a naive composition re-splits the text each time)."""
    ind = lambda b: F.when(b, 0.25).otherwise(0.0)  # noqa: E731

    def body(words: Column) -> Column:
        awl = F.length(F.trim(c)) / F.greatest(words, F.lit(1))
        return (
            ind(words.between(10, 10000))
            + ind(awl.between(3.0, 12.0))
            + ind(punct_ratio(c) < 0.1)
            + ind(stopword_ratio(c, words=words) > 0.03)
        ).cast("double")

    return bind(token_count_ws(c), body)


def lang_id(c: Column) -> Column:
    """Stopword-count argmax over LANG_STOPWORDS; 'und' when no stopword of
    any language occurs. First max wins (declaration order). The lowered
    text and the score array are let-bound (scores are referenced by both
    array_max and array_position)."""
    langs = F.array(*[F.lit(k) for k in LANG_STOPWORDS])

    def body(lower: Column) -> Column:
        arr = F.array(
            *[F.regexp_count(lower, F.lit(p)).cast("int")
              for p in LANG_STOPWORDS.values()]
        )
        return bind(
            arr,
            lambda a: F.when(F.array_max(a) <= 0, F.lit("und")).otherwise(
                F.element_at(
                    langs, F.array_position(a, F.array_max(a)).cast("int")
                )
            ),
        )

    return bind(F.lower(c), body)


def fingerprint(c: Column) -> Column:
    """60-bit document fingerprint over whitespace-normalized lowercase
    text — the exact-dedup / shard-assignment key."""
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return hash60(norm)
