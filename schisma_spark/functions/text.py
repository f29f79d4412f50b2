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


#: PII patterns, applied in declaration order. Restricted to the
#: RE2 ∩ java.util.regex common subset (same leftmost match on both
#: engines); IP before PHONE so the phone pattern can never eat the
#: digits of an already-replaced address.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{7,15}\b|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
}


def pii_count(c: Column, kind: str) -> Column:
    """Match count for one PII kind (run BEFORE redaction — the counts
    are over the original text)."""
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind][0]))


def redact_pii(c: Column, kinds: tuple = ("email", "ip", "phone")) -> Column:
    """PII redaction for training corpora (r6): replace emails, IPv4
    addresses and phone-shaped numbers with typed placeholder tokens —
    the standard scrub pass before text lands in a training set. Pure
    JVM ``regexp_replace`` chain (no Python, codegen-able), applied in
    ``PII_PATTERNS`` declaration order so earlier replacements cannot be
    re-matched by later patterns. DuckDB twin: the same patterns through
    ``regexp_replace(..., 'g')``. NULL text stays NULL."""
    out = c
    for kind in kinds:
        pat, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, token)
    return out


def dup_word_frac(c: Column) -> Column:
    """Fraction of repeated words, ``1 - distinct/total`` (Gopher-style
    repetition signal; 0.0 for empty/NULL). One let-bound projection —
    no shuffle, no Python."""
    from schisma_spark.functions.dedup import words

    def body(w: Column) -> Column:
        n = F.size(w)
        return F.when(n <= 0, F.lit(0.0)).otherwise(
            (F.lit(1.0) - F.size(F.array_distinct(w)) / n).cast("double")
        )

    return bind(words(c), body)


def dup_line_frac(c: Column) -> Column:
    """Fraction of repeated non-blank lines, ``1 - distinct/total``
    (the Gopher/web-corpus duplicate-line signal; 0.0 for empty/NULL or
    all-blank). Lines are trimmed before comparison. One let-bound
    projection."""
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )

    def body(ls: Column) -> Column:
        n = F.size(ls)
        return F.when(n.isNull() | (n <= 0), F.lit(0.0)).otherwise(
            (F.lit(1.0) - F.size(F.array_distinct(ls)) / n).cast("double")
        )

    return bind(lines, body)


def lexical_diversity(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document lexical-diversity / repetitiveness table:
    ``id, n_tokens, n_distinct, ttr, simpson`` — the distributional
    quality signal the scalar ``dup_word_frac`` can't see (a doc that
    cycles three words has the same distinct/total ratio as natural
    prose of the same vocabulary but a very different concentration).
    ``ttr`` = type-token ratio (n_distinct / n_tokens); ``simpson`` =
    Σ c_i² / n² (the Simpson concentration index — the probability two
    random token draws are the same word; → 1 for degenerate spam,
    → 1/n_distinct for a uniform vocabulary).

    DESIGN: every statistic is derived from INTEGER aggregates (token
    count, distinct count, sum of squared per-term counts), never a
    floating-point sum — a Shannon-entropy Σ c·ln c would depend on the
    reduce-side double-addition order, which Spark does not guarantee
    across partitionings (and would diverge from any oracle in the last
    ulp). Simpson carries the same repetitiveness ordering as entropy
    for filtering purposes and is bit-deterministic.

    Scale shape: one explode to (id, term) narrow rows, then two
    hash aggregations — per-(id, term) counts and per-id integer sums —
    both with map-side partial combine; zero-token docs (NULL / blank /
    whitespace) are restored by a left join from the id side with
    n_tokens = 0 and NULL ratios (one output row per input row). No
    window, no HOF in the aggregate stage, nothing funnels."""
    from schisma_spark.functions.dedup import words

    w = df.select(
        F.col(id_col).alias("_id"),
        F.explode(words(F.col(text_col))).alias("_term"),
    )
    per_term = w.groupBy("_id", "_term").agg(F.count(F.lit(1)).alias("_c"))
    agg = per_term.groupBy("_id").agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("_d"),
        F.sum(F.col("_c") * F.col("_c")).alias("_c2"),
    )
    out = df.select(F.col(id_col)).join(
        agg.withColumnRenamed("_id", id_col), id_col, "left")
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("long")
    d = F.coalesce(F.col("_d"), F.lit(0)).cast("long")
    return out.select(
        F.col(id_col),
        n.alias("n_tokens"),
        d.alias("n_distinct"),
        F.when(n > 0, d.cast("double") / n).alias("ttr"),
        F.when(n > 0, F.col("_c2").cast("double") / (n * n)).alias("simpson"),
    )


def strip_boilerplate(df, text_col: str = "text", id_col: str = "doc_id",
                      min_docs: int = 100):
    """Boilerplate LINE removal (r5 VERDICT #6): drop every line whose
    trimmed form appears in at least ``min_docs`` DISTINCT documents —
    the classic web-corpus pass that strips nav bars, cookie banners and
    copyright footers before training. Returns one row per input
    document: ``id_col, text_clean, n_lines, n_removed`` with surviving
    lines rejoined in original order. Blank lines are document
    structure, never boilerplate (their trimmed form is excluded from
    the frequency count and always kept). NULL text -> NULL
    ``text_clean`` with ``n_lines = n_removed = 0``; a document whose
    EVERY line is boilerplate also comes back NULL (nothing survives) —
    both by the same left join, so the every-row contract holds.

    ``min_docs`` is an ABSOLUTE distinct-document frequency: the caller
    derives it from corpus size (e.g. 1e-4 of n_docs). A fraction-based
    threshold would force an eager count at construction time (the r5
    n_planes lesson).

    Scale shape: one explode to (id, pos, line), a distinct + count
    aggregate over (trimmed_line) -> the boilerplate set, which is small
    by construction (only lines crossing the frequency floor), so AQE
    broadcasts the anti-join; then one groupBy(id) reassembly. Line text
    shuffles once for the distinct and once for the reassembly — both
    unavoidable for a rewrite — and the heavy side never joins against
    anything bigger than the boilerplate set."""
    from pyspark.sql import DataFrame  # noqa: F401  (signature clarity)

    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    bp = (
        lines.select(F.col(id_col), F.trim(F.col("_line")).alias("_k"))
        .where(F.col("_k") != "")
        .distinct()
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") >= min_docs)
        .select("_k")
    )
    kept = lines.join(
        bp, F.trim(lines["_line"]) == bp["_k"], "left_anti"
    )
    agg = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_lines = F.coalesce(
        F.size(F.split(F.col(text_col), "\n")), F.lit(0)
    ).cast("int")
    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.col("text_clean"),
            n_lines.alias("n_lines"),
            (n_lines - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("int").alias("n_removed"),
        )
    )


def vocab_stats(df, text_col: str = "text", id_col: str = "doc_id",
                top_k: int = 50):
    """Corpus VOCABULARY table (r6): the ``term, tf, df_docs`` rows a
    tokenizer-training or IDF pass starts from — term frequency and
    distinct-document frequency over the whitespace token stream
    (lowercased/trimmed, same ``words()`` normalization as the dedup
    family), top ``top_k`` by term frequency with the term itself as the
    deterministic tiebreak.

    Scale shape: one explode to (id, term) narrow rows, a two-phase
    (map-side partial) count + approx-free distinct-doc count per term,
    then ``orderBy().limit()`` — Spark plans TakeOrdered, a per-partition
    top-k merged on the driver, NOT a single-task global sort; nothing
    funnels at 10^12 docs. No NULL/blank rows survive the explode (empty
    word array), matching the DuckDB twin's NULL unnest."""
    from schisma_spark.functions.dedup import words

    w = df.select(
        F.col(id_col).alias("_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    agg = w.groupBy("term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("_id").alias("df_docs"),
    )
    return (agg.orderBy(F.desc("tf"), F.asc("term")).limit(top_k)
            .select("term", F.col("tf").cast("long").alias("tf"),
                    F.col("df_docs").cast("long").alias("df_docs")))


def vocab_drift(df_a, df_b, text_col: str = "text", top_n: int = 100,
                smooth: float = 0.5):
    """Term-distribution DRIFT between two corpus snapshots (r6) — the
    text-payload sibling of the numeric drift family (checks/drift.py):
    did the vocabulary of the corpus shift between ingest batches /
    crawl snapshots? One row per term of the POOLED top ``top_n`` (by
    ``tf_a + tf_b``, term as deterministic tiebreak): ``term, tf_a,
    tf_b, p_a, p_b, js_contrib`` where ``p_*`` are add-``smooth``
    probabilities renormalized over the selected terms and
    ``js_contrib`` (natural log, always >= 0 by the log-sum inequality)
    sums to the Jensen-Shannon divergence of the two renormalized
    distributions. Smoothing keeps terms absent from one side finite,
    so new/vanished vocabulary shows up instead of blowing up.

    Scale shape: each snapshot explodes to narrow (term) rows and
    aggregates with map-side partials — O(corpus tokens) but never
    wider than a term; the two vocab tables full-outer-join on term
    (vocab-sized, ~10^6-10^8 rows at web scale — fine to shuffle), the
    top-n is TakeOrdered (per-partition top-k merged on the driver, no
    global sort task), and the divergence math runs over the <= top_n
    selected rows crossJoined with a ONE-row totals frame (the tiny
    sketch-frame pattern — bounded by construction, AQE broadcasts).
    Same ``words()`` normalization as the dedup/vocab family; NULL and
    blank texts contribute zero terms on both engines."""
    from schisma_spark.functions.dedup import words

    def tf(df, alias: str):
        return (
            df.select(F.explode(words(F.col(text_col))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    pooled = (
        tf(df_a, "tf_a").join(tf(df_b, "tf_b"), "term", "full_outer")
        .select(
            "term",
            F.coalesce("tf_a", F.lit(0)).cast("long").alias("tf_a"),
            F.coalesce("tf_b", F.lit(0)).cast("long").alias("tf_b"),
        )
        .orderBy(F.desc(F.col("tf_a") + F.col("tf_b")), F.asc("term"))
        .limit(top_n)
    )
    totals = pooled.agg(
        F.sum("tf_a").alias("_ta"), F.sum("tf_b").alias("_tb"),
        F.count(F.lit(1)).alias("_n"),
    )
    sm = F.lit(float(smooth))
    p_a = (F.col("tf_a") + sm) / (F.col("_ta") + sm * F.col("_n"))
    p_b = (F.col("tf_b") + sm) / (F.col("_tb") + sm * F.col("_n"))
    m = (p_a + p_b) / F.lit(2.0)
    js = (p_a * F.log(p_a / m) + p_b * F.log(p_b / m)) / F.lit(2.0)
    return pooled.crossJoin(totals).select(
        "term", "tf_a", "tf_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(js, 9).alias("js_contrib"),
    )


def unigram_logprob(df, text_col: str = "text", id_col: str = "doc_id",
                    vocab_df=None, alpha: float = 0.5):
    """Per-document mean unigram log-probability — the distributable
    proxy for the CCNet-style LM-perplexity quality filter: score every
    document by the average ``ln p(token)`` under a unigram model,
    self-trained on the corpus by default or scored against a
    ``vocab_df`` (``term, tf``) from a frozen reference corpus (the
    production shape: train once on a trusted snapshot, score every
    ingest batch). Low scores flag rare-token soup / gibberish; high
    scores are common fluent text.

    ``p(token) = (tf + alpha) / (total + alpha * (V + 1))`` —
    add-``alpha`` smoothing over the V vocabulary terms plus one shared
    OOV bucket, so scoring a new snapshot against a frozen vocabulary is
    total (unseen tokens get the OOV mass, never -inf).

    Output, one row per input document: ``id_col, n_tokens,
    logprob_mean, ppl`` (``exp(-logprob_mean)``); empty/NULL docs keep
    their row with NULL scores (nothing to score — distinct from a
    low-quality verdict).

    Scale shape: tokens explode to narrow (id, term) rows and equi-join
    the vocabulary (vocab-sized — AQE broadcasts a frozen reference
    vocab, sort-merges a web-scale self-trained one; both linear); the
    shared denominator is factored out (``avg ln(tf+a) - ln(D)``) so the
    ONE-row totals frame cross-joins the per-DOC aggregate, never the
    token stream. Same ``words()`` normalization as the dedup/vocab
    family."""
    from schisma_spark.functions.dedup import words

    tokens = df.select(
        F.col(id_col).alias("_id"),
        F.explode(words(F.col(text_col))).alias("term"),
    )
    if vocab_df is None:
        vocab = tokens.groupBy("term").agg(
            F.count(F.lit(1)).alias("tf"))
    else:
        # defensive re-aggregation: a duplicate term in a user-supplied
        # vocabulary would otherwise MULTIPLY token rows in the join
        # (silently inflating every doc's token count); vocab-sized, cheap
        vocab = (vocab_df.groupBy("term")
                 .agg(F.sum(F.col("tf").cast("long")).alias("tf")))
    totals = vocab.agg(F.sum("tf").cast("double").alias("_total"),
                       F.count(F.lit(1)).alias("_v"))
    a = F.lit(float(alpha))
    per_doc = (
        tokens.join(vocab, "term", "left")
        .groupBy("_id")
        .agg(F.avg(F.log(F.coalesce(F.col("tf"), F.lit(0)) + a))
             .alias("_m"))
    )
    lp = F.col("_m") - F.log(F.col("_total") + a * (F.col("_v") + 1))
    return (
        df.select(F.col(id_col),
                  F.size(words(F.col(text_col))).cast("long")
                  .alias("n_tokens"))
        .join(per_doc.withColumnRenamed("_id", id_col), id_col, "left")
        .crossJoin(totals)
        .select(
            F.col(id_col), "n_tokens",
            F.round(lp, 6).alias("logprob_mean"),
            F.round(F.exp(-lp), 6).alias("ppl"),
        )
    )


def bigram_logprob(df, text_col: str = "text", id_col: str = "doc_id",
                   alpha: float = 0.5):
    """Per-document mean CONDITIONAL bigram log-probability — one rung
    up the n-gram ladder from :func:`unigram_logprob` toward the KenLM
    filter CCNet actually runs: score each document by the average
    ``ln p(w_i | w_{i-1})`` with
    ``p(w|u) = (c(u w) + alpha) / (c(u) + alpha * (V + 1))``
    (add-alpha over the V-term vocabulary plus an OOV bucket),
    self-trained on the corpus. Catches locally-fluent-but-scrambled
    text (bag-of-common-words gibberish) that unigram scoring ranks
    highly.

    Output, one row per input document: ``id_col, n_bigrams,
    logprob_mean, ppl``; docs with < 2 tokens keep their row with NULL
    scores.

    Scale shape: the bigram stream is built in ONE projection (a
    transform over the let-bound word array — no position self-join) and
    explodes to narrow (id, prefix, bigram) rows; the smoothed
    denominator ``ln(c(u) + alpha*(V+1))`` is precomputed per PREFIX on
    the vocab-sized unigram table (one-row totals crossJoin there, never
    on the token stream), so scoring is two equi-joins + one per-doc
    aggregate. Self-trained only: every prefix is in-vocabulary by
    construction (a frozen-vocab variant needs OOV prefix handling at
    token level — compose upstream if needed)."""
    from schisma_spark.functions.dedup import words
    from schisma_spark.functions.portable import bind

    a = F.lit(float(alpha))

    def bigrams(w):
        n = F.size(w)
        pairs = F.transform(
            F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
            lambda i: F.struct(
                F.element_at(w, (i - 1).cast("int")).alias("prefix"),
                F.concat_ws(
                    " ", F.element_at(w, (i - 1).cast("int")),
                    F.element_at(w, i.cast("int"))).alias("bg"),
            ),
        )
        return F.when(n >= 2, pairs)  # NULL (no rows) below 2 tokens

    toks = df.select(F.col(id_col).alias("_id"),
                     F.explode(words(F.col(text_col))).alias("term"))
    stream = df.select(
        F.col(id_col).alias("_id"),
        F.explode(bind(words(F.col(text_col)), bigrams)).alias("_p"),
    ).select("_id", F.col("_p.prefix").alias("prefix"),
             F.col("_p.bg").alias("bg"))

    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c1"))
    totals = uni.agg(F.count(F.lit(1)).alias("_v"))
    denom = uni.crossJoin(totals).select(
        F.col("term").alias("prefix"),
        F.log(F.col("c1") + a * (F.col("_v") + 1)).alias("_lnd"),
    )
    big = stream.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))

    per_doc = (
        stream.join(big, "bg")          # self-trained: always present
        .join(denom, "prefix")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.avg(F.log(F.col("c2") + a) - F.col("_lnd")).alias("_m"))
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long")
            .alias("n_bigrams"),
            F.round(F.col("_m"), 6).alias("logprob_mean"),
            F.round(F.exp(-F.col("_m")), 6).alias("ppl"),
        )
    )
