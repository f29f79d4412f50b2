"""Column-function library: portable hashing, text analysis, dedup,
similarity — the training-data-pipeline operators layered on the engine.

Everything here is pure ``pyspark.sql.functions`` composition (JVM-side,
whole-stage codegen) — no Python UDFs. Each function documents its exact
ANSI-SQL twin so results are DuckDB-oracle-checkable.
"""

from schisma_spark.functions.portable import hash32, hash60
from schisma_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count_regex,
    token_count_ws,
)
from schisma_spark.functions.dedup import (
    dup_spans,
    exact_dup_groups,
    jaccard,
    minhash_signature,
    norm_text,
    word_shingles,
)
from schisma_spark.functions.similarity import cosine_sim, brute_force_topk
from schisma_spark.functions.temporal import asof_join, session_stats, sessionize

__all__ = [
    "hash32",
    "hash60",
    "token_count_ws",
    "token_count_regex",
    "quality_score",
    "lang_id",
    "fingerprint",
    "norm_text",
    "word_shingles",
    "minhash_signature",
    "exact_dup_groups",
    "jaccard",
    "dup_spans",
    "cosine_sim",
    "brute_force_topk",
    "sessionize",
    "session_stats",
    "asof_join",
]
