"""Aggregate (table-level) checks — SURVEY.md §2.B.

The reference is a per-value interpreter with no table semantics; these
operators enter through BASELINE.json's north_rule: per-column stats,
uniqueness with explicit skew salting, referential integrity via
broadcast/shuffle joins, distribution drift via mergeable sketches, and
bounded top-k violation sampling.
"""

from schisma_spark.checks.dependency import fd_groups, fd_violations
from schisma_spark.checks.sequence import monotonic_violations, sequence_gaps
from schisma_spark.checks.stats import column_stats
from schisma_spark.checks.uniqueness import duplicate_keys, uniqueness_violations
from schisma_spark.checks.referential import fk_violations
from schisma_spark.checks.drift import (
    fixed_histogram,
    ks_from_histograms,
    psi_from_histograms,
    quantile_sketch,
)
from schisma_spark.checks.sketch import (
    hll_distinct_check,
    hll_merge,
    hll_sketch,
    kll_merge,
    kll_quantile_check,
    kll_quantiles,
    kll_sketch,
    ks_from_sketches,
)
from schisma_spark.checks.topk import top_k_violations

__all__ = [
    "column_stats",
    "fd_groups",
    "fd_violations",
    "sequence_gaps",
    "monotonic_violations",
    "duplicate_keys",
    "uniqueness_violations",
    "fk_violations",
    "fixed_histogram",
    "ks_from_histograms",
    "psi_from_histograms",
    "quantile_sketch",
    "hll_sketch",
    "hll_merge",
    "hll_distinct_check",
    "kll_sketch",
    "kll_merge",
    "kll_quantiles",
    "kll_quantile_check",
    "ks_from_sketches",
    "top_k_violations",
]
