"""Web-corpus URL operators: host extraction, normalization, domain
blocklists — the provenance-side curation family (r6).

No reference analog (kettek/schisma is a single-value validator); this
extends the training-data-pipeline surface the same way text.py's
boilerplate/PII passes do. Everything is a plain JVM regex/string
expression; every pattern is written in the Java∩RE2 intersection (no
backreferences, no lookaround) so the DuckDB twins evaluate identically
— the PII_PATTERNS discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: scheme://[userinfo@]HOST[:port]/... -> capture group 1 = host.
#: Java and RE2 agree on every construct used here.
HOST_RE = r"^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(c: Column) -> Column:
    """Lower-cased host of an absolute URL; '' when the value does not
    parse as scheme://... (relative refs, garbage, NULL -> NULL). A
    trailing-dot FQDN (``badsite.net.`` — DNS-equivalent and a classic
    blocklist evasion) is normalized to the dotless form. DuckDB:
    ``regexp_replace(regexp_extract(lower(u), HOST_RE, 1), '\\.$', '')``
    — same '' no-match convention on both engines."""
    return F.regexp_replace(
        F.regexp_extract(F.lower(c), HOST_RE, 1), r"\.$", "")


def url_normalize(c: Column) -> Column:
    """Canonical URL for exact-dedup grouping: lower-case the whole URL
    (host case never matters; path case rarely does for dedup purposes —
    documented coarsening), strip the fragment (``#...`` never reaches
    the server), then a trailing ``?`` left by an empty query. NULL in,
    NULL out. Both steps are single regexp_replace calls in the Java∩RE2
    subset."""
    no_frag = F.regexp_replace(F.lower(c), r"#.*$", "")
    return F.regexp_replace(no_frag, r"\?$", "")


def registered_domain(c: Column) -> Column:
    """Last two dot-labels of the host (``sub.a.example.com`` ->
    ``example.com``) — a Public-Suffix-List-FREE approximation, exact
    for generic TLDs and WRONG for two-level public suffixes like
    ``.co.uk``; use :func:`registered_domain_psl` with a PSL dimension
    table when that matters. '' host -> ''."""
    return F.regexp_extract(c, r"([^.]+\.[^.]+)$", 1)


def url_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    by: str = "domain",
) -> DataFrame:
    """Annotate every row with ``host``, ``domain``, ``url_norm`` and
    ``blocked`` (host/domain appears in ``blocklist``'s first column).
    ``by='domain'`` matches on the registered domain (blocks every
    subdomain), ``by='host'`` on the exact host. Rows are annotated, not
    dropped — the keep/drop policy belongs to the caller (the
    curation-keep-list convention: every input row yields a decision).

    Scale shape: blocklists are small by construction (10^4..10^6
    entries vs a 10^12-row corpus) — the left join equi-joins on the
    lower-cased key and AQE broadcasts the list side; no forced hint
    (CLAUDE.md), no shuffle of the corpus beyond what the caller adds."""
    if by not in ("domain", "host"):
        raise ValueError(f"by must be 'domain' or 'host', got {by!r}")
    key_col = blocklist.columns[0]
    # normalize the list side the same way as the corpus side: lower,
    # strip a trailing FQDN dot, and — for domain matching — reduce
    # host-form entries ('www.badsite.net') to their registered domain
    # so they block instead of silently never matching
    blk = F.regexp_replace(F.lower(F.col(key_col)), r"\.$", "")
    if by == "domain":
        blk = registered_domain(blk)
    # drop entries that reduce to '' (blank lines; dotless entries like
    # 'localhost' under by='domain', where registered_domain needs a
    # dot): the corpus side maps every unparseable URL and single-label
    # host to '' too, so one stray '' entry would equi-join — and block
    # — ALL of them (r6 self-review)
    bl = (blocklist.select(blk.alias("_blk"))
          .where(F.length("_blk") > 0).distinct())
    host = url_host(F.col(url_col))
    out = df.withColumn("host", host).withColumn(
        "domain", registered_domain(F.col("host"))).withColumn(
        "url_norm", url_normalize(F.col(url_col)))
    join_key = F.col("domain") if by == "domain" else F.col("host")
    return (
        out.join(bl, join_key == F.col("_blk"), "left")
        .withColumn("blocked", F.col("_blk").isNotNull())
        .drop("_blk")
    )


def _suffix_re(k: int) -> str:
    """Regex capturing the last ``k`` dot-labels of a host (Java∩RE2:
    bounded repetition only). '' when the host has fewer labels."""
    return r"((?:[^.]+\.){%d}[^.]+)$" % (k - 1)


def registered_domain_psl(
    df: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    out_col: str = "domain_psl",
    max_rule_labels: int = 4,
    strategy: str = "broadcast",  # broadcast | auto
) -> DataFrame:
    """Public-Suffix-List-aware registered domain — closes the
    documented :func:`registered_domain` caveat (two-level public
    suffixes like ``.co.uk``). ``psl``'s first column holds rules in
    the publicsuffix.org list format: plain (``co.uk``), wildcard
    (``*.ck``), exception (``!www.ck``); comment (``//...``) and blank
    lines are ignored. Standard PSL semantics: exception rules prevail,
    else the rule with the most labels, else the implicit ``*`` default
    (public suffix = last label); the registered domain is the public
    suffix plus one label, '' when the host IS a public suffix (or is
    '' / garbage), NULL for NULL hosts.

    Scale shape (the 100-TB story): every rule kind reduces to an exact
    match of the host's last-``k``-labels suffix against a key — plain
    ``co.uk`` is key ``co.uk`` at depth 2; wildcard ``*.ck`` is key
    ``ck`` at depth 1 plus a has-one-more-label condition; exception
    ``!www.ck`` is key ``www.ck`` at depth 2 yielding one label less.
    So the corpus side computes ``max_rule_labels + 2`` suffix
    projections (plain regexes) and LEFT-JOINs the per-depth slice of
    the aggregated rule table — each a broadcast hash join of a
    ~10^4-row dim, with ZERO shuffles of the corpus and no
    explode/re-aggregate round trip. ``strategy='broadcast'`` (default,
    the checks/referential.py dimension-table convention: the real PSL
    is bounded at ~10^4 lines, and without the hint the planner's
    pre-AQE SortMergeJoin candidate can launch a wasted corpus shuffle
    stage before AQE re-plans); ``'auto'`` defers to AQE. All other
    columns of ``df`` pass through."""
    if strategy not in ("broadcast", "auto"):
        raise ValueError(
            f"strategy must be 'broadcast' or 'auto', got {strategy!r}")
    rule_col = psl.columns[0]
    rule = F.lower(F.trim(F.col(rule_col)))
    is_exc = F.substring(rule, 1, 1) == "!"
    is_wild = F.substring(rule, 1, 2) == "*."
    key = F.regexp_replace(rule, r"^(!|\*\.)", "")
    dim = (
        psl.select(
            key.alias("_k"),
            F.when(is_exc, F.lit("e"))
            .when(is_wild, F.lit("w"))
            .otherwise(F.lit("p")).alias("_kind"),
        )
        .where((F.col("_k") != "") & ~F.col("_k").startswith("//"))
        .groupBy("_k")
        .agg(
            F.max(F.col("_kind") == "e").alias("_e"),
            F.max(F.col("_kind") == "p").alias("_p"),
            F.max(F.col("_kind") == "w").alias("_w"),
        )
        .withColumn("_kl", F.size(F.split(F.col("_k"), r"\.")))
    )

    host = F.lower(F.col(host_col))
    out = df
    n_suffix = max_rule_labels + 2
    for k in range(1, n_suffix + 1):
        out = out.withColumn(
            f"_s{k}", F.regexp_extract(host, _suffix_re(k), 1))
    for k in range(1, max_rule_labels + 1):
        d_k = dim.where(F.col("_kl") == k).select(
            F.col("_k").alias(f"_k{k}"),
            F.col("_e").alias(f"_e{k}"),
            F.col("_p").alias(f"_p{k}"),
            F.col("_w").alias(f"_w{k}"),
        )
        if strategy == "broadcast":
            d_k = F.broadcast(d_k)
        out = out.join(
            d_k, out[f"_s{k}"] == d_k[f"_k{k}"], "left")

    def flag(name: str, k: int):
        # unmatched join rows are NULL; treat as False
        return F.coalesce(F.col(f"_{name}{k}"), F.lit(False))

    # prevailing rule: exceptions first (longest first), then most
    # labels (plain at depth L and wildcard at depth L-1 both have L
    # rule labels), then the implicit '*' default
    ps = F.lit(None).cast("int")
    cases = []
    for k in range(max_rule_labels, 0, -1):          # exceptions
        cases.append((flag("e", k), k - 1))
    for L in range(max_rule_labels + 1, 0, -1):      # plain + wild
        if L <= max_rule_labels:
            cases.append((flag("p", L), L))
        if L >= 2:
            cases.append(
                (flag("w", L - 1) & (F.col(f"_s{L}") != ""), L))
    expr = F.lit(1)                                   # implicit '*'
    for cond, val in reversed(cases):
        expr = F.when(cond, F.lit(val)).otherwise(expr)
    ps = expr

    dom = F.lit("")
    for v in range(max_rule_labels + 1, 0, -1):
        dom = F.when(ps == v, F.col(f"_s{v + 1}")).otherwise(dom)
    dom = F.when(F.col(host_col).isNull(),
                 F.lit(None).cast("string")).otherwise(dom)

    drop = [f"_s{k}" for k in range(1, n_suffix + 1)] + [
        f"_{nm}{k}" for k in range(1, max_rule_labels + 1)
        for nm in ("k", "e", "p", "w")
    ]
    return out.withColumn(out_col, dom).drop(*drop)
