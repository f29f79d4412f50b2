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
    ``.co.uk`` (documented: ship a PSL lookup table as a broadcast-join
    dimension when that matters). '' host -> ''."""
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
