"""URL curation for web-crawl corpora.

C4 and RefinedWeb both gate documents on their source URL before any text
rule runs: parse the host, reduce it to the registered domain, drop
blocklisted domains, and canonicalize the URL (strip fragments and
tracking parameters) so URL-level dedup keys are stable.  All operators
here are pure column expressions built from the Java-regex/RE2 COMMON
SUBSET, so every rule has an exact ANSI twin for the correctness gate
(``parse_url`` would be the JVM-native alternative for host extraction,
but its quirks have no DuckDB twin — the shared regex does).

Scale: map-only, zero shuffle, whole-stage codegen; the blocklist enters
as a literal array (tiny by construction — block registered domains, not
URLs).  Reference scope note: the reference (DataDog/sketches-py) has no
URL handling; this extends the engine's training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "TWO_LEVEL_TLDS",
    "url_host",
    "registered_domain",
    "canonicalize_url",
    "url_stats",
    "url_stats_oracle_sql",
    "filter_blocked_domains",
    "filter_blocked_domains_table",
]

# common two-level public suffixes: the registered domain keeps THREE
# labels when the last two are one of these ("bbc.co.uk", not "co.uk")
TWO_LEVEL_TLDS = [
    "ac.uk", "co.in", "co.jp", "co.nz", "co.uk", "com.au", "com.br",
    "com.cn", "com.mx", "net.au", "org.uk",
]

# scheme://host[:port] — host is everything up to the first / ? or #
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def url_host(url: Column) -> Column:
    """Lowercased host without userinfo or port; NULL for non-URL
    strings."""
    raw = F.regexp_extract(url, _HOST_RE, 1)
    host = F.lower(
        F.regexp_replace(F.regexp_replace(raw, r"^.*@", ""), r":\d+$", "")
    )
    return F.nullif(host, F.lit(""))


def _domain_from_labels(labels: Column, host: Column) -> Column:
    """Registered domain from a MATERIALIZED label array (see
    :func:`registered_domain` for the rule).  Operators project the label
    array first so the host extraction is computed once, not once per
    TLD comparison — the inline form expanded to a >64 KB codegen method
    and fell back to interpreted eval."""
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    # isin -> ONE In expression holding a single copy of the last2 tree;
    # an OR-chain would copy it per suffix and (after filter pushdown
    # re-inlines the aliases) overflow the 64 KB codegen method limit
    two_level = last2.isin(*TWO_LEVEL_TLDS)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 2, host)
        .when(two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def registered_domain(host: Column) -> Column:
    """Registered domain of a host: the last two labels, or three when
    the last two form a known two-level public suffix (``co.uk`` etc.).
    Hosts with fewer labels pass through unchanged."""
    return _domain_from_labels(F.split(host, r"\."), host)


def canonicalize_url(url: Column) -> Column:
    """Stable URL-dedup key: lowercase scheme and host, strip the
    fragment, drop tracking parameters (``utm_*``, ``fbclid``,
    ``gclid``), tidy leftover ``?``/``&`` separators, and strip a bare
    trailing slash on the path root."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)", 1)
    # drop tracking params together with ONE adjacent separator
    rest = F.regexp_replace(rest, r"(utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*&", "")
    rest = F.regexp_replace(rest, r"[?&](utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*", "")
    rest = F.regexp_replace(rest, r"\?&", "?")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    rest = F.regexp_replace(rest, r"^/$", "")
    return F.when(
        hostport == "", url  # not a URL: pass through untouched
    ).otherwise(F.concat(scheme, F.lit("://"), hostport, rest))


def url_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Per-document URL curation signals:
    ``(id, host, domain, path_depth, has_tracking, canonical_url,
    blocked)`` — map-only, one pass."""
    # staged projections: host, then its label array, then the signals —
    # each expensive extraction is computed ONCE (Catalyst keeps the
    # boundaries because collapsing would duplicate non-cheap expressions)
    base = df.select(
        F.col(id_col),
        F.col(url_col).alias("_u"),
        url_host(F.col(url_col)).alias("host"),
    )
    path = F.regexp_extract("_u", r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)
    lab = base.select(
        id_col, "_u", "host",
        F.split("host", r"\.").alias("_labels"),
        path.alias("_path"),
    )
    depth = F.when(
        (F.col("_path") == "") | (F.col("_path") == "/"), F.lit(0)
    ).otherwise(
        F.size(F.split(F.regexp_replace("_path", r"/$", ""), "/")) - 1
    )
    sig = lab.select(
        id_col, "_u", "host",
        _domain_from_labels(F.col("_labels"), F.col("host")).alias("domain"),
        depth.cast("long").alias("path_depth"),
    )
    blocked = (
        F.col("domain").isin(*[b.lower() for b in blocklist])
        if blocklist
        else F.lit(False)
    )
    return sig.select(
        id_col,
        "host",
        "domain",
        "path_depth",
        F.col("_u").rlike(r"[?&](utm_[a-zA-Z]+|fbclid|gclid)=").alias("has_tracking"),
        canonicalize_url(F.col("_u")).alias("canonical_url"),
        F.coalesce(blocked, F.lit(False)).alias("blocked"),
    )


def url_stats_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    url_col: str = "url",
    blocklist: list[str] | None = None,
    where: str | None = None,
) -> str:
    """Twin of :func:`url_stats` (same regexes in the RE2/Java common
    subset)."""
    filt = f"WHERE {where}" if where else ""
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
    two = "l[-2] || '.' || l[-1] IN (" + ", ".join(
        f"'{s}'" for s in TWO_LEVEL_TLDS
    ) + ")"
    blocked = (
        "domain IN (" + ", ".join(f"'{b.lower()}'" for b in blocklist) + ")"
        if blocklist
        else "FALSE"
    )
    return rf"""
WITH base AS (
  SELECT {id_col} AS id, {url_col} AS u,
         NULLIF(lower(regexp_replace(regexp_replace(
                   regexp_extract({url_col}, '{host_re}', 1),
                   '^.*@', ''), ':\d+$', '')), '') AS host
  FROM {table} {filt}
),
lab AS (
  SELECT id, u, host, string_split(host, '.') AS l,
         regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)', 1) AS path,
         lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(u, '{host_re}', 1)) AS hostport,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)', 1),
                   '(utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*&', ''),
                 '[?&](utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*', ''),
               '\?&', '?'),
             '[?&]$', ''),
           '^/$', '') AS rest
  FROM base
),
sig AS (
  SELECT id, u, host,
         CASE WHEN len(l) <= 2 THEN host
              WHEN ({two}) AND len(l) >= 3 THEN l[-3] || '.' || l[-2] || '.' || l[-1]
              ELSE l[-2] || '.' || l[-1] END AS domain,
         CASE WHEN path = '' OR path = '/' THEN 0
              ELSE len(string_split(regexp_replace(path, '/$', ''), '/')) - 1
              END AS path_depth,
         regexp_matches(u, '[?&](utm_[a-zA-Z]+|fbclid|gclid)=') AS has_tracking,
         CASE WHEN hostport = '' THEN u
              ELSE scheme || '://' || hostport || rest END AS canonical_url
  FROM lab
)
SELECT id AS {id_col}, host, domain, CAST(path_depth AS BIGINT) AS path_depth,
       has_tracking, canonical_url, COALESCE(({blocked}), FALSE) AS blocked
FROM sig
"""


def filter_blocked_domains(
    df: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registered domain is blocklisted — the C4/RefinedWeb
    pre-filter.  Pure column filter (the blocklist compiles to literal
    comparisons); for blocklists too big to inline, join
    :func:`url_stats`'s ``domain`` against a broadcast table instead."""
    staged = df.select(
        "*", url_host(F.col(url_col)).alias("_ub_host")
    ).select(
        "*", F.split("_ub_host", r"\.").alias("_ub_labels")
    ).select(
        "*",
        _domain_from_labels(F.col("_ub_labels"), F.col("_ub_host")).alias(
            "_ub_domain"
        ),
    )
    cond = (
        F.col("_ub_domain").isin(*[b.lower() for b in blocklist])
        if blocklist
        else F.lit(False)
    )
    return staged.where(~cond | F.col("_ub_domain").isNull()).drop(
        "_ub_host", "_ub_labels", "_ub_domain"
    )


def filter_blocked_domains_table(
    df: DataFrame,
    blocked: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Blocklist filtering against a TABLE of blocked registered domains
    (for lists too large to inline as literals — e.g. UT1/adult
    blocklists with millions of entries).  The corpus side computes its
    registered domain map-only, then a broadcast LEFT ANTI join drops the
    matches — the corpus never shuffles; only the (small) blocklist
    broadcasts.  Rows with unparseable URLs (NULL domain) are kept, like
    :func:`filter_blocked_domains`."""
    from pyspark.sql.functions import broadcast

    staged = df.select(
        "*", url_host(F.col(url_col)).alias("_ub_host")
    ).select(
        "*", F.split("_ub_host", r"\.").alias("_ub_labels")
    ).select(
        "*",
        _domain_from_labels(F.col("_ub_labels"), F.col("_ub_host")).alias(
            "_ub_domain"
        ),
    )
    # no distinct(): LEFT ANTI drops a row on ANY match, so duplicate
    # blocklist keys are harmless and the dedup shuffle would be the only
    # Exchange in the whole plan
    bl = broadcast(
        blocked.select(F.lower(F.col(domain_col)).alias("_ub_domain"))
    )
    return staged.join(bl, "_ub_domain", "left_anti").drop(
        "_ub_host", "_ub_labels", "_ub_domain"
    )
