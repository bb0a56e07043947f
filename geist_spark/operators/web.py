"""Web-corpus operators: URL canonicalization, host-grain stats, and
URL-level dedup.

A crawl-derived training corpus keys on URLs: the same page arrives
under `HTTP://Host.com:80/a/?utm_source=feed#top` and
`http://host.com/a` and must count once; per-host aggregates drive
crawl budgeting and domain blocklists. The reference engine stops at
event transforms (SURVEY §2.3-2.6); these extend the same
spec-and-codegen discipline to the web-corpus surface.

All pure JVM column expressions (regexp_extract / split / array_sort —
RFC 3986 component grammar), zero Python, zero shuffles for the
normalizer itself: at 100 TB URL canonicalization is a free rider on
the scan. Host stats are one partial-agg shuffle at host grain; URL
dedup is the top-1-per-key window shape on the normalized URL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# RFC 3986 component extraction (scheme://authority/path?query#fragment)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# query starts at the FIRST '?' before any '#' (RFC 3986) — the
# pre-'?' span must exclude '?' itself or greedy matching would anchor
# on the last one
_QUERY_RE = r"^[^#?]*\?([^#]*)"

# tracking params dropped by normalization (prefix match for utm_*).
# 'ref' is deliberately NOT in the default list: it is a common
# FUNCTIONAL parameter (branch selectors on code hosts, referrer-keyed
# landing pages) and dropping it conflates genuinely distinct pages —
# callers who know their corpus uses it for tracking pass it in
# explicitly via tracking_exact.
TRACKING_PREFIXES = ("utm_",)
TRACKING_EXACT = ("fbclid", "gclid", "msclkid")


# host inside an authority: bracketed IPv6 literal or everything up to
# the port colon, with optional userinfo stripped
_HOST_RE = r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)"


def url_host(url: F.Column) -> F.Column:
    """Lower-cased host (authority minus port/userinfo; bracketed IPv6
    literals kept whole)."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    return F.lower(F.regexp_extract(auth, _HOST_RE, 1))


def normalize_url(
    url: F.Column,
    tracking_exact: tuple[str, ...] = TRACKING_EXACT,
    tracking_prefixes: tuple[str, ...] = TRACKING_PREFIXES,
) -> F.Column:
    """Canonical URL: lower-cased scheme+host, default port stripped
    (http:80 / https:443), fragment dropped, tracking query params
    (default utm_*, fbclid, gclid, msclkid — both sets overridable)
    removed and the remainder sorted, trailing path slashes collapsed
    ('' -> '/').

    One pure-codegen projection — the whole normalizer inlines into
    the scan stage; nothing here costs a shuffle or a UDF.
    """
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    host = F.lower(F.regexp_extract(auth, _HOST_RE, 1))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    rawq = F.regexp_extract(url, _QUERY_RE, 1)
    def _keep(p: F.Column) -> F.Column:
        name = F.regexp_extract(p, r"^([^=]*)", 1)
        cond = p != ""
        if tracking_exact:
            cond = cond & ~name.isin(*tracking_exact)
        for pref in tracking_prefixes:
            cond = cond & ~name.startswith(pref)
        return cond

    keep = F.filter(F.split(rawq, "&"), _keep)
    q = F.array_join(F.array_sort(keep), "&")
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))

    # a string with no scheme://authority is not a URL -> NULL, not ':///'
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, q_part))


def host_stats(documents: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl census over normalized URLs: docs, distinct
    canonical URLs (the true page count once tracking-param and case
    noise is removed), distinct paths, total chars.

    ONE partial-agg shuffle at host grain (normalization itself is
    map-side). At 100 TB hosts are the natural skew axis — a mega-host
    is exactly what AQE skew-split handles on the agg exchange; the
    output is hosts-sized (metadata grain).
    """
    u = F.col(url_col)
    norm = normalize_url(u)
    return (
        documents.select(
            url_host(u).alias("host"),
            norm.alias("url_norm"),
            F.regexp_extract(norm, _PATH_RE, 1).alias("path"),
            F.length("text").alias("chars"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url_norm").alias("n_urls"),
            F.countDistinct("path").alias("n_paths"),
            F.sum("chars").alias("total_chars"),
        )
    )


def url_dedup(
    documents: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_exact: tuple[str, ...] = TRACKING_EXACT,
    tracking_prefixes: tuple[str, ...] = TRACKING_PREFIXES,
) -> DataFrame:
    """URL-level dedup: one survivor per normalized URL (lowest id —
    deterministic; swap the ordering for recency when a fetch
    timestamp exists). Returns (id, url_norm, keep).

    Top-1-per-key window on url_norm: one hash shuffle at canonical-URL
    grain, partition-local sort — the maxVersions/latest-per-key shape
    (SURVEY §2.2) applied at the web-corpus grain. Never a self-join.

    Docs whose URL does not parse (url_norm NULL) are NOT duplicates of
    each other — they all keep, and they are EXCLUDED from the window
    input (not merely exempted from its verdict): a NULL key would
    hash every unparseable doc onto one window partition and sort them
    all on a single task — the hot-key hazard — for row numbers the
    filter would ignore anyway.
    """
    norm = normalize_url(F.col(url_col), tracking_exact, tracking_prefixes)
    base = documents.select(F.col(id_col), norm.alias("url_norm"))
    w = Window.partitionBy("url_norm").orderBy(F.col(id_col).asc())
    parsed = (
        base.filter(F.col("url_norm").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .select(id_col, "url_norm", (F.col("rn") == 1).alias("keep"))
    )
    unparsed = base.filter(F.col("url_norm").isNull()).select(
        id_col, "url_norm", F.lit(True).alias("keep")
    )
    return parsed.unionByName(unparsed)
