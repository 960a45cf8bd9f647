"""Robots-exclusion URL filtering — RFC 9309 longest-match semantics.

A crawl pipeline holds a parsed rules table (one row per host × path
prefix, allow or disallow — the output of fetching robots.txt per host)
and must filter billions of candidate URLs against it.  RFC 9309 §2.2.2
resolves conflicts by the LONGEST matching rule; allow wins ties.  This
module implements exactly that over (host, path) prefixes — the core
robots semantics without '*' wildcards (a prefix rules table is what a
production parser materializes anyway; wildcard rules expand to their
literal prefix at parse time or are handled upstream).

Scale shape: the rules table is per-host metadata — millions of rows at
worst, always broadcastable — so the decision is ONE broadcast join
keyed on host plus a per-URL max-over-matching-rules aggregate.  The
URL table never shuffles.  URLs on hosts with no rules are allowed
(RFC 9309 §2.3.1.2: absent robots.txt means unrestricted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amanogawa_spark.functions.url import host_of, path_of


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """(url, allowed, rule_pattern) — RFC 9309 longest-match decision.

    ``rules``: (host, pattern, allow) — ``pattern`` a path prefix
    ('/private/'), ``allow`` boolean.  Longest matching pattern wins;
    allow wins length ties; no matching rule (or no rules for the host)
    means allowed with NULL rule_pattern.
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("_host"),
        path_of(F.col(url_col)).alias("_path"),
    )
    r = rules.select(
        F.col("host").alias("_host"),
        F.col("pattern").alias("_pat"),
        F.col("allow").cast("boolean").alias("_allow"),
    )
    matched = (
        u.join(F.broadcast(r), "_host", "left")
        .withColumn(
            "_hit",
            F.col("_pat").isNotNull() & F.col("_path").startswith(F.col("_pat")),
        )
        .groupBy("url")
        .agg(
            # winner = max over matching rules of (pattern length, allow,
            # pattern) — longest first, allow beats disallow on ties, the
            # lexicographically-greatest pattern as a final deterministic
            # tie-break between equal-length same-verdict rules
            F.max(
                F.when(
                    F.col("_hit"),
                    F.struct(
                        F.length("_pat").alias("l"),
                        F.col("_allow").alias("a"),
                        F.col("_pat").alias("p"),
                    ),
                )
            ).alias("_win"),
        )
        .select(
            "url",
            F.coalesce(F.col("_win.a"), F.lit(True)).alias("allowed"),
            F.col("_win.p").alias("rule_pattern"),
        )
    )
    return matched


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """The original URL rows with disallowed URLs removed (semi-join
    against the allowed decisions — caller keeps their columns)."""
    allowed = robots_decisions(urls, rules, url_col).filter(F.col("allowed"))
    return urls.join(
        allowed.select(F.col("url").alias(url_col)), url_col, "left_semi"
    )


def sitemap_directives(col) -> "F.Column":
    """array<string> of Sitemap: URLs from a raw robots.txt body — the
    crawl-seed discovery half of RFC 9309 (the Sitemap extension field is
    case-insensitive and may appear anywhere in the file, outside any
    user-agent group). Pure Catalyst regexp; map-side in the scan."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.regexp_extract_all(c, F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)[ \t]*$"), 1),
        F.trim,
    )


def parse_sitemap(col) -> "F.Column":
    """array<struct<loc,lastmod>> from a sitemap.xml body: every <url>
    entry's <loc> plus its <lastmod> when present (empty string when
    absent — a struct field, so downstream nullability stays simple).
    Handles <sitemapindex> files too (their <loc> entries are child
    sitemap URLs — the caller recurses the fetch). Pure Catalyst: one
    regexp_extract_all over <url>/<sitemap> blocks, then per-block field
    extracts; no UDF, no XML library, scan-side."""
    c = F.col(col) if isinstance(col, str) else col
    blocks = F.regexp_extract_all(
        c, F.lit(r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), 1
    )
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, r"(?s)<loc>\s*(.*?)\s*</loc>", 1).alias("loc"),
            F.regexp_extract(b, r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1).alias(
                "lastmod"
            ),
        ),
    )
