"""URL parsing/normalization — the vertex-key hygiene layer for web graphs.

At 10^12 pages the url→id dictionary is only as good as its key: the
same page crawled as ``HTTP://Example.com:80/a/`` and
``http://example.com/a`` must collapse to one vertex or the link graph
fragments (reference parity: the to_graph dictionary keys raw strings,
``plugin/flow/to_graph/to_graph.cpp:60-80`` — normalization is the
engine's addition for crawl-scale input). All functions are pure
Catalyst ``regexp_extract``/string expressions restricted to basic
regex syntax so a DuckDB oracle can evaluate the identical pattern —
no Python, no UDFs, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://[userinfo@]host[:port]/path...  — capture the host
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"

# second-level labels under which the registered domain needs three labels
# (heuristic subset of the public-suffix list — deterministic, documented)
_SECOND_LEVEL = ("co", "com", "net", "org", "ac", "gov", "edu")


def host_of(url: Column | str) -> Column:
    """Lowercased host (authority minus userinfo/port); '' for non-URLs."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def registered_domain(url: Column | str) -> Column:
    """eTLD+1 heuristic: last two host labels, or three when the middle
    label is a common second-level registry (co.uk, com.au, ...)."""
    host = host_of(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    take3 = (n >= 3) & second.isin(*_SECOND_LEVEL)
    return F.when(
        n >= 3,
        F.when(
            take3,
            F.concat_ws(
                ".",
                F.element_at(parts, -3),
                second,
                F.element_at(parts, -1),
            ),
        ).otherwise(F.concat_ws(".", second, F.element_at(parts, -1))),
    ).otherwise(host)


def path_of(url: Column | str) -> Column:
    """Path component ('' when absent); query/fragment excluded."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, _PATH_RE, 1)


def path_depth(url: Column | str) -> Column:
    """Number of non-empty path segments (long)."""
    p = path_of(url)
    return F.size(
        F.filter(F.split(p, "/"), lambda s: F.length(s) > 0)
    ).cast("long")


def normalize_url(url: Column | str) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped,
    fragment stripped, trailing slash on a bare path stripped.

    Deterministic textbook rules (RFC 3986 §6.2.2-6.2.3 subset) — enough
    to collapse the crawl-duplicate forms that fragment a link graph.
    """
    c = F.col(url) if isinstance(url, str) else url
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # lowercase scheme
    lowered = F.concat(
        F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)),
        F.lit("://"),
        F.regexp_replace(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.-]*://", ""),
    )
    # lowercase host (authority up to first /?# or end)
    host = F.regexp_extract(lowered, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_replace(lowered, r"^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    # strip only the scheme's own default port: :80 for http, :443 for
    # https — http://host:443/x is a distinct resource from http://host/x
    scheme = F.regexp_extract(lowered, r"^([a-z][a-z0-9+.-]*)", 1)
    lhost = F.lower(host)
    canon_host = (
        F.when(scheme == "http", F.regexp_replace(lhost, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(lhost, r":443$", ""))
        .otherwise(lhost)
    )
    joined = F.concat(scheme, F.lit("://"), canon_host, rest)
    # non-URL strings (no scheme) pass through untouched — a crawl frame
    # can carry junk keys and normalization must not manufacture them
    # into colliding '://'-prefixed values
    return F.when(
        c.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"),
        F.regexp_replace(joined, r"/$", ""),
    ).otherwise(c)


def path_prefixes(url: Column | str, max_depth: int = 3) -> Column:
    """array<string> of the URL's path prefixes up to ``max_depth``
    segments: '/a/b/c' → ['/a', '/a/b', '/a/b/c'].  Pure Catalyst
    (split/slice/transform) — generated map-side inside the scan."""
    p = path_of(url)
    segs = F.filter(F.split(p, "/"), lambda s: F.length(s) > 0)
    n = F.least(F.size(segs), F.lit(max_depth))
    # guard n >= 1: F.sequence(1, 0) would generate a DESCENDING [1, 0]
    # sequence, not an empty one
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda d: F.concat(F.lit("/"), F.array_join(F.slice(segs, 1, d), "/")),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sitemap_rollup(
    urls: "DataFrame",
    url_col: str = "url",
    weight_col: str | None = None,
    max_depth: int = 3,
) -> "DataFrame":
    """(host, prefix, depth, n_urls, weight) — the site-tree view a crawl
    operator reads: how many URLs (and how much score mass) live under
    each path prefix of each host.  One explode + ONE map-side-combined
    aggregate keyed on (host, prefix); no joins.

    Empty-path URLs roll up under '/' at depth 0.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    u = urls.select(
        host_of(F.col(url_col)).alias("host"),
        F.explode_outer(
            F.when(
                F.size(path_prefixes(F.col(url_col), max_depth)) > 0,
                path_prefixes(F.col(url_col), max_depth),
            ).otherwise(F.array(F.lit("/")))
        ).alias("prefix"),
        w.alias("_w"),
    )
    return u.groupBy("host", "prefix").agg(
        F.count("*").alias("n_urls"),
        F.round(F.sum("_w"), 8).alias("weight"),
    ).withColumn(
        "depth",
        F.when(F.col("prefix") == "/", F.lit(0)).otherwise(
            F.size(F.filter(F.split("prefix", "/"), lambda s: F.length(s) > 0))
        ).cast("int"),
    ).select("host", "prefix", "depth", "n_urls", "weight")


def surt_key(url: Column | str) -> Column:
    """Sort-friendly URI Reordering Transform key (the Heritrix/
    OpenWayback/Common-Crawl index convention, public): reversed host
    labels joined by ',', then ')' and the lowercased path and query —
    ``https://www.example.com/A/b?q=1`` → ``com,example)/a/b?q=1``.

    Why an engine needs it: a RANGE partition on the SURT key co-locates
    a registered domain with all its subdomains in contiguous partitions
    (plain host strings scatter ``a.example.com`` and ``b.example.com``
    lexically).  That is the cheap, dictionary-free version of the
    locality the clustered edge layout (graph/layout.py) buys — intra-
    domain links, the web's majority, stop crossing partition borders.
    Pure Catalyst string expressions; ``www.`` and the port are dropped,
    non-URL strings map to ''.
    """
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_replace(host_of(c), r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(path_of(c))
    q = F.lower(F.regexp_extract(c, r"\?([^#]*)", 1))
    key = F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(host != "", key).otherwise(F.lit(""))


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    wildcard_min_distinct: int = 10,
    max_depth: int = 8,
) -> DataFrame:
    """Induce per-host URL path templates — the crawler-trap / site-section
    detector: positions whose segment cardinality explodes (ids, dates,
    session tokens) generalize to ``*``, literal positions stay. Adds
    ``host``, ``n_segs``, ``template`` to every input row; '/product/123'
    and '/product/987' on one host both template to '/product/*', while
    '/about' stays itself. Calendar traps, faceted-search blowups, and
    session-id mirrors all collapse to one template whose URL count then
    screams in the rollup (:func:`sitemap_rollup` shows mass by prefix;
    this shows SHAPE).

    Position classing: within (host, n_segs, position), the segment is a
    wildcard iff its distinct-value count >= ``wildcard_min_distinct``.
    Deterministic, exact (no sketches), and engine-portable.

    Spark shape: one bounded explode (≤ ``max_depth`` rows per URL) into
    two map-side-combinable aggregates (distinct segments, then counts),
    then the O(hosts·depth²) class table — tiny next to the corpus —
    joins back on (host, n_segs) and the template is a map-side
    ``zip_with``. The URL table itself shuffles once (the join), never
    re-groups per URL.
    """
    segs = F.slice(
        F.filter(F.split(path_of(F.col(url_col)), "/"), lambda s: F.length(s) > 0),
        1,
        max_depth,
    )
    base = df.withColumn("host", host_of(F.col(url_col))).withColumn(
        "_segs", segs
    ).withColumn("n_segs", F.size("_segs").cast("int"))

    exploded = base.select(
        "host", "n_segs", F.posexplode("_segs").alias("pos", "seg")
    )
    ndist = (
        exploded.distinct()
        .groupBy("host", "n_segs", "pos")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    classes = (
        ndist.withColumn("wild", F.col("n_distinct") >= wildcard_min_distinct)
        .groupBy("host", "n_segs")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "wild"))),
                lambda x: x["wild"],
            ).alias("_wilds")
        )
    )
    out = (
        base.join(classes, ["host", "n_segs"], "left")
        .withColumn(
            "template",
            F.when(F.col("n_segs") == 0, F.lit("/")).otherwise(
                F.concat(
                    F.lit("/"),
                    F.array_join(
                        F.zip_with(
                            "_segs",
                            "_wilds",
                            lambda s, w: F.when(w, F.lit("*")).otherwise(s),
                        ),
                        "/",
                    ),
                )
            ),
        )
        .drop("_segs", "_wilds")
    )
    return out


def url_template_stats(
    df: DataFrame,
    url_col: str = "url",
    wildcard_min_distinct: int = 10,
    max_depth: int = 8,
) -> DataFrame:
    """(host, template, n_urls) — the per-host template inventory, URL
    count descending is the crawl-trap shortlist."""
    return (
        url_templates(df, url_col, wildcard_min_distinct, max_depth)
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )


def _query_param_keys(url: Column) -> Column:
    """array<string> of query-parameter names (order-preserving,
    duplicates kept) — '' when the URL has no query string."""
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    return F.filter(
        F.transform(F.split(qs, "&"), lambda kv: F.split(kv, "=")[0]),
        lambda k: F.length(k) > 0,
    )


def _base_of(url: Column) -> Column:
    """scheme://host/path with query string and fragment stripped."""
    return F.regexp_replace(url, r"[?#].*$", "")


def tracking_param_rules(
    pairs: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical_url",
    min_obs: int = 5,
    removal_frac: float = 0.9,
) -> DataFrame:
    """(host, param, n_removed, n_kept, removal_frac_r, is_tracking):
    LEARN per-host tracking-parameter rules from the site's own
    rel=canonical declarations. When a page's canonical differs from its
    URL only by dropped query parameters, every dropped parameter is the
    site saying "this parameter is non-semantic" (utm_*, gclid, session
    and click ids); a parameter that survives into the canonical is
    semantic (product ids, page numbers). Aggregated over a host's
    pages, ``is_tracking`` flags parameters dropped in ≥
    ``removal_frac`` of ≥ ``min_obs`` observations — the rule table a
    crawler's URL normalizer then applies to collapse parameter-variant
    duplicates BEFORE fetching them (:func:`normalize_url` handles
    spelling; this learns site-specific semantics no static list can).

    Input: :func:`~amanogawa_spark.operators.dedup.canonical_dedup`
    output (url, canonical_url) or any equivalent pair table. Pairs
    whose base (scheme://host/path) differs are ignored — a canonical
    pointing elsewhere says nothing about parameters.

    Scale shape: pure Catalyst parsing, one bounded explode (params per
    URL), one map-side-combined aggregate keyed (host, param). Nothing
    but (host, param) pairs shuffles.
    """
    u, c = F.col(url_col), F.col(canonical_col)
    eligible = pairs.filter((_base_of(u) == _base_of(c)) & (u != c))
    up, cp = _query_param_keys(u), _query_param_keys(c)
    obs = eligible.select(
        host_of(u).alias("host"),
        F.explode(
            F.concat(
                F.transform(
                    F.array_except(up, cp),
                    lambda p: F.struct(p.alias("param"), F.lit(1).alias("rm")),
                ),
                F.transform(
                    F.array_intersect(up, cp),
                    lambda p: F.struct(p.alias("param"), F.lit(0).alias("rm")),
                ),
            )
        ).alias("o"),
    ).select("host", F.col("o.param").alias("param"), F.col("o.rm").alias("rm"))
    agg = obs.groupBy("host", "param").agg(
        F.sum("rm").cast("long").alias("n_removed"),
        F.sum(1 - F.col("rm")).cast("long").alias("n_kept"),
    )
    frac = F.round(
        F.col("n_removed") / (F.col("n_removed") + F.col("n_kept")), 6
    )
    return agg.select(
        "host",
        "param",
        "n_removed",
        "n_kept",
        frac.alias("removal_frac_r"),
        (
            ((F.col("n_removed") + F.col("n_kept")) >= min_obs)
            & (frac >= removal_frac)
        ).alias("is_tracking"),
    )


def apply_param_rules(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "normalized_url",
) -> DataFrame:
    """Apply a learned :func:`tracking_param_rules` table: strip each
    URL's is_tracking parameters for its host → ``out_col``. The
    consumer of the rule miner — a frontier dedupes on the normalized
    URL BEFORE fetching, so parameter-variant duplicates never cost a
    request. Parameter order is preserved for the kept params;
    fragments are dropped (never sent to servers); URLs on hosts with
    no rules pass through with only the fragment strip.

    Scale shape: the rule table aggregates to one array per host
    (O(hosts) rows) and joins on host — broadcastable for most crawls,
    plain shuffle join beyond that; the rewrite itself is a map-side
    array filter.
    """
    u = F.col(url_col)
    drop_sets = (
        rules.filter(F.col("is_tracking"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("_drop"))
    )
    base = _base_of(u)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.filter(F.split(qs, "&"), lambda kv: F.length(kv) > 0),
        lambda kv: ~F.array_contains(F.col("_drop"), F.split(kv, "=")[0]),
    )
    rebuilt = F.when(F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))).otherwise(base)
    no_rules = F.regexp_replace(u, r"#.*$", "")
    return (
        df.withColumn("_h", host_of(u))
        .join(drop_sets.withColumnRenamed("host", "_h"), "_h", "left")
        .withColumn(
            out_col,
            F.when(F.col("_drop").isNotNull(), rebuilt).otherwise(no_rules),
        )
        .drop("_h", "_drop")
    )
