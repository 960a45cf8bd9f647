"""Cross-lingual page alignment from hreflang declarations — bitext mining.

A multilingual site declares its translation set on every page via
``<link rel="alternate" hreflang=..>``; those declarations are the
highest-precision translation-pair signal on the web (WMT shared tasks
mine bitext from exactly this). These operators turn raw HTML into
(a) declaration edges and (b) variant clusters whose members are the
same document in different languages — the unit a translation-pair
miner consumes.

Scale shape: extraction is a scan-side Arrow map
(:func:`~amanogawa_spark.functions.html.extract_hreflangs`); clustering
is MAP-SIDE ONLY — a spec-compliant page declares its FULL variant set,
so ``cluster_id = min({url} ∪ {declared hrefs})`` is identical across
the set's members without any join or iteration. (For sites with
incomplete declarations, run
:func:`~amanogawa_spark.graph.components.connected_components` over
:func:`hreflang_edges` for the strict transitive closure — the
machinery exists; the map-side key is the 100 TB default because it
touches each page once.)

Reference parity: no equivalent (the reference has no multilingual or
HTML surface beyond its CSV/JSON/XML formats); engine addition for the
multilingual training-data story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hreflang_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, hreflang, href): one row per declared language variant
    (self-references included when the page declares itself, as
    spec-compliant sites do). Scan-side map + one explode; nothing
    shuffles."""
    from amanogawa_spark.functions.html import extract_hreflangs

    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.explode(extract_hreflangs(F.col(html_col))).alias("_v"),
        )
        .select("url", F.col("_v.hreflang").alias("hreflang"), F.col("_v.href").alias("href"))
    )


def hreflang_clusters(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, cluster_id, n_variants): the page's translation-set cluster.
    ``cluster_id`` = lexicographic min over {own url} ∪ {declared
    variant urls} — identical for every member of a fully-declared set,
    so the whole clustering is one map stage. Pages with no hreflang
    declarations form singleton clusters (cluster_id = own url,
    n_variants = 1). ``n_variants`` counts DISTINCT urls in the declared
    set including self."""
    from amanogawa_spark.functions.html import extract_hreflangs

    hrefs = F.array_distinct(
        F.concat(
            F.transform(
                extract_hreflangs(F.col(html_col)), lambda v: v["href"]
            ),
            F.array(F.col(url_col)),
        )
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.array_min(hrefs).alias("cluster_id"),
        F.size(hrefs).cast("long").alias("n_variants"),
    )
