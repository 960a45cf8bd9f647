"""Graph construction: pages → vertex dictionary + deduplicated edge table.

Reference semantics (``plugin/flow/to_graph/to_graph.cpp``):
- vertices are the input rows; ids are dense ordinals (``to_graph.cpp:180-186``),
- edges are deduplicated via an adjacency set (``to_graph.cpp:82-86``),
- optional canonicalization min/max for undirected graphs (``to_graph.cpp:111-114``).

Spark-first re-expression:
- **dense ids** come from a global ``row_number() over (order by url)`` —
  deterministic under any input partitioning (the north rule's invariance
  requirement). This is one range-partitioned sort of the *distinct url*
  set, not of the raw pages; at 10^12 pages it is the one unavoidable
  dictionary-build shuffle and is embarrassingly range-parallel.
- **hash ids** (``id_mode='hash'``): ``xxhash64(url)`` — shuffle-free,
  collision-checked, for when dense ordinals aren't required.
- edge resolution is two hash joins url→id; dedup is a hash aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amanogawa_spark.functions.html import extract_links


@dataclass
class Graph:
    vertices: DataFrame  # (url string, id long)
    edges: DataFrame  # (src_id long, dst_id long) — directed, deduped, no self-loops


def dense_rank_ids(
    df: DataFrame,
    order_col: str,
    num_partitions: int | None = None,
    out_col: str = "id",
) -> DataFrame:
    """Append a global dense 0..N-1 ``id`` by ``order_col`` sort order —
    WITHOUT the single-partition global window (``Window.orderBy(col)``
    with no partitionBy funnels every row through one task; at 10^12 urls
    that is the whole dictionary on one executor).

    Scalable formulation: ``repartitionByRange`` gives range-ordered
    partitions; a tiny per-partition count job gives each range's global
    offset; ``row_number`` *within* each range partition (a parallel
    window keyed by partition id) + offset = global rank. The result is
    invariant to where the sampled range boundaries fall — the final id
    always equals the global sorted rank — so ids are stable under input
    repartitioning (the north rule's determinism requirement).
    """
    spark = df.sparkSession
    n_part = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.repartitionByRange(n_part, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        ranged.join(offset_df, "_pid")
        .withColumn(
            out_col, (F.row_number().over(w) - 1 + F.col("_offset")).cast("long")
        )
        .drop("_pid", "_offset")
        .persist()
    )
    # materialize the result BEFORE dropping the intermediate cache — the
    # ranked output must not silently leak a second cached copy of the
    # whole dictionary for the session lifetime (callers may unpersist the
    # returned frame when done)
    out.count()
    ranged.unpersist()
    return out


def build_vertices(
    pages: DataFrame, id_mode: str = "dense", normalize: bool = False
) -> DataFrame:
    """url → int64 id dictionary over the pages table.

    dense: ids are 0..N-1 by url sort order (repartition-invariant).
    hash: xxhash64(url) (no global sort; caller should collision-check).
    surt: ids are 0..N-1 by SURT-key order (reversed host labels — a
    domain and its subdomains get CONTIGUOUS ids, the WebGraph/BV
    URL-ordering trick: neighbor gaps shrink, so the gap-encoded
    adjacency compresses measurably better than hash ids; see
    ``graph/compress.py`` and ``tools/layout_probe.py``). The rank key is
    surt\\x01url, so distinct urls with equal SURTs still get unique,
    repartition-invariant ids.
    ``normalize``: canonicalize keys first (functions/url.py) so
    crawl-duplicate spellings collapse to one vertex — keep the flag
    consistent with :func:`build_edges` or link targets miss the
    dictionary.
    """
    if normalize:
        from amanogawa_spark.functions.url import normalize_url

        pages = pages.select(normalize_url(F.col("url")).alias("url"))
    urls = pages.select("url").distinct()
    if id_mode == "hash":
        return urls.select("url", F.xxhash64("url").alias("id"))
    if id_mode == "surt":
        from amanogawa_spark.functions.url import surt_key

        keyed = urls.select(
            "url",
            F.concat_ws("\x01", surt_key(F.col("url")), F.col("url")).alias("_sk"),
        )
        ranked = dense_rank_ids(keyed, "_sk")
        # checkpoint the projection and release the ranker cache — a bare
        # .select() wrapper would orphan the persisted (url,_sk,id) frame
        out = ranked.select("url", "id").localCheckpoint(eager=True)
        ranked.unpersist()
        return out
    if id_mode != "dense":
        raise ValueError(f"unknown id_mode: {id_mode}")
    # returned frame IS the persisted ranker output (columns url, id) — no
    # projection wrapper, so callers can release the cache with .unpersist()
    return dense_rank_ids(urls, "url")


def extract_edges_urls(pages: DataFrame, normalize: bool = False) -> DataFrame:
    """pages → (src_url, dst_url): explode extracted hrefs, drop self-links, dedup."""
    src_u = F.col("url")
    dst_u = F.explode(extract_links("html"))
    if normalize:
        from amanogawa_spark.functions.url import normalize_url

        e = pages.select(
            normalize_url(src_u).alias("src_url"), dst_u.alias("dst_url")
        ).select("src_url", normalize_url(F.col("dst_url")).alias("dst_url"))
    else:
        e = pages.select(src_u.alias("src_url"), dst_u.alias("dst_url"))
    return e.filter(F.col("src_url") != F.col("dst_url")).distinct()


def build_edges(
    pages: DataFrame,
    vertices: DataFrame,
    undirected: bool = False,
    broadcast_vertices: bool = False,
    normalize: bool = False,
) -> DataFrame:
    """Resolve url edges to int64 id edges; drop links to unknown urls.

    ``broadcast_vertices`` skips the shuffle when the dictionary fits in
    executor memory (small graphs / tests). At web scale both joins are
    shuffle hash joins on url — AQE handles hub-domain skew on dst_url.
    """
    vsrc = vertices.select(F.col("url").alias("src_url"), F.col("id").alias("src_id"))
    vdst = vertices.select(F.col("url").alias("dst_url"), F.col("id").alias("dst_id"))
    if broadcast_vertices:
        vsrc, vdst = F.broadcast(vsrc), F.broadcast(vdst)
    e = (
        extract_edges_urls(pages, normalize=normalize)
        .join(vsrc, "src_url")
        .join(vdst, "dst_url")
        .select("src_id", "dst_id")
    )
    if undirected:
        e = e.select(
            F.least("src_id", "dst_id").alias("src_id"),
            F.greatest("src_id", "dst_id").alias("dst_id"),
        )
    return e.distinct()


def build_graph(
    pages: DataFrame,
    id_mode: str = "dense",
    undirected: bool = False,
    normalize: bool = False,
) -> Graph:
    vertices = build_vertices(pages, id_mode=id_mode, normalize=normalize)
    edges = build_edges(pages, vertices, undirected=undirected, normalize=normalize)
    return Graph(vertices=vertices, edges=edges)


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree) — full outer of the two degree aggs."""
    out_d = edges.groupBy(F.col("src_id").alias("id")).agg(F.count("*").alias("out_degree"))
    in_d = edges.groupBy(F.col("dst_id").alias("id")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "id", "full_outer")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def rollup_edges(
    edges: DataFrame,
    group_expr,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Aggregate a page-level edge table to a coarser graph (page → domain).

    ``group_expr``: callable mapping an id Column to its group id (e.g.
    ``lambda c: c % 50`` for a modular fixture, or a url→domain lookup
    join upstream). Multi-edges collapse into a ``weight`` count so the
    rolled-up graph feeds :func:`amanogawa_spark.graph.pagerank.pagerank`
    with ``weight_col='weight'`` — the standard host-graph construction
    for web ranking (domain-level PageRank over Common-Crawl uses exactly
    this shape; hub domains keep their aggregate link mass).

    Scale: ONE hash shuffle on the (group_src, group_dst) pair — the
    map-side partial count collapses the fan-in before the exchange, so a
    domain receiving 10^9 page links moves one partial row per upstream
    partition, not 10^9 rows. Self-loops (intra-domain links) are dropped
    by default: they dominate raw counts (~most links are site-internal)
    and carry no cross-domain ranking signal.
    """
    src_g = group_expr(F.col("src_id")).alias("src_id")
    dst_g = group_expr(F.col("dst_id")).alias("dst_id")
    grouped = edges.select(src_g, dst_g)
    if drop_self_loops:
        grouped = grouped.filter(F.col("src_id") != F.col("dst_id"))
    return grouped.groupBy("src_id", "dst_id").agg(F.count("*").alias("weight"))


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row (n_edges, n_reciprocal, reciprocity) — the fraction of
    directed edges whose reverse edge also exists. A standard web-graph
    health statistic (link farms and boilerplate navigation push it up;
    organic citation-style linking keeps it low). One self-join on the
    canonical pair key — the reversed probe reuses the same hash
    partitioning, so this is a single shuffle."""
    e = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    rev = e.select(
        F.col("dst_id").alias("src_id"), F.col("src_id").alias("dst_id")
    )
    recip = e.join(rev, ["src_id", "dst_id"], "left_semi")
    return e.agg(F.count("*").alias("n_edges")).crossJoin(
        recip.agg(F.count("*").alias("n_reciprocal"))
    ).select(
        "n_edges",
        "n_reciprocal",
        (F.col("n_reciprocal") / F.col("n_edges")).alias("reciprocity"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One-row (assortativity) — Pearson correlation between source
    out-degree and destination in-degree across directed edges. Negative
    on bowtie web graphs (hubs point at low-in-degree leaves); a strong
    positive value flags a spam-farm-like core. Two degree aggregates +
    two broadcast-size joins + one moment-sum aggregate.

    Pearson's r is assembled from the closed-form moment sums
    (n, Σx, Σy, Σx², Σy², Σxy) rather than ``F.corr`` — Spark 4's builtin
    raises ANSI DIVIDE_BY_ZERO when either degree sequence has zero
    variance (e.g. every destination has in-degree 1); the explicit
    ``try_divide`` form returns NULL there instead of failing the job.
    """
    e = (
        edges.select("src_id", "dst_id")
        .filter(F.col("src_id") != F.col("dst_id"))
        .distinct()
    )
    out_d = e.groupBy(F.col("src_id")).agg(F.count("*").alias("od"))
    in_d = e.groupBy(F.col("dst_id")).agg(F.count("*").alias("idg"))
    x = F.col("od").cast("double")
    y = F.col("idg").cast("double")
    sums = (
        e.join(out_d, "src_id")
        .join(in_d, "dst_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        F.try_divide(cov, F.sqrt(vx) * F.sqrt(vy)).alias("assortativity")
    )


def degree_histogram(edges: DataFrame, col: str = "dst_id") -> DataFrame:
    """log2-bucketed degree histogram — the skew-detection job that sizes
    salting factors for hub vertices (SURVEY.md §4.2)."""
    deg = edges.groupBy(col).agg(F.count("*").alias("degree"))
    return (
        deg.select(F.floor(F.log2("degree")).cast("int").alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count("*").alias("n_vertices"))
        .orderBy("log2_bucket")
    )


def freshness_weights(
    edges: DataFrame,
    ts_col: str = "warc_ts",
    now: float | str | None = None,
    half_life_days: float = 30.0,
    weight_col: str = "weight",
) -> DataFrame:
    """Add an exponential-decay edge weight from the crawl timestamp:
    ``weight = 2^(-age_days / half_life_days)`` — links found in fresh
    crawls count fully, stale links decay smoothly, so a
    ``weight_col``-fed :func:`~amanogawa_spark.graph.pagerank.pagerank`
    becomes freshness-weighted (recency-biased ranking over the
    input-hint ``warc_ts`` column without touching the algorithm).

    ``now``: the reference instant — REQUIRED, as an epoch-seconds float
    or a timestamp string; the engine never reads the wall clock, so
    reruns and resumed superjobs score identically. Pure map-side
    column arithmetic; no shuffle.
    """
    if now is None:
        raise ValueError(
            "freshness_weights: pass `now` explicitly (epoch seconds or "
            "timestamp string) — determinism forbids reading the clock"
        )
    if isinstance(now, str):
        now_sec = F.lit(now).cast("timestamp").cast("double")
    else:
        now_sec = F.lit(float(now))
    age_days = (now_sec - F.col(ts_col).cast("timestamp").cast("double")) / 86400.0
    return edges.withColumn(
        weight_col, F.pow(F.lit(2.0), -age_days / F.lit(float(half_life_days)))
    )
