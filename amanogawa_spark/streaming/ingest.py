"""Continuous crawl ingestion: streaming pages → incrementally exact graph.

The north-star deployment appends crawl batches forever; this module
keeps the url dictionary and the url-edge set incrementally EXACT —
after any number of micro-batches the stored tables equal a batch
rebuild over every page seen (tested) — so the downstream incremental
algorithms (PageRank warm start, append-only CC) always operate on the
same graph a from-scratch job would build.

Two design decisions make incremental exactness possible:

- **hash vertex ids** (``xxhash64(url)``): the only id mode assignable
  with zero cross-batch coordination — a dense ranker would renumber on
  every batch. Matches ``build_vertices(id_mode='hash')``.
- **url-level edge storage**: edges persist as ``(src_url, dst_url)``
  and resolve to id edges at READ time against the current dictionary
  (:func:`resolve_id_edges`, dropping targets never crawled — the batch
  ``build_edges`` rule). A link whose target page arrives three batches
  later automatically joins the graph then; storing resolved id-edges
  instead would lose it forever.

Each micro-batch appends only NOVEL rows (left-anti against the current
store): append-only parquet, no rewrite, no compaction needed for
correctness. The batch stream itself shuffles only the new batch (small)
against the store's bloom-pruned scan — at 10^12 scale the anti-join is
the standard "dedup against the ledger" shape that bucketing the store
by the join key keeps bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amanogawa_spark.graph.build import extract_edges_urls

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _append_novel(spark: SparkSession, batch: DataFrame, path: str, keys: list[str]):
    """Append rows of ``batch`` whose key is not yet in the parquet set."""
    novel = batch.dropDuplicates(keys)
    if os.path.exists(path):
        existing = spark.read.parquet(path).select(*keys)
        novel = novel.join(existing, keys, "left_anti")
    novel.write.mode("append").parquet(path)


def streaming_graph_ingest(
    spark: SparkSession,
    pages_path: str,
    store_dir: str,
    checkpoint_dir: str | None = None,
    normalize: bool = False,
):
    """Start (and return) the ingestion query. Tables under ``store_dir``:

    - ``vertices/``: (url, id) — one row per crawled page url, hash ids;
    - ``edges_url/``: (src_url, dst_url) — the deduped directed link set.

    Drive synchronously in tests with ``query.processAllAvailable()``.
    """
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_path)
    v_path = os.path.join(store_dir, "vertices")
    e_path = os.path.join(store_dir, "edges_url")

    if normalize:
        from amanogawa_spark.functions.url import normalize_url

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        url_col = (
            normalize_url(F.col("url")) if normalize else F.col("url")
        )
        verts = batch_df.select(
            url_col.alias("url")
        ).distinct().select("url", F.xxhash64("url").alias("id"))
        _append_novel(spark, verts, v_path, ["url"])
        edges = extract_edges_urls(batch_df, normalize=normalize)
        _append_novel(spark, edges, e_path, ["src_url", "dst_url"])

    writer = stream.writeStream.foreachBatch(upsert)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def resolve_id_edges(spark: SparkSession, store_dir: str) -> DataFrame:
    """(src_id, dst_id) — the current graph: url edges resolved against the
    current dictionary, links to never-crawled urls dropped (the batch
    ``build_edges`` contract)."""
    v = spark.read.parquet(os.path.join(store_dir, "vertices"))
    e = spark.read.parquet(os.path.join(store_dir, "edges_url"))
    vsrc = v.select(F.col("url").alias("src_url"), F.col("id").alias("src_id"))
    vdst = v.select(F.col("url").alias("dst_url"), F.col("id").alias("dst_id"))
    return e.join(vsrc, "src_url").join(vdst, "dst_url").select("src_id", "dst_id").distinct()


def append_recrawl(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    normalize: bool = False,
) -> int:
    """Recrawl-aware upsert: a re-crawled page REPLACES its out-link set.

    ``_append_novel`` models pure discovery (append-only novelty) — a
    link the page DROPPED between crawls lingers forever. This variant
    writes each batch under a crawl generation (``edges_url_v/gen=k/``
    plus a ``crawled_v/gen=k/`` manifest of which source urls the batch
    covered) and :func:`resolve_current_edges` reads, per source url,
    only the LATEST generation that crawled it — the Iceberg
    upsert-by-partition semantic expressed over plain parquet, so the
    sandbox stays dependency-free while the production swap-in is a
    one-line MERGE INTO. The manifest is what makes a zero-out-link
    recrawl erase stale links: edge rows alone cannot express "this
    page now links to nothing".

    Append-only writes, no rewrite; periodic compaction (rewrite each
    url's current generation into gen=0) bounds read amplification at
    real scale exactly as Iceberg snapshot expiry would. Returns the
    generation number written.
    """
    if normalize:
        from amanogawa_spark.functions.url import normalize_url

        url_col = normalize_url(F.col("url"))
    else:
        url_col = F.col("url")

    verts = batch.select(url_col.alias("url")).distinct().select(
        "url", F.xxhash64("url").alias("id")
    )
    _append_novel(spark, verts, os.path.join(store_dir, "vertices"), ["url"])

    cr_root = os.path.join(store_dir, "crawled_v")
    gen = 0
    if os.path.exists(cr_root):
        gens = [
            int(d.split("=", 1)[1])
            for d in os.listdir(cr_root)
            if d.startswith("gen=")
        ]
        gen = (max(gens) + 1) if gens else 0
    edges = extract_edges_urls(batch, normalize=normalize).dropDuplicates(
        ["src_url", "dst_url"]
    )
    edges.write.mode("overwrite").parquet(
        os.path.join(store_dir, "edges_url_v", f"gen={gen}")
    )
    batch.select(url_col.alias("url")).distinct().write.mode("overwrite").parquet(
        os.path.join(cr_root, f"gen={gen}")
    )
    return gen


def _gen_paths(root: str) -> list[str]:
    return sorted(
        os.path.join(root, d)
        for d in os.listdir(root)
        if d.startswith("gen=")
    )


def resolve_current_edges(spark: SparkSession, store_dir: str) -> DataFrame:
    """(src_id, dst_id) under replacement semantics: per source url, the
    out-links of its latest crawl generation; targets never crawled are
    dropped (same contract as :func:`resolve_id_edges`).

    SNAPSHOT ISOLATION: the generation list is pinned at CALL time
    (explicit paths, not a ``gen=*`` glob) — a frame returned here keeps
    meaning the store as-of-now even after later ``append_recrawl``
    writes, exactly like reading a fixed Iceberg snapshot id. Without
    the pin, a before/after pair of views (the incremental-repair input)
    silently converges to the same data wherever the cache is missed.
    """
    cr_root = os.path.join(store_dir, "crawled_v")
    e_root = os.path.join(store_dir, "edges_url_v")
    cr = spark.read.option("basePath", cr_root).parquet(*_gen_paths(cr_root))
    cur = cr.groupBy("url").agg(F.max("gen").alias("gen")).withColumnRenamed(
        "url", "src_url"
    )
    e = spark.read.option("basePath", e_root).parquet(*_gen_paths(e_root))
    e_cur = e.join(cur, ["src_url", "gen"]).select("src_url", "dst_url")
    v = spark.read.parquet(os.path.join(store_dir, "vertices"))
    vsrc = v.select(F.col("url").alias("src_url"), F.col("id").alias("src_id"))
    vdst = v.select(F.col("url").alias("dst_url"), F.col("id").alias("dst_id"))
    return (
        e_cur.join(vsrc, "src_url")
        .join(vdst, "dst_url")
        .select("src_id", "dst_id")
        .distinct()
    )
