"""Cluster entry point: continuous-crawl increment → graph upsert → warm/repaired PageRank.

``--recrawl`` switches the store to replacement semantics (a re-crawled
page REPLACES its out-link set; zero-out-link recrawls erase stale
links) and, when the url universe is unchanged, repairs the previous
rank vector from the edge diff (graph/incremental.py) instead of
re-iterating the whole graph — measured 1.86x a cold rerun at the
sandbox bench shape, churn-bound at scale.

The incremental superjob the north star describes: each invocation takes
ONE new crawl batch (a pages parquet directory), appends only the novel
urls/links to the persistent graph store (url-level storage; see
``streaming/ingest.py`` for why that keeps the graph incrementally
exact), then re-converges PageRank warm-started from the previous run's
vector — measured at 1 iteration on a recrawl (BENCH/BASELINE.md), vs
~41 cold. Ships with ``--py-files dist/amanogawa_spark.zip``.

    spark-submit --py-files dist/amanogawa_spark.zip \
      tools/run_incremental_job.py \
      --new-pages /data/crawl/2026-08-17 --store /data/graph_store \
      --ranks-out /data/ranks/2026-08-17 \
      --warm-ranks /data/ranks/2026-08-16/ranks

Repeated daily, total work per day is O(batch + graph-delta), not
O(whole-graph rebuild).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new-pages", required=True, help="this increment's pages parquet")
    ap.add_argument("--store", required=True, help="persistent graph store dir (vertices/, edges_url/)")
    ap.add_argument("--ranks-out", required=True, help="output dir for this run's ranks")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--warm-ranks", default=None, help="previous run's ranks parquet")
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--normalize-urls", action="store_true")
    ap.add_argument(
        "--recrawl",
        action="store_true",
        help="replacement semantics: a re-crawled page REPLACES its out-link "
        "set (versioned store, streaming/ingest.py append_recrawl) and ranks "
        "are repaired from the edge diff (graph/incremental.py) when the url "
        "universe is unchanged — falling back to warm pagerank when new "
        "pages were discovered",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from amanogawa_spark.checkpoint import CheckpointManager
    from amanogawa_spark.graph.build import extract_edges_urls
    from amanogawa_spark.graph.pagerank import pagerank
    from amanogawa_spark.streaming.ingest import (
        _append_novel,
        append_recrawl,
        resolve_current_edges,
        resolve_id_edges,
    )

    spark = SparkSession.builder.appName("amanogawa_incremental").getOrCreate()
    batch = spark.read.parquet(args.new_pages)
    warm = (
        spark.read.parquet(args.warm_ranks) if args.warm_ranks is not None else None
    )
    mode = "warm"

    if args.recrawl:
        # 1r. replacement upsert; pin the BEFORE view first (snapshot-
        # isolated read, so the diff is before-vs-after, not after-vs-after)
        import os as _os

        has_prior = _os.path.exists(f"{args.store}/crawled_v")
        old_edges = (
            resolve_current_edges(spark, args.store) if has_prior else None
        )
        n_verts_before = (
            spark.read.parquet(f"{args.store}/vertices").count()
            if _os.path.exists(f"{args.store}/vertices")
            else 0
        )
        append_recrawl(spark, batch, args.store, normalize=args.normalize_urls)
        vertices = spark.read.parquet(f"{args.store}/vertices").select("id")
        edges = resolve_current_edges(spark, args.store)
        universe_unchanged = (
            has_prior and warm is not None and vertices.count() == n_verts_before
        )
        if universe_unchanged:
            from amanogawa_spark.graph.incremental import incremental_pagerank

            mode = "repair"
            result = incremental_pagerank(
                warm, old_edges, edges, damping=args.damping, tol=args.tol
            )
    else:
        # 1. graph upsert: novel urls + novel url-edges only (append-only)
        url_col = F.col("url")
        if args.normalize_urls:
            from amanogawa_spark.functions.url import normalize_url

            url_col = normalize_url(url_col)
        verts = batch.select(url_col.alias("url")).distinct().select(
            "url", F.xxhash64("url").alias("id")
        )
        _append_novel(spark, verts, f"{args.store}/vertices", ["url"])
        edges_url = extract_edges_urls(batch, normalize=args.normalize_urls)
        _append_novel(
            spark, edges_url, f"{args.store}/edges_url", ["src_url", "dst_url"]
        )
        vertices = spark.read.parquet(f"{args.store}/vertices").select("id")
        edges = resolve_id_edges(spark, args.store)

    if mode == "warm":
        # 3. warm-start PageRank on the updated graph
        ck = (
            CheckpointManager(spark, args.checkpoint_dir)
            if args.checkpoint_dir is not None
            else None
        )
        result = pagerank(
            vertices,
            edges,
            damping=args.damping,
            tol=args.tol,
            max_iter=args.max_iter,
            checkpoint=ck,
            initial_ranks=warm,
        )
    result.ranks.write.mode("overwrite").parquet(f"{args.ranks_out}/ranks")
    print(
        json.dumps(
            {
                "mode": mode,
                "new_pages": batch.count(),
                "graph_vertices": vertices.count(),
                "graph_edges": edges.count(),
                "pagerank_iterations": result.iterations,
                "delta": result.delta,
            }
        )
    )


if __name__ == "__main__":
    main()
