"""Cluster entry point: continuous-crawl increment → graph upsert → warm PageRank.

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
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from amanogawa_spark.checkpoint import CheckpointManager
    from amanogawa_spark.graph.build import extract_edges_urls
    from amanogawa_spark.graph.pagerank import pagerank
    from amanogawa_spark.streaming.ingest import _append_novel, resolve_id_edges

    spark = SparkSession.builder.appName("amanogawa_incremental").getOrCreate()
    batch = spark.read.parquet(args.new_pages)

    # 1. graph upsert: novel urls + novel url-edges only (append-only parquet)
    url_col = F.col("url")
    if args.normalize_urls:
        from amanogawa_spark.functions.url import normalize_url

        url_col = normalize_url(url_col)
    verts = batch.select(url_col.alias("url")).distinct().select(
        "url", F.xxhash64("url").alias("id")
    )
    _append_novel(spark, verts, f"{args.store}/vertices", ["url"])
    edges_url = extract_edges_urls(batch, normalize=args.normalize_urls)
    _append_novel(spark, edges_url, f"{args.store}/edges_url", ["src_url", "dst_url"])

    # 2. current graph view
    vertices = spark.read.parquet(f"{args.store}/vertices").select("id")
    edges = resolve_id_edges(spark, args.store)

    # 3. warm-start PageRank on the updated graph
    warm = (
        spark.read.parquet(args.warm_ranks) if args.warm_ranks is not None else None
    )
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
