"""Cluster entry point: pages table → link graph → converged PageRank.

Ships with ``--py-files dist/amanogawa_spark.zip`` (see tools/package.sh).
The same superjob the tests/bench run locally, parameterized for a real
deployment: reads a pages table (parquet directory or, with the Iceberg
catalog configured, an Iceberg table name), writes vertices/edges/ranks,
checkpoints every k iterations so the job is resumable.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path or iceberg table")
    ap.add_argument("--out", required=True, help="output root (vertices/, edges/, ranks/)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--id-mode", choices=["dense", "hash"], default="dense")
    ap.add_argument(
        "--normalize-urls", action="store_true",
        help="canonicalize page/link urls before the dictionary joins "
        "(collapses crawl-duplicate spellings; functions/url.py)",
    )
    ap.add_argument(
        "--warm-ranks", default=None,
        help="parquet path of a previous run's ranks (id, rank) — warm-start "
        "the power iteration for incremental recrawls",
    )
    ap.add_argument(
        "--blockrank", action="store_true",
        help="no previous ranks? warm-start from the BlockRank init "
        "(graph/blockrank.py): per-host local PageRank × size-teleport "
        "quotient rank — cuts global iterations on host-local graphs",
    )
    ap.add_argument(
        "--blockrank-min-edges", type=int, default=10_000_000,
        help="work gate for --blockrank: below this edge count the init's "
        "fixed barrier-job ladder costs more wall than the saved global "
        "iterations recoup (measured, BENCH_r04), so the warm start is "
        "skipped with a notice; 0 forces it",
    )
    ap.add_argument(
        "--adaptive", action="store_true",
        help="keep AQE enabled inside the iteration loop (default off — "
        "see graph/iter_conf.py; opt in for AQE skew-splitting)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from amanogawa_spark.checkpoint import CheckpointManager
    from amanogawa_spark.graph.build import build_edges, build_vertices
    from amanogawa_spark.graph.pagerank import pagerank

    spark = SparkSession.builder.appName("amanogawa_pagerank").getOrCreate()
    pages = (
        spark.read.table(args.pages)
        if "." in args.pages and not args.pages.startswith("/") and "://" not in args.pages
        else spark.read.parquet(args.pages)
    )
    vertices = build_vertices(
        pages, id_mode=args.id_mode, normalize=args.normalize_urls
    ).persist()
    edges = build_edges(
        pages, vertices, normalize=args.normalize_urls
    ).persist()
    vertices.write.mode("overwrite").parquet(f"{args.out}/vertices")
    edges.write.mode("overwrite").parquet(f"{args.out}/edges")

    ckpt = (
        CheckpointManager(spark, args.checkpoint_dir) if args.checkpoint_dir else None
    )
    warm = spark.read.parquet(args.warm_ranks) if args.warm_ranks else None
    if warm is None and args.blockrank:
        n_edges = edges.count()
        if 0 < args.blockrank_min_edges > n_edges:
            print(
                f"blockrank: auto-skipping warm start — {n_edges} edges is "
                f"below the work gate ({args.blockrank_min_edges}); the "
                "init barrier ladder would cost more wall than the saved "
                "iterations recoup (--blockrank-min-edges 0 forces it)"
            )
        else:
            from pyspark.sql import functions as F

            from amanogawa_spark.functions.url import host_of
            from amanogawa_spark.graph.blockrank import blockrank_init

            blocks = vertices.select("id", host_of(F.col("url")).alias("blk"))
            warm = blockrank_init(
                edges, blocks, damping=args.damping, local_iters=4, block_iters=8
            )
    res = pagerank(
        vertices,
        edges,
        damping=args.damping,
        tol=args.tol,
        max_iter=args.max_iter,
        checkpoint=ckpt,
        initial_ranks=warm,
        adaptive=args.adaptive,
    )
    res.ranks.write.mode("overwrite").parquet(f"{args.out}/ranks")
    print(
        f"pagerank converged: iterations={res.iterations} delta={res.delta:.3e}"
    )


if __name__ == "__main__":
    main()
