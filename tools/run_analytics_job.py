"""Cluster entry point: any graph analytic over a built (vertices, edges) graph.

Companion to run_pagerank_job.py (which owns extraction + the PageRank
superjob): this one reads the already-built graph tables it wrote and runs
any of the engine's analytics — the `spark-submit --py-files` surface for
the full algorithm suite:

    spark-submit --py-files dist/amanogawa_spark.zip \\
        tools/run_analytics_job.py --graph /out --algo scc --out /out/scc

``--algo`` one of: cc, scc, lpa, hits, salsa, kcore, coreness, triangles,
clustering, louvain, coloring, mis, walks, node2vec, degrees, linkpred,
sgns_pairs (skip-gram positives + degree^0.75 negatives over a walk
corpus), neighbor_agg (GraphSAGE k-layer mean aggregation; reads
``--graph``/features parquet with (id, vec)), condensation_levels (SCC
condensation DAG + longest-path topological levels), local_cluster (ACL
sweep-cut around ``--graph``/seeds parquet with (id); eps via --tol; a
query_id seed column switches to the batched multi-query path), ego
(induced k-hop ego network around ``--graph``/seeds; hops via --k),
diameter (double-sweep exact lower bound; one summary row), mc_pagerank
(Monte-Carlo complete-path ranks; walks/vertex via --k, cap via
--max-iter), degree_gini (out-degree concentration profile: Gini +
top-1%/10% share; one summary row), partition (the DEFAULT balanced
partitioner: community_partition — LPA communities + bounded-driver FFD
pack; k via --k), partition_spinner (flat Spinner refinement kernel for
locality-free graphs).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True, help="root with vertices/ and edges/ parquet")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--algo", required=True)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--k", type=int, default=3, help="k for kcore/linkpred/walks length")
    ap.add_argument("--p", type=float, default=1.0, help="node2vec return parameter")
    ap.add_argument("--q", type=float, default=1.0, help="node2vec in-out parameter")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"amanogawa_{args.algo}").getOrCreate()
    vertices = spark.read.parquet(f"{args.graph}/vertices")
    edges = spark.read.parquet(f"{args.graph}/edges")

    meta: dict = {"algo": args.algo}
    if args.algo == "cc":
        from amanogawa_spark.graph.components import connected_components

        out = connected_components(vertices, edges, max_rounds=args.max_iter)
    elif args.algo == "scc":
        from amanogawa_spark.graph.scc import strongly_connected_components

        out = strongly_connected_components(vertices, edges, max_outer=args.max_iter)
    elif args.algo == "lpa":
        from amanogawa_spark.graph.lpa import label_propagation

        out = label_propagation(vertices, edges, max_rounds=args.max_iter)
    elif args.algo == "hits":
        from amanogawa_spark.graph.hits import hits

        res = hits(vertices, edges, tol=args.tol, max_iter=args.max_iter)
        out, meta["iterations"] = res.scores, res.iterations
    elif args.algo == "salsa":
        from amanogawa_spark.graph.salsa import salsa

        res = salsa(vertices, edges, tol=args.tol, max_iter=args.max_iter)
        out, meta["iterations"] = res.scores, res.iterations
    elif args.algo == "kcore":
        from amanogawa_spark.graph.kcore import k_core

        out = k_core(vertices, edges, k=args.k)
    elif args.algo == "coreness":
        from amanogawa_spark.graph.kcore import coreness

        out = coreness(vertices, edges)
    elif args.algo == "triangles":
        from amanogawa_spark.graph.triangles import triangle_total

        out = triangle_total(edges)
    elif args.algo == "clustering":
        from amanogawa_spark.graph.triangles import clustering_coefficient

        out = clustering_coefficient(edges)
    elif args.algo == "louvain":
        from amanogawa_spark.graph.community import louvain

        out = louvain(vertices, edges)
    elif args.algo == "coloring":
        from amanogawa_spark.graph.coloring import jp_coloring

        out = jp_coloring(vertices, edges, max_rounds=args.max_iter)
    elif args.algo == "mis":
        from amanogawa_spark.graph.mis import luby_mis

        out = luby_mis(vertices, edges, max_rounds=args.max_iter)
    elif args.algo == "walks":
        from amanogawa_spark.graph.walks import random_walks

        out = random_walks(edges, walk_length=args.k)
    elif args.algo == "node2vec":
        from amanogawa_spark.graph.walks import node2vec_walks

        out = node2vec_walks(edges, walk_length=args.k, p=args.p, q=args.q)
    elif args.algo == "degrees":
        from amanogawa_spark.graph.build import degrees

        out = degrees(edges)
    elif args.algo == "linkpred":
        from amanogawa_spark.graph.linkpred import link_prediction_scores

        out = link_prediction_scores(edges, k=args.k)
    elif args.algo == "sgns_pairs":
        # SGNS training data: skip-gram positives over a walk corpus plus
        # degree^0.75 negatives, unioned with a pair_type discriminator
        from pyspark.sql import functions as F

        from amanogawa_spark.graph.negsample import degree_negative_samples
        from amanogawa_spark.graph.walks import random_walks, skipgram_pairs

        w = random_walks(edges, walk_length=args.k)
        pos = skipgram_pairs(w, window=2).select(
            F.col("center_id").alias("src_id"), F.col("context_id").alias("dst_id")
        )
        neg = degree_negative_samples(pos, m=2, degree_edges=edges)
        out = pos.withColumn("pair_type", F.lit("pos")).unionByName(
            neg.select("src_id", "dst_id").withColumn("pair_type", F.lit("neg"))
        )
    elif args.algo == "neighbor_agg":
        from amanogawa_spark.graph.propagate import aggregate_neighbor_features

        feats = spark.read.parquet(f"{args.graph}/features")
        out = aggregate_neighbor_features(edges, feats, layers=args.k)
    elif args.algo == "ego":
        from amanogawa_spark.graph.sssp import ego_network

        seed_ids = [
            r["id"] for r in spark.read.parquet(f"{args.graph}/seeds").collect()
        ]
        out = ego_network(edges, seed_ids, hops=args.k)
    elif args.algo == "condensation_levels":
        from amanogawa_spark.graph.condensation import (
            condensation_edges,
            topological_levels,
        )
        from amanogawa_spark.graph.scc import strongly_connected_components

        comp = strongly_connected_components(
            vertices, edges, max_outer=args.max_iter
        )
        out = topological_levels(
            condensation_edges(edges, comp), comp, max_rounds=max(args.max_iter, 64)
        )
    elif args.algo == "local_cluster":
        from amanogawa_spark.graph.localcluster import (
            local_cluster,
            local_cluster_batch,
        )

        seeds = spark.read.parquet(f"{args.graph}/seeds")
        # seeds with a query_id column run the batched multi-query path
        fn = local_cluster_batch if "query_id" in seeds.columns else local_cluster
        out = fn(edges, seeds, eps=args.tol, max_rounds=args.max_iter)
    elif args.algo == "diameter":
        from amanogawa_spark.graph.metrics import double_sweep_lower_bound

        out = double_sweep_lower_bound(edges, max_rounds=max(args.max_iter, 64))
    elif args.algo == "mc_pagerank":
        from amanogawa_spark.graph.montecarlo import pagerank_montecarlo

        out = pagerank_montecarlo(
            edges,
            walks_per_vertex=max(args.k, 1),
            max_len=min(args.max_iter, 64),
        )
    elif args.algo == "degree_gini":
        from pyspark.sql import functions as F

        from amanogawa_spark.graph.metrics import concentration_profile

        deg = edges.groupBy("src_id").agg(
            F.count("*").cast("double").alias("score")
        )
        out = concentration_profile(deg, "score", "src_id")
    elif args.algo == "partition":
        # the DEFAULT partitioner: community-driven (LPA + bounded-driver
        # FFD pack) — on web-shaped graphs the natural communities ARE the
        # good partition (cut 0.171 vs flat Spinner's 0.665 on the
        # locality bench corpus). k via --k; --max-iter caps LPA rounds.
        from amanogawa_spark.graph.partition import community_partition, edge_cut

        out = community_partition(
            vertices.select("id"), edges, k=max(args.k, 2),
            lpa_rounds=min(args.max_iter, 8),
        )
        cut = edge_cut(edges, out).collect()[0]
        meta["cut_frac"] = float(cut["cut_frac_r"])
    elif args.algo == "partition_spinner":
        # flat Spinner — the refinement kernel, kept for locality-free
        # graphs; prefer --algo partition on web corpora
        from amanogawa_spark.graph.partition import edge_cut, spinner_partition

        out = spinner_partition(
            vertices.select("id"), edges, k=max(args.k, 2),
            max_rounds=args.max_iter, stop_moves_frac=0.01,
        )
        cut = edge_cut(edges, out).collect()[0]
        meta["cut_frac"] = float(cut["cut_frac_r"])
    else:
        raise SystemExit(f"unknown --algo {args.algo!r}")

    out.write.mode("overwrite").parquet(args.out)
    meta["rows"] = spark.read.parquet(args.out).count()
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
