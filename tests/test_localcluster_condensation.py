"""ACL sweep-cut local clustering (graph/localcluster.py) and SCC
condensation + topological levels (graph/condensation.py): hand graphs
with known conductance tables / DAG depths, brute-force oracles, and
partition invariance."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from amanogawa_spark.graph.condensation import condensation_edges, topological_levels
from amanogawa_spark.graph.localcluster import local_cluster, ppr_sweep_cut
from amanogawa_spark.graph.push import forward_push_ppr
from amanogawa_spark.graph.scc import strongly_connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def _seeds(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["id"])


# two 4-cliques joined by a single bridge edge (symmetrized: the push walks
# a directed graph); the planted min-conductance cut is exactly one clique
# (cut=1, vol=13 vs total 26)
_TWO_CLIQUES = [
    (a, b)
    for grp in ([1, 2, 3, 4], [11, 12, 13, 14])
    for a, b in itertools.permutations(grp, 2)
] + [(4, 11), (11, 4)]


def _brute_conductance(und_pairs, members):
    """Brute-force phi(S) on the undirected edge list."""
    deg = {}
    for a, b in und_pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    vol_s = sum(deg[v] for v in members)
    vol_t = sum(deg.values())
    cut = sum(1 for a, b in und_pairs if (a in members) != (b in members))
    denom = min(vol_s, vol_t - vol_s)
    return cut / denom if denom > 0 else 1.0


def test_sweep_cut_finds_planted_cluster(spark):
    e = _edges(spark, _TWO_CLIQUES)
    got = local_cluster(e, _seeds(spark, [1]), alpha=0.15, eps=1e-9)
    members = sorted(r["id"] for r in got.collect())
    assert members == [1, 2, 3, 4]
    # the winning prefix's conductance is the planted cut's: 1 / min(13, 13)
    best = min(r["conductance_r"] for r in got.collect())
    assert abs(best - round(1 / 13, 8)) < 1e-12


def test_sweep_table_matches_bruteforce_prefixes(spark):
    e = _edges(spark, _TWO_CLIQUES)
    ppr = forward_push_ppr(e, _seeds(spark, [1]), alpha=0.15, eps=1e-9)
    sweep = ppr_sweep_cut(e, ppr).orderBy("sweep_k").collect()
    und = {(min(a, b), max(a, b)) for a, b in _TWO_CLIQUES}
    prefix = set()
    for row in sweep:
        prefix.add(row["id"])
        want = round(_brute_conductance(und, prefix), 8)
        assert abs(row["conductance_r"] - want) < 1e-12, (row, want)


def test_sweep_cut_repartition_invariance(spark):
    e = _edges(spark, _TWO_CLIQUES)
    ppr = forward_push_ppr(e, _seeds(spark, [1]), alpha=0.15, eps=1e-9)
    a = sorted(map(tuple, ppr_sweep_cut(e, ppr).collect()))
    b = sorted(map(tuple, ppr_sweep_cut(e.repartition(7), ppr.repartition(5)).collect()))
    assert a == b


# condensation fixture: 3-cycle SCC {1,2,3} -> chain 4 -> 5, plus a source
# 6 -> 4 and a 2-cycle {7,8} -> 5; levels: sources 0, then longest paths
_DAG_EDGES = [
    (1, 2), (2, 3), (3, 1),   # SCC A (label min=1)
    (3, 4), (4, 5),           # A -> 4 -> 5
    (6, 4),                   # source 6 -> 4
    (7, 8), (8, 7), (7, 5),   # SCC B (label min=7) -> 5
]


def _scc_setup(spark):
    e = _edges(spark, _DAG_EDGES)
    v = (
        e.selectExpr("src_id AS id")
        .union(e.selectExpr("dst_id AS id"))
        .distinct()
    )
    comp = strongly_connected_components(v, e)
    return e, comp


def test_condensation_edges_are_acyclic_superedges(spark):
    e, comp = _scc_setup(spark)
    ce = {(r["src_scc"], r["dst_scc"]) for r in condensation_edges(e, comp).collect()}
    assert ce == {(1, 4), (4, 5), (6, 4), (7, 5)}


def test_topological_levels_longest_path(spark):
    e, comp = _scc_setup(spark)
    ce = condensation_edges(e, comp)
    got = {r["scc"]: (r["n_members"], r["level"]) for r in
           topological_levels(ce, comp).collect()}
    # sources (SCC 1, 6, 7) at level 0; 4 below both 1 and 6 -> 1;
    # 5 below 4 (level 1) and 7 (level 0) -> longest path length 2
    assert got == {1: (3, 0), 6: (1, 0), 7: (2, 0), 4: (1, 1), 5: (1, 2)}


def test_topological_levels_fixed_rounds_matches_fixpoint(spark):
    e, comp = _scc_setup(spark)
    ce = condensation_edges(e, comp)
    fixp = sorted(map(tuple, topological_levels(ce, comp).collect()))
    fixed = sorted(map(tuple, topological_levels(ce, comp, fixed_rounds=8).collect()))
    assert fixp == fixed


def test_topological_levels_chain_depth(spark):
    # pure chain 0->1->...->6: level == position
    e = _edges(spark, [(i, i + 1) for i in range(6)])
    v = (
        e.selectExpr("src_id AS id")
        .union(e.selectExpr("dst_id AS id"))
        .distinct()
    )
    comp = strongly_connected_components(v, e)
    ce = condensation_edges(e, comp)
    got = {r["scc"]: r["level"] for r in topological_levels(ce, comp).collect()}
    assert got == {i: i for i in range(7)}


def test_batch_push_and_sweep_equal_single_query_runs(spark):
    """The batched multi-query path is pinned to the single-query one:
    for each query_id, forward_push_ppr_batch / ppr_sweep_cut_batch /
    local_cluster_batch return exactly the single-run rows."""
    from amanogawa_spark.graph.localcluster import (
        local_cluster_batch,
        ppr_sweep_cut_batch,
    )
    from amanogawa_spark.graph.push import forward_push_ppr_batch

    e = _edges(spark, _TWO_CLIQUES)
    seed_sets = {10: [1], 20: [12, 13], 30: [4, 11]}
    batch_seeds = spark.createDataFrame(
        [(q, i) for q, ids in seed_sets.items() for i in ids],
        ["query_id", "id"],
    )

    bp = forward_push_ppr_batch(e, batch_seeds, alpha=0.15, eps=1e-7, fixed_rounds=6)
    bs = ppr_sweep_cut_batch(e, bp)
    bc = local_cluster_batch(e, batch_seeds, alpha=0.15, eps=1e-7, fixed_rounds=6)

    for q, ids in seed_sets.items():
        single_ppr = forward_push_ppr(
            e, _seeds(spark, ids), alpha=0.15, eps=1e-7, fixed_rounds=6
        )
        want_push = sorted(map(tuple, single_ppr.collect()))
        got_push = sorted(
            (r["id"], r["ppr_est"], r["residual"])
            for r in bp.filter(F.col("query_id") == q).collect()
        )
        assert got_push == want_push, f"push mismatch for query {q}"

        want_sweep = sorted(map(tuple, ppr_sweep_cut(e, single_ppr).collect()))
        got_sweep = sorted(
            (r["sweep_k"], r["id"], r["vol_s"], r["cut_s"], r["conductance_r"])
            for r in bs.filter(F.col("query_id") == q).collect()
        )
        assert got_sweep == want_sweep, f"sweep mismatch for query {q}"

    # batch best-prefix membership: query 10's cluster is its clique
    got = sorted(
        r["id"] for r in bc.filter(F.col("query_id") == 10).collect()
    )
    assert got == [1, 2, 3, 4]


def test_ego_network_hand_graph(spark):
    """ego_network: induced k-hop ball with per-endpoint hop annotations."""
    from amanogawa_spark.graph.sssp import ego_network

    # 1 -> 2 -> 3 -> 4 (chain), 2 -> 5, 9 -> 1 (upstream), 6 -> 7 (island)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (2, 5), (9, 1), (6, 7)])

    got = {
        (r["src_id"], r["dst_id"], r["src_hops"], r["dst_hops"])
        for r in ego_network(e, [1], hops=2).collect()
    }
    # ball(1, 2 hops, directed) = {1:0, 2:1, 3:2, 5:2}; induced edges only
    assert got == {(1, 2, 0, 1), (2, 3, 1, 2), (2, 5, 1, 2)}

    und = {
        (r["src_id"], r["dst_id"], r["src_hops"], r["dst_hops"])
        for r in ego_network(e, [1], hops=1, undirected=True).collect()
    }
    # symmetrized 1-hop ball = {1:0, 2:1, 9:1}; original directed rows
    assert und == {(1, 2, 0, 1), (9, 1, 1, 0)}
