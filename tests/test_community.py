"""Louvain + modularity oracles.

Independent checks: a hand-computed modularity value, a pure-Python mirror
of the parallel move-round rule (pins the kernel semantics the driver's SQL
oracle also mirrors), planted-partition recovery, and repartition
invariance (the north rule's determinism bar).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.community import (
    _sym_weighted,
    louvain,
    louvain_move_round,
    modularity,
)


def _two_cliques(spark):
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((3, 10))
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    v = e.select(F.col("src_id").alias("id")).union(e.select("dst_id")).distinct()
    return v, e


def test_modularity_hand_computed(spark):
    # two 4-cliques + bridge: m=13, per-clique e2=12, deg_sum=13
    # Q = 2 * (12/26 - (13/26)^2) = 0.4230769...
    v, e = _two_cliques(spark)
    a = v.select(
        "id", F.when(F.col("id") < 10, 0).otherwise(1).cast("long").alias("community")
    )
    q = modularity(e, a, per_community=False).collect()[0][0]
    assert q == pytest.approx(2 * (12 / 26 - (13 / 26) ** 2), abs=1e-12)
    per = {r.community: r for r in modularity(e, a).collect()}
    assert per[0].intra2 == 12.0 and per[0].deg_sum == 13.0


def test_louvain_recovers_cliques(spark):
    v, e = _two_cliques(spark)
    rows = sorted((r.id, r.community) for r in louvain(v, e).collect())
    comms = {}
    for i, c in rows:
        comms.setdefault(c, set()).add(i)
    assert comms == {0: {0, 1, 2, 3}, 10: {10, 11, 12, 13}}


def _py_move_round(sym_w, assign, deg, m2, rnd):
    """Pure-Python mirror of louvain_move_round's documented rule."""
    tot = {}
    for i, c in assign.items():
        tot[c] = tot.get(c, 0.0) + deg[i]
    out = {}
    for u in assign:
        wuc = {}
        for (a, b), w in sym_w.items():
            if a == u:
                c = assign[b]
                wuc[c] = wuc.get(c, 0.0) + w
        cu, k = assign[u], deg[u]
        stay = wuc.get(cu, 0.0) - k * (tot[cu] - k) / m2
        best_c, best_s = None, None
        for c, w in wuc.items():
            if c == cu:
                continue
            s = w - k * tot[c] / m2
            if best_s is None or s > best_s or (s == best_s and c < best_c):
                best_c, best_s = c, s
        if u % 2 == rnd % 2 and best_s is not None and best_s > stay:
            out[u] = best_c
        else:
            out[u] = cu
    return out


def test_move_round_matches_python_mirror(spark):
    # deterministic scruffy graph: ring + chords
    n = 24
    pairs = [(i, (i + 1) % n) for i in range(n)] + [
        (i, (i + 7) % n) for i in range(0, n, 3)
    ]
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")
    adj = _sym_weighted(e, None)
    sym_w = {(r.u, r.v): r.w for r in adj.collect()}
    deg_df = adj.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("k"))
    deg = {r.id: r.k for r in deg_df.collect()}
    m2 = sum(deg.values())
    m2_df = deg_df.agg(F.sum("k").alias("m2"))
    assign_df = deg_df.select("id", F.col("id").alias("community"))
    assign = {i: i for i in deg}
    for rnd in range(3):
        assign_df = louvain_move_round(assign_df, adj, deg_df, m2_df, rnd).localCheckpoint(
            eager=True
        )
        assign = _py_move_round(sym_w, assign, deg, m2, rnd)
        got = {r.id: r.community for r in assign_df.collect()}
        assert got == assign, f"round {rnd} diverged"


def _planted(spark):
    edges = []
    blocks = [list(range(b * 100, b * 100 + 12)) for b in range(4)]
    for blk in blocks:
        for x in range(12):
            for y in range(x + 1, 12):
                if (x + y) % 3 != 0:  # dense intra, deterministic
                    edges.append((blk[x], blk[y]))
    for b in range(3):  # sparse inter-block bridges
        edges.append((blocks[b][0], blocks[b + 1][1]))
        edges.append((blocks[b][5], blocks[b + 1][6]))
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    v = e.select(F.col("src_id").alias("id")).union(e.select("dst_id")).distinct()
    return v, e, blocks


def test_louvain_planted_partition(spark):
    v, e, blocks = _planted(spark)
    res = louvain(v, e)
    got = {r.id: r.community for r in res.collect()}
    # exact block recovery: each block is one community, labels = min id
    for b, blk in enumerate(blocks):
        labels = {got[i] for i in blk}
        assert labels == {blk[0]}, f"block {b} split into {labels}"
    a = res.select("id", "community")
    q = modularity(e, a, per_community=False).collect()[0][0]
    assert q > 0.5  # strong community structure found


def test_louvain_repartition_invariant_and_isolated(spark):
    v, e, _ = _planted(spark)
    # an isolated vertex must survive as its own singleton community
    v = v.union(spark.createDataFrame([(99999,)], "id long"))
    r1 = sorted((r.id, r.community) for r in louvain(v, e).collect())
    r2 = sorted(
        (r.id, r.community)
        for r in louvain(v.repartition(7), e.repartition(11)).collect()
    )
    assert r1 == r2
    assert (99999, 99999) in r1


def _cc_py(ids, edge_list):
    """Union-find mirror: min-id-labeled components."""
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edge_list:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    out = {}
    for i in ids:
        r = find(i)
        while parent[r] != r:
            r = parent[r]
        out[i] = r
    # relabel to min member id (find roots are already min by merge rule)
    return out


def test_refine_splits_disconnected_community(spark):
    """A 'community' holding two cliques with no edge between them must
    shatter into the two cliques; a genuinely connected community stays
    whole."""
    from amanogawa_spark.graph.community import (
        refine_communities,
        refinement_summary,
    )

    # community 0: clique {0,1,2} + clique {10,11,12}, disconnected inside
    # community 1: path 20-21-22, connected
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (20, 21), (21, 22)]
    assign = [(i, 0) for i in [0, 1, 2, 10, 11, 12]] + [(i, 1) for i in [20, 21, 22]]
    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    a = spark.createDataFrame(assign, "id long, community long")
    got = {r["id"]: r["community"] for r in refine_communities(a, e).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20}
    s = refinement_summary(a, refine_communities(a, e)).collect()[0]
    assert s["communities_before"] == 2
    assert s["communities_after"] == 3
    assert s["communities_split"] == 1


def test_refine_is_noop_on_connected_partition(spark):
    """Louvain output on the two-clique graph is already connected per
    community — refinement must not split anything (Leiden's guarantee
    holds trivially) and must preserve the partition structure."""
    from amanogawa_spark.graph.community import (
        louvain,
        refine_communities,
        refinement_summary,
    )

    v, e = _two_cliques(spark)
    comm = louvain(v, e, max_levels=2, rounds_per_level=4)
    ref = refine_communities(comm, e)
    s = refinement_summary(comm, ref).collect()[0]
    assert s["communities_split"] == 0
    assert s["communities_after"] == s["communities_before"]
    # partition identical (labels are min-member on both sides)
    before = {r["id"]: r["community"] for r in comm.collect()}
    after = {r["id"]: r["community"] for r in ref.collect()}
    grp_b = {}
    grp_a = {}
    for i, c in before.items():
        grp_b.setdefault(c, set()).add(i)
    for i, c in after.items():
        grp_a.setdefault(c, set()).add(i)
    assert sorted(grp_b.values(), key=min) == sorted(grp_a.values(), key=min)


def test_refine_matches_unionfind_on_random_graph(spark):
    """Refinement == per-community union-find on a random digraph with a
    random coarse partition (strict-refinement property included)."""
    import random

    rng = random.Random(11)
    n = 120
    ids = list(range(n))
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    part = {i: rng.randrange(5) for i in ids}
    intra = [(u, v) for u, v in edges if u != v and part[u] == part[v]]
    expect = _cc_py(ids, intra)

    from amanogawa_spark.graph.community import refine_communities

    e = spark.createDataFrame(edges, "src_id long, dst_id long")
    a = spark.createDataFrame(list(part.items()), "id long, community long")
    got = {r["id"]: r["community"] for r in refine_communities(a, e).collect()}
    assert got == expect
    # strict refinement: every output community sits inside one input community
    for i in ids:
        assert part[got[i]] == part[i]
