"""Algorithm oracles for the round-4 additions: GraphSAGE-style neighbor
feature aggregation, clamped label spreading, degree-weighted negative
sampling. Each is checked against a hand-rolled single-node Python mirror
on a small deterministic graph (the same strategy as the rest of the
suite), plus the scale-contract properties (determinism, distribution
shape, no dropped rows)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.labelspread import label_spreading
from amanogawa_spark.graph.negsample import degree_negative_samples
from amanogawa_spark.graph.propagate import aggregate_neighbor_features

EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (4, 5), (5, 3), (6, 0),
    (1, 4), (2, 0),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src_id long, dst_id long")


@pytest.fixture(scope="module")
def feats_df(spark):
    rows = [(i, [float(i), float(i * i % 7), 1.0]) for i in range(7)]
    return spark.createDataFrame(rows, "id long, vec array<double>")


def _py_neighbor_mean(edges, feats, layers, include_self=False):
    cur = dict(feats)
    for _ in range(layers):
        nxt = {}
        counts = {}
        for v in cur:
            srcs = [s for (s, d) in edges if d == v and s != d]
            vecs = [cur[s] for s in srcs]
            if include_self:
                vecs = vecs + [cur[v]]
            if vecs:
                nxt[v] = [sum(col) / len(vecs) for col in zip(*vecs)]
                counts[v] = len(vecs)
            else:
                nxt[v] = cur[v]
                counts[v] = 0
        cur = nxt
    return cur, counts


def test_neighbor_mean_matches_python_mirror(spark, edges_df, feats_df):
    got = {
        r["id"]: (r["vec"], r["n_neighbors"])
        for r in aggregate_neighbor_features(
            edges_df, feats_df, layers=2, agg="mean", direction="in"
        ).collect()
    }
    feats = [(i, [float(i), float(i * i % 7), 1.0]) for i in range(7)]
    want, counts = _py_neighbor_mean(EDGES, feats, layers=2)
    assert set(got) == set(want)
    for v in want:
        assert got[v][1] == counts[v]
        for a, b in zip(got[v][0], want[v]):
            assert math.isclose(a, b, rel_tol=0, abs_tol=1e-12), (v, got[v], want[v])


def test_neighbor_mean_include_self_and_out_direction(spark, edges_df, feats_df):
    feats = [(i, [float(i), float(i * i % 7), 1.0]) for i in range(7)]
    got = {
        r["id"]: r["vec"]
        for r in aggregate_neighbor_features(
            edges_df, feats_df, layers=1, direction="out", include_self=True
        ).collect()
    }
    rev = [(d, s) for (s, d) in EDGES]
    want, _ = _py_neighbor_mean(rev, feats, layers=1, include_self=True)
    for v in want:
        for a, b in zip(got[v], want[v]):
            assert math.isclose(a, b, abs_tol=1e-12)


def test_neighbor_mean_arrow_path_equals_expression_path(spark, edges_df, feats_df):
    expr = aggregate_neighbor_features(edges_df, feats_df, layers=2)
    arr = aggregate_neighbor_features(edges_df, feats_df, layers=2, arrow=True)
    e = {r["id"]: (r["vec"], r["n_neighbors"]) for r in expr.collect()}
    a = {r["id"]: (r["vec"], r["n_neighbors"]) for r in arr.collect()}
    assert set(e) == set(a)
    for v in e:
        assert e[v][1] == a[v][1]
        for x, y in zip(e[v][0], a[v][0]):
            assert math.isclose(x, y, abs_tol=1e-9)


def test_neighbor_mean_sum_agg_and_isolate_carry(spark, feats_df):
    # vertex 6 has no in-edges in this sub-edge set -> carries its own vector
    e = feats_df.sparkSession.createDataFrame(
        [(0, 1), (1, 2)], "src_id long, dst_id long"
    )
    got = {
        r["id"]: (r["vec"], r["n_neighbors"])
        for r in aggregate_neighbor_features(e, feats_df, layers=1, agg="sum").collect()
    }
    assert got[6][0] == [6.0, 1.0, 1.0] and got[6][1] == 0
    assert got[1][0] == [0.0, 0.0, 1.0] and got[1][1] == 1


def _py_label_spread(edges, n, seeds, rounds):
    # mirrors _symmetrize: distinct undirected neighbor pairs, no self-loops
    nbrs = {v: set() for v in range(n)}
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    lab = {v: seeds.get(v) for v in range(n)}
    for _ in range(rounds):
        nxt = {}
        for v in range(n):
            if v in seeds:
                nxt[v] = seeds[v]
                continue
            votes = {}
            for u in nbrs[v]:
                if lab[u] is not None:
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
            if votes:
                nxt[v] = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            else:
                nxt[v] = lab[v]
        lab = nxt
    return lab


def test_label_spreading_matches_python_mirror(spark, edges_df):
    verts = spark.createDataFrame([(i,) for i in range(7)], "id long")
    seeds = spark.createDataFrame(
        [(0, "spam"), (5, "ham")], "id long, label string"
    )
    got = {
        r["id"]: (r["label"], r["is_seed"])
        for r in label_spreading(verts, edges_df, seeds, rounds=3).collect()
    }
    want = _py_label_spread(EDGES, 7, {0: "spam", 5: "ham"}, rounds=3)
    assert {v: l for v, (l, _) in got.items()} == want
    assert got[0] == ("spam", True) and got[5] == ("ham", True)


def test_label_spreading_clamps_seeds_and_reaches_everything(spark, edges_df):
    verts = spark.createDataFrame([(i,) for i in range(7)], "id long")
    seeds = spark.createDataFrame([(3, "x")], "id long, label string")
    out = label_spreading(verts, edges_df, seeds, rounds=6)
    rows = {r["id"]: r["label"] for r in out.collect()}
    # the graph is connected: every vertex ends labeled from the one seed
    assert all(v == "x" for v in rows.values())


def test_label_spreading_unreached_stay_null(spark):
    verts = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame([(0, 1), (2, 3)], "src_id long, dst_id long")
    seeds = spark.createDataFrame([(0, "a")], "id long, label string")
    rows = {
        r["id"]: r["label"]
        for r in label_spreading(verts, edges, seeds, rounds=4).collect()
    }
    assert rows[0] == "a" and rows[1] == "a"
    assert rows[2] is None and rows[3] is None


def _star_edges(hub_deg=40, tail=10):
    e = [(0, i) for i in range(1, hub_deg + 1)]
    base = hub_deg + 1
    e += [(base + i, base + i + 1) for i in range(tail)]
    e += [(1, base)]  # connect
    return e


def test_negative_samples_follow_degree_power_law(spark):
    # noise distribution from the FULL star graph; positives restricted to
    # the chain so the hub is never an own-endpoint rejection — the measured
    # hub frequency then reflects the ^0.75 law directly
    # (w_hub = floor(41^.75*16) = 259 vs w_chain = floor(2^.75*16) = 26 ≈ 10x)
    full = spark.createDataFrame(_star_edges(), "src_id long, dst_id long")
    chain_edges = spark.createDataFrame(
        [(s, d) for (s, d) in _star_edges() if s > 41 and d > 41],
        "src_id long, dst_id long",
    )
    out = degree_negative_samples(
        chain_edges, m=200, power=0.75, hash="md5", degree_edges=full
    )
    rows = out.collect()
    n_edges = chain_edges.count()
    assert len(rows) <= n_edges * 200
    # only chain-endpoint collisions reject (~4% of the mass)
    assert len(rows) >= n_edges * 200 * 0.85
    from collections import Counter

    freq = Counter(r["neg_id"] for r in rows)
    chain = [freq.get(v, 0) for v in range(43, 50)]
    assert freq[0] > 4 * max(1, max(chain))
    # never the positive's own endpoints
    assert all(r["neg_id"] != r["src_id"] and r["neg_id"] != r["dst_id"] for r in rows)


def test_negative_samples_deterministic_and_repartition_invariant(spark):
    edges = spark.createDataFrame(_star_edges(), "src_id long, dst_id long")
    a = degree_negative_samples(edges, m=5, hash="md5")
    b = degree_negative_samples(edges.repartition(7), m=5, hash="md5")
    ka = sorted(map(tuple, a.collect()))
    kb = sorted(map(tuple, b.collect()))
    assert ka == kb


def test_negative_samples_bucket_join_is_not_cartesian(spark):
    edges = spark.createDataFrame(_star_edges(), "src_id long, dst_id long")
    out = degree_negative_samples(edges, m=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_skipgram_pairs_match_python_mirror(spark):
    from amanogawa_spark.graph.walks import skipgram_pairs

    walks = [
        # (start_id, walk_no, step, vertex_id): one length-3 walk, one
        # truncated (dangling) length-1 walk
        (0, 0, 0, 10), (0, 0, 1, 11), (0, 0, 2, 12), (0, 0, 3, 13),
        (5, 0, 0, 50), (5, 0, 1, 51),
    ]
    df = spark.createDataFrame(
        walks, "start_id long, walk_no int, step int, vertex_id long"
    )
    got = sorted(map(tuple, skipgram_pairs(df, window=2).collect()))
    want = []
    for seq in ([10, 11, 12, 13], [50, 51]):
        for i, c in enumerate(seq):
            for j, x in enumerate(seq):
                if i != j and abs(j - i) <= 2:
                    want.append((c, x, j - i))
    assert got == sorted(want)


def test_skipgram_pairs_forward_only_halves(spark):
    from amanogawa_spark.graph.walks import skipgram_pairs

    walks = [(0, 0, s, 10 + s) for s in range(4)]
    df = spark.createDataFrame(
        walks, "start_id long, walk_no int, step int, vertex_id long"
    )
    both = skipgram_pairs(df, window=2).count()
    fwd = skipgram_pairs(df, window=2, symmetric=False)
    assert fwd.count() * 2 == both
    assert all(r["rel_pos"] > 0 for r in fwd.collect())


def _chain_star(n=12):
    # 0 -> 1..5 (hub), i -> i+1 chain for 5..10
    e = [(0, i) for i in range(1, 6)]
    e += [(i, i + 1) for i in range(5, 11)]
    return e


def test_sample_neighbors_respects_fanout_and_mirror(spark):
    from amanogawa_spark.graph.propagate import sample_neighbors
    import hashlib

    edges = spark.createDataFrame(_chain_star(), "src_id long, dst_id long")
    roots = spark.createDataFrame([(0,), (5,)], "id long")
    got = sorted(
        map(tuple, sample_neighbors(edges, roots, fanouts=[2, 2], hash="md5").collect())
    )
    # python mirror
    adj = {}
    for s, d in _chain_star():
        adj.setdefault(s, []).append(d)
    want = []
    for r in (0, 5):
        frontier = {r}
        for h, f in ((1, 2), (2, 2)):
            nxt = set()
            for u in sorted(frontier):
                cands = [v for v in adj.get(u, []) if v != u]
                ranked = sorted(
                    cands,
                    key=lambda v: (
                        hashlib.md5(f"{r}~{u}~{h}~{v}".encode()).hexdigest(),
                        v,
                    ),
                )[:f]
                for v in ranked:
                    want.append((r, h, u, v))
                    nxt.add(v)
            frontier = nxt
    assert got == sorted(want)
    # fanout respected: no (root, hop, src) group exceeds 2
    from collections import Counter

    c = Counter((r, h, s) for (r, h, s, d) in got)
    assert max(c.values()) <= 2


def test_sample_neighbors_deterministic_across_repartition(spark):
    from amanogawa_spark.graph.propagate import sample_neighbors

    edges = spark.createDataFrame(_chain_star(), "src_id long, dst_id long")
    roots = spark.createDataFrame([(0,), (5,)], "id long")
    a = sorted(map(tuple, sample_neighbors(edges, roots, [2, 1], hash="md5").collect()))
    b = sorted(
        map(
            tuple,
            sample_neighbors(edges.repartition(5), roots, [2, 1], hash="md5").collect(),
        )
    )
    assert a == b


def test_neighbor_agg_plan_has_map_side_partial_aggregate(spark):
    # the 100 TB claim: per-element sums combine map-side, so the shuffle
    # carries ~|V|*dim partials, not |E|*dim raw neighbor rows — pin it
    # in the physical plan (partial_sum before the exchange)
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src_id long, dst_id long")
    feats = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(3)], "id long, vec array<double>"
    )
    out = aggregate_neighbor_features(edges, feats, layers=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
