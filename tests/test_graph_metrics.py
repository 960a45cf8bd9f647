"""Mixing metrics (graph/metrics.py + graph/build.py): reciprocity,
assortativity, average neighbour degree, rich-club — hand-computed
oracles on small deterministic graphs."""

from __future__ import annotations

import math

import pytest

from amanogawa_spark.graph.build import degree_assortativity, reciprocity
from amanogawa_spark.graph.metrics import avg_neighbor_degree, rich_club


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def test_reciprocity_hand(spark):
    # a<->b mutual, a->c one-way, c->d one-way; self-loop + dup dropped
    e = _edges(
        spark,
        [(1, 2), (2, 1), (1, 3), (3, 4), (3, 4), (5, 5)],
    )
    row = reciprocity(e).collect()[0]
    assert row["n_edges"] == 4
    assert row["n_reciprocal"] == 2
    assert row["reciprocity"] == pytest.approx(0.5)


def test_reciprocity_extremes(spark):
    cycle = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    assert reciprocity(cycle).collect()[0]["reciprocity"] == 0.0
    mutual = _edges(spark, [(1, 2), (2, 1), (3, 4), (4, 3)])
    assert mutual.count() == 4
    assert reciprocity(mutual).collect()[0]["reciprocity"] == 1.0


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    return cov / math.sqrt(vx * vy)


def test_assortativity_matches_hand_pearson(spark):
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (3, 4), (4, 1), (5, 1), (5, 2),
        (2, 4), (6, 2),
    ]
    e = _edges(spark, pairs)
    outd = {}
    ind = {}
    for s, d in pairs:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    xs = [outd[s] for s, d in pairs]
    ys = [ind[d] for s, d in pairs]
    row = degree_assortativity(e).collect()[0]
    assert row["assortativity"] == pytest.approx(_pearson(xs, ys), abs=1e-9)


def test_assortativity_zero_variance_is_null(spark):
    # every dst has in-degree exactly 1 -> vy = 0 -> undefined, NULL not error
    e = _edges(spark, [(1, 2), (1, 3), (2, 4)])
    row = degree_assortativity(e).collect()[0]
    assert row["assortativity"] is None


def test_avg_neighbor_degree_hand(spark):
    # out-deg: 1->{2,3} (2), 2->{3} (1), 3->{4} (1); 4 has none
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    got = {r["id"]: r for r in avg_neighbor_degree(e).collect()}
    assert got[1]["out_degree"] == 2
    # neighbours of 1 are 2 (out 1) and 3 (out 1) -> avg 1.0
    assert got[1]["avg_nbr_out_deg"] == pytest.approx(1.0)
    # neighbour of 2 is 3 (out 1)
    assert got[2]["avg_nbr_out_deg"] == pytest.approx(1.0)
    # neighbour of 3 is 4 (no out-edges -> not in outd -> avg over none = 0)
    assert got[3]["avg_nbr_out_deg"] == pytest.approx(0.0)
    assert 4 not in got  # no out-edges -> no row


def test_avg_neighbor_degree_topk(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (3, 4)])
    rows = avg_neighbor_degree(e, top_k=1).collect()
    assert len(rows) == 1 and rows[0]["id"] == 1 and rows[0]["out_degree"] == 3


def test_rich_club_hand(spark):
    # clique-ish core {1,2,3} all mutually linked; 4,5 pendant
    pairs = [
        (1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (1, 4), (5, 2),
    ]
    e = _edges(spark, pairs)
    # total degrees: 1:5, 2:5, 3:4, 4:1, 5:1
    got = {r["k"]: r for r in rich_club(e, [1, 3, 4]).collect()}
    # k=1 club: {1,2,3} (deg>1) -> 6 internal directed edges / 3*2
    assert got[1]["n_club"] == 3 and got[1]["e_club"] == 6
    assert got[1]["phi"] == pytest.approx(1.0)
    # k=3 club: same {1,2,3}
    assert got[3]["phi"] == pytest.approx(1.0)
    # k=4 club: {1,2} -> edges (1,2),(2,1) -> phi = 2/2 = 1
    assert got[4]["n_club"] == 2 and got[4]["e_club"] == 2
    assert got[4]["phi"] == pytest.approx(1.0)


def test_rich_club_sparse_club(spark):
    # hub 1 -> 2..5 ; hub 6 -> 7..10 ; no hub-hub edge
    pairs = [(1, t) for t in (2, 3, 4, 5)] + [(6, t) for t in (7, 8, 9, 10)]
    e = _edges(spark, pairs)
    got = {r["k"]: r for r in rich_club(e, [2]).collect()}
    # club deg>2: {1, 6}; zero internal edges
    assert got[2]["n_club"] == 2 and got[2]["e_club"] == 0
    assert got[2]["phi"] == pytest.approx(0.0)


def test_metrics_repartition_invariant(spark):
    import random

    rng = random.Random(11)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(300)})
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(7)
    r1 = reciprocity(e1).collect()[0].asDict()
    r2 = reciprocity(e2).collect()[0].asDict()
    assert r1 == r2
    a1 = degree_assortativity(e1).collect()[0]["assortativity"]
    a2 = degree_assortativity(e2).collect()[0]["assortativity"]
    assert a1 == pytest.approx(a2, abs=1e-12)
    a = sorted(r.asDict().items() for r in rich_club(e1, [2, 5]).collect())
    b = sorted(r.asDict().items() for r in rich_club(e2, [2, 5]).collect())
    assert a == b


def test_double_sweep_path_and_star(spark):
    from amanogawa_spark.graph.metrics import double_sweep_lower_bound

    # path 0-1-2-3-4: true diameter 4; start = smallest max-degree id (1)
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src_id long, dst_id long"
    )
    r = double_sweep_lower_bound(path).collect()[0]
    assert r["start_id"] == 1
    assert r["diameter_lb"] == 4
    assert r["ecc_start"] == 3  # from vertex 1 the farthest is 4
    assert r["far_id"] == 4

    # star: hub 0, leaves 1..5 -> diameter 2, start at the hub
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src_id long, dst_id long"
    )
    r = double_sweep_lower_bound(star).collect()[0]
    assert r["start_id"] == 0 and r["ecc_start"] == 1
    assert r["diameter_lb"] == 2


def test_double_sweep_directed_and_component_scope(spark):
    from amanogawa_spark.graph.metrics import double_sweep_lower_bound

    # two components: a 3-path and an isolated edge; undirected sweep
    # stays in the start vertex's component (the larger path)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "src_id long, dst_id long"
    )
    r = double_sweep_lower_bound(e).collect()[0]
    assert r["diameter_lb"] == 3
    # directed mode: forward sweep finds the farthest sink (3), then the
    # BACKWARD sweep from it recovers the full chain depth
    r2 = double_sweep_lower_bound(e, undirected=False).collect()[0]
    assert r2["far_id"] == 3
    assert r2["diameter_lb"] == 3


def test_concentration_profile_gini(spark):
    from amanogawa_spark.graph.metrics import concentration_profile

    # uniform distribution -> Gini 0, each decile holds 10%
    uni = spark.createDataFrame([(i, 5.0) for i in range(100)], ["id", "score"])
    row = concentration_profile(uni).collect()[0]
    assert row["n"] == 100
    assert abs(row["gini_r"]) < 1e-9
    assert abs(row["top10pct_share_r"] - 0.10) < 1e-9

    # one vertex holds everything -> Gini = (n-1)/n, top shares = 1
    spike = spark.createDataFrame(
        [(0, 50.0)] + [(i, 0.0) for i in range(1, 10)], ["id", "score"]
    )
    row = concentration_profile(spike).collect()[0]
    assert abs(row["gini_r"] - 0.9) < 1e-8
    assert row["top1pct_share_r"] == 1.0 and row["top10pct_share_r"] == 1.0

    # hand-computed small case: x = [1,2,3,4] ascending
    # G = 2*(1*1+2*2+3*3+4*4)/(4*10) - 5/4 = 60/40 - 1.25 = 0.25
    h = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)], ["id", "score"]
    )
    assert abs(concentration_profile(h).collect()[0]["gini_r"] - 0.25) < 1e-8
