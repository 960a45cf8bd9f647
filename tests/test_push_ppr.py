"""Algorithm oracles for synchronous forward-push approximate PPR."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5),
    (5, 3), (1, 5), (6, 0),  # 6 has an out-edge; 4->5->3 loop tail
]
N = 7


def _np_push(edges, n, seeds, alpha, eps, rounds):
    """Literal synchronous push mirror (dangling mass → seed vector),
    state rounded to 12 decimals per round like the operator."""
    out = np.zeros(n)
    for u, _ in edges:
        out[u] += 1
    s = np.zeros(n)
    s[list(seeds)] = 1.0 / len(seeds)
    p, r = np.zeros(n), s.copy()
    for _ in range(rounds):
        act = r > eps
        if not act.any():
            break
        np_, nr = p.copy(), r.copy()
        np_[act] += alpha * r[act]
        nr[act] = 0.0
        dm = 0.0
        for u in np.where(act)[0]:
            if out[u] == 0:
                dm += r[u]
            else:
                for a, b in edges:
                    if a == u:
                        nr[b] += (1 - alpha) * r[u] / out[u]
        nr += (1 - alpha) * dm * s
        p, r = np.round(np_, 12), np.round(nr, 12)
    return p, r


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(EDGES, "src_id long, dst_id long")


def test_push_matches_numpy_mirror(spark, graph):
    from amanogawa_spark.graph.push import forward_push_ppr

    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: (r["ppr_est"], r["residual"])
        for r in forward_push_ppr(
            graph, seeds, alpha=0.15, eps=1e-4, fixed_rounds=4
        ).collect()
    }
    p, r = _np_push(EDGES, N, [0], 0.15, 1e-4, 4)
    for i, (pe, re) in got.items():
        assert abs(pe - p[i]) < 1e-11 and abs(re - r[i]) < 1e-11, i


def test_push_invariant_mass_and_convergence(spark, graph):
    """p + r always carries total mass 1 (the paper's invariant with the
    teleport-to-seeds dangling rule); converged estimates approach the
    exact PPR of personalized_pagerank within |r|_1."""
    from amanogawa_spark.graph.push import forward_push_ppr
    from amanogawa_spark.graph.pagerank import personalized_pagerank

    seeds = spark.createDataFrame([(0,)], "id long")
    out = forward_push_ppr(graph, seeds, alpha=0.15, eps=1e-7, max_rounds=100)
    rows = out.collect()
    mass = sum(r["ppr_est"] + r["residual"] for r in rows)
    assert abs(mass - 1.0) < 1e-9
    resid_l1 = sum(r["residual"] for r in rows)
    assert resid_l1 < 1e-5 * N
    v = spark.createDataFrame([(i,) for i in range(N)], "id long")
    exact = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(
            v, graph, seeds, damping=0.85, tol=1e-12, max_iter=200
        ).ranks.collect()
    }
    for r in rows:
        assert abs(r["ppr_est"] - exact[r["id"]]) <= resid_l1 + 1e-9, r


def test_push_locality(spark):
    """Vertices unreachable from the seed are never touched — the output
    frame contains only the seed's forward neighborhood."""
    from amanogawa_spark.graph.push import forward_push_ppr

    e = spark.createDataFrame(
        [(0, 1), (1, 0), (5, 6), (6, 5), (7, 5)], "src_id long, dst_id long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    ids = {r["id"] for r in forward_push_ppr(e, seeds, eps=1e-8).collect()}
    assert ids == {0, 1}


def test_push_repartition_invariant(spark, graph):
    from amanogawa_spark.graph.push import forward_push_ppr

    seeds = spark.createDataFrame([(0,), (3,)], "id long")
    a = {
        r["id"]: (r["ppr_est"], r["residual"])
        for r in forward_push_ppr(graph, seeds, eps=1e-5, fixed_rounds=5).collect()
    }
    b = {
        r["id"]: (r["ppr_est"], r["residual"])
        for r in forward_push_ppr(
            graph.repartition(5), seeds, eps=1e-5, fixed_rounds=5
        ).collect()
    }
    assert a == b
