"""PageRank vs numpy power-iteration oracle — allclose(1e-6) (north rule)."""

from __future__ import annotations

import numpy as np
import pytest

from amanogawa_spark.checkpoint import CheckpointManager
from amanogawa_spark.graph.build import build_edges, build_vertices
from amanogawa_spark.graph.pagerank import pagerank, pagerank_fixed_iterations

from tests.oracles import pagerank_numpy, pagerank_numpy_fixed


@pytest.fixture(scope="module")
def graph(spark, corpus, pages_df):
    v = build_vertices(pages_df).persist()
    e = build_edges(pages_df, v).persist()
    url_to_id = {r.url: r.id for r in v.collect()}
    id_edges = {(url_to_id[s], url_to_id[d]) for s, d in corpus.expected_edges}
    return v, e, len(url_to_id), id_edges


def test_pagerank_converged_allclose(spark, graph):
    """Identical L1<=1e-6 stopping rule on both sides → same iteration count,
    per-vertex agreement far inside the north rule's allclose(1e-6)."""
    v, e, n, id_edges = graph
    expected = pagerank_numpy(n, id_edges, tol=1e-6, max_iter=200)
    res = pagerank(v, e, tol=1e-6, max_iter=200)
    got = np.zeros(n)
    for r in res.ranks.collect():
        got[r.id] = r["rank"]
    assert res.delta <= 1e-6
    assert np.allclose(got, expected, atol=1e-9, rtol=0)
    assert abs(got.sum() - 1.0) < 1e-9  # rank mass conserved


def test_pagerank_fixed_iterations(spark, graph):
    v, e, n, id_edges = graph
    expected = pagerank_numpy_fixed(n, id_edges, iterations=5)
    got_df = pagerank_fixed_iterations(v, e, iterations=5)
    got = np.zeros(n)
    for r in got_df.collect():
        got[r.id] = r["rank"]
    assert np.allclose(got, expected, atol=1e-10, rtol=0)


def test_pagerank_resume_from_checkpoint(spark, graph, tmp_path):
    v, e, n, id_edges = graph
    # full run
    full = pagerank(v, e, tol=-1.0, max_iter=10, checkpoint_every=100)
    full_ranks = {r.id: r["rank"] for r in full.ranks.collect()}
    # interrupted run: 4 iterations, checkpoint every 2, then resume to 10
    ckpt = CheckpointManager(spark, str(tmp_path / "pr"))
    pagerank(v, e, tol=-1.0, max_iter=4, checkpoint_every=2, checkpoint=ckpt)
    assert ckpt.latest_iteration() == 4
    resumed = pagerank(v, e, tol=-1.0, max_iter=10, checkpoint_every=2, checkpoint=ckpt)
    resumed_ranks = {r.id: r["rank"] for r in resumed.ranks.collect()}
    assert resumed.iterations == 10
    for i in range(n):
        assert abs(full_ranks[i] - resumed_ranks[i]) < 1e-12
    # metrics journal recorded per-iteration rows
    metrics = ckpt.read_metrics()
    assert [m["iteration"] for m in metrics] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    assert all("l1_delta" in m and "dangling_mass" in m for m in metrics)


def test_pagerank_chunked_check_allclose(spark, graph):
    """check_every=2 (the throughput path: in-plan dangling mass, one driver
    action per 2 iterations) must still satisfy the north rule's
    allclose(1e-6) — it may only overshoot convergence by <= 1 iteration."""
    v, e, n, id_edges = graph
    expected = pagerank_numpy(n, id_edges, tol=1e-6, max_iter=200)
    res = pagerank(v, e, tol=1e-6, max_iter=200, check_every=2)
    got = np.zeros(n)
    for r in res.ranks.collect():
        got[r.id] = r["rank"]
    assert res.delta <= 1e-6
    assert np.allclose(got, expected, atol=1e-6, rtol=0)
    assert abs(got.sum() - 1.0) < 1e-9


def test_personalized_pagerank_converged_allclose(spark, graph):
    from amanogawa_spark.graph.pagerank import personalized_pagerank

    from tests.oracles import personalized_pagerank_numpy

    v, e, n, id_edges = graph
    seed_ids = {i for i in range(n) if i % 25 == 0}
    expected = personalized_pagerank_numpy(n, id_edges, seed_ids, tol=1e-6)
    seeds = v.filter((v.id % 25) == 0)
    res = personalized_pagerank(v, e, seeds, tol=1e-6, max_iter=200)
    got = np.zeros(n)
    for r in res.ranks.collect():
        got[r.id] = r["rank"]
    assert res.delta <= 1e-6
    assert np.allclose(got, expected, atol=1e-9, rtol=0)
    # scores concentrate near the seeds: total seed mass exceeds uniform share
    assert got[list(seed_ids)].sum() > len(seed_ids) / n
