"""Link prediction, truncated harmonic, HyperBall, chunking, novelty tests.

Property/algorithm oracles beyond the SQL gate: hand-computable small
graphs, reconstruction invariants, and the HyperBall-vs-exact error
bound."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_graph(spark):
    """Directed: 0→1→2→0 triangle plus 2→3, 3→4 tail; undirected view has
    a 0-1-2 triangle and path 2-3-4."""
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src_id long, dst_id long"
    )
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    return v, e


def test_linkpred_small_graph(spark, small_graph):
    from amanogawa_spark.graph.linkpred import link_prediction_scores

    _, e = small_graph
    rows = {(r.id_a, r.id_b): r for r in link_prediction_scores(e, k=10).collect()}
    # undirected edges: {01,12,02,23,34}; degs: 0:2 1:2 2:3 3:2 4:1
    # non-adjacent pairs w/ common neighbor: (0,3) via 2; (1,3) via 2;
    # (2,4) via 3; (0,4)/(1,4) share none
    assert set(rows) == {(0, 3), (1, 3), (2, 4)}
    assert rows[(0, 3)].cn == 1
    assert rows[(0, 3)].adamic_adar == pytest.approx(1 / np.log(3), abs=1e-8)
    # jaccard(0,3) = 1 / (2 + 2 - 1)
    assert rows[(0, 3)].jaccard == pytest.approx(1 / 3, abs=1e-8)
    assert rows[(2, 4)].adamic_adar == pytest.approx(1 / np.log(2), abs=1e-8)


def test_linkpred_max_degree_excludes_hub_wedges(spark, small_graph):
    from amanogawa_spark.graph.linkpred import link_prediction_scores

    _, e = small_graph
    # cap 2 excludes vertex 2 (deg 3) as an intermediate: only (2,4) via 3 remains
    rows = {
        (r.id_a, r.id_b)
        for r in link_prediction_scores(e, k=10, max_degree=2).collect()
    }
    assert rows == {(2, 4)}


def test_truncated_harmonic_small_graph(spark, small_graph):
    from amanogawa_spark.graph.centrality import truncated_harmonic

    v, e = small_graph
    got = {r.id: r.harmonic for r in truncated_harmonic(v, e, radius=3).collect()}
    # directed distances from 0: 1:1 2:2 3:3 (4 at d=4, cut) -> 1 + .5 + 1/3
    assert got[0] == pytest.approx(1 + 0.5 + 1 / 3)
    # from 3: only 4 at d=1; from 4: nothing
    assert got[3] == pytest.approx(1.0)
    assert got[4] == 0.0


def test_hyperball_tracks_exact_ball_sizes(spark):
    """On a random sparse digraph the p=8 HyperBall estimate stays within
    the ~3σ HLL error band of the exact 2-ball size, per vertex."""
    from amanogawa_spark.graph.hyperball import hyperball

    rng = np.random.default_rng(17)
    n = 300
    edges = {(int(a), int(b)) for a, b in rng.integers(0, n, size=(1500, 2)) if a != b}
    e = spark.createDataFrame(sorted(edges), "src_id long, dst_id long")
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")

    est = {r.id: r.estimate for r in hyperball(v, e, radius=2, p=8).collect()}

    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
    exact = {}
    for u in range(n):
        ball = {u} | out.get(u, set())
        for w in list(ball):
            ball |= out.get(w, set())
        exact[u] = len(ball)

    rel_errs = [abs(est[u] - exact[u]) / exact[u] for u in range(n)]
    # p=8 -> sigma ~ 1.04/sqrt(256) ~ 6.5%; mean well inside, max < 5 sigma
    assert float(np.mean(rel_errs)) < 0.10
    assert float(np.max(rel_errs)) < 0.35


def test_chunking_reconstructs_text(spark):
    """Non-overlapping prefix of each chunk (stride chars) concatenates
    back to the exact document text — no byte lost or duplicated."""
    from amanogawa_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a" * 100 + "b" * 100 + "c" * 50),
            (2, "short"),
            (3, ""),
            (4, "x" * 384),
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, size=120, stride=90).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    originals = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        rebuilt = "".join(r.chunk_text[:90] for r in rows[:-1]) + rows[-1].chunk_text
        assert rebuilt == originals[doc_id], doc_id
        # overlap property: chunk i's tail == chunk i+1's head (size-stride chars)
        for a, b in zip(rows, rows[1:]):
            ov = min(120 - 90, len(a.chunk_text) - 90)
            if ov > 0:
                assert a.chunk_text[90 : 90 + ov] == b.chunk_text[:ov]
    assert len(by_doc[3]) == 1 and by_doc[3][0].chunk_text == ""


def test_ngram_novelty_duplicate_vs_unique(spark):
    from amanogawa_spark.operators.dedup import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
            (3, "completely different words appear in this unique sentence"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
    assert got[1].novel_frac == 0.0  # every shingle shared with doc 2
    assert got[2].novel_frac == 0.0
    assert got[3].novel_frac == 1.0


def test_hyperanf_effective_diameter_cycle(spark):
    """Directed n-cycle: B(v, r) has exactly r+1 members, so N(r) grows
    linearly and saturates at r = n-1; the 0.9-effective diameter is
    ~0.9·(n-1). HLL p=8 keeps per-ball error ~1-2% at these sizes."""
    from amanogawa_spark.graph.hyperball import (
        effective_diameter,
        neighborhood_function,
    )

    n = 40
    e = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src_id long, dst_id long"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")

    curve = neighborhood_function(v, e, max_radius=n + 2, p=8)
    totals = [t for _, t in curve]
    # monotone non-decreasing and saturating at ~n^2 total ball members
    assert all(b >= a * 0.999 for a, b in zip(totals, totals[1:]))
    assert totals[-1] == pytest.approx(n * n, rel=0.05)
    # saturation detected at radius ~n-1, not max_radius
    assert curve[-1][0] <= n + 1

    d_eff = effective_diameter(v, e, q=0.9, max_radius=n + 2, p=8)
    # exact value: N(r)=n(r+1) -> target 0.9n^2 at r = 0.9n - 1 = 35
    assert abs(d_eff - (0.9 * n - 1)) < 2.5


def test_hyperball_closeness_invariants(spark):
    from pyspark.sql import functions as F

    from amanogawa_spark.graph.hyperball import hyperball_closeness

    # star out-edges from 0 plus a chain; vertices 1-4 and 9 are sinks
    # (out-degree 0)
    sinks = {1, 2, 3, 4, 9}
    pairs = [(0, i) for i in range(1, 6)] + [(5, 6), (6, 7), (7, 8), (8, 9)]
    e = spark.createDataFrame(pairs, "src_id long, dst_id long")
    v = e.select(F.col("src_id").alias("id")).union(e.select("dst_id")).distinct()
    r1 = {
        r.id: (r.reached, r.sum_dist, r.closeness)
        for r in hyperball_closeness(v, e, max_radius=6, rel_tol=-1.0).collect()
    }
    # sinks reach nothing: closeness exactly 0
    for s in sinks:
        assert r1[s][1] == 0.0 and r1[s][2] == 0.0
    # every vertex reaching something has positive sum_dist and closeness in (0, 1]
    for i, (reached, sd, c) in r1.items():
        if i not in sinks:
            assert sd > 0 and 0 < c <= 1.0 + 1e-9, (i, r1[i])
    # deterministic under repartitioning
    r2 = {
        r.id: (r.reached, r.sum_dist, r.closeness)
        for r in hyperball_closeness(
            v.repartition(5), e.repartition(3), max_radius=6, rel_tol=-1.0
        ).collect()
    }
    assert r1 == r2
