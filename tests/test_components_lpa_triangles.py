"""CC / LPA / triangle-count vs exact local oracles (north rule: exact match)."""

from __future__ import annotations

import pytest

from amanogawa_spark.graph.build import build_edges, build_vertices
from amanogawa_spark.graph.components import (
    connected_components,
    connected_components_minlabel,
)
from amanogawa_spark.graph.lpa import label_propagation
from amanogawa_spark.graph.triangles import triangle_count

from tests.oracles import components_bfs, lpa_sync, triangles_brute


@pytest.fixture(scope="module")
def graph(spark, corpus, pages_df):
    v = build_vertices(pages_df).persist()
    e = build_edges(pages_df, v).persist()
    url_to_id = {r.url: r.id for r in v.collect()}
    id_edges = {(url_to_id[s], url_to_id[d]) for s, d in corpus.expected_edges}
    return v, e, len(url_to_id), id_edges


def test_components_star_exact(spark, graph):
    v, e, n, id_edges = graph
    expected = components_bfs(n, id_edges)
    got = {r.id: r.component for r in connected_components(v, e).collect()}
    assert got == expected
    # the fixture guarantees >= 2 components
    assert len(set(expected.values())) >= 2


def test_components_minlabel_exact(spark, graph):
    v, e, n, id_edges = graph
    expected = components_bfs(n, id_edges)
    got = {r.id: r.component for r in connected_components_minlabel(v, e).collect()}
    assert got == expected


def test_lpa_sync_exact(spark, graph):
    v, e, n, id_edges = graph
    for rounds in (1, 3):
        expected = lpa_sync(n, id_edges, rounds)
        got = {r.id: r.label for r in label_propagation(v, e, max_rounds=rounds).collect()}
        assert got == expected, f"rounds={rounds}"


def test_triangles_exact(spark, graph):
    v, e, n, id_edges = graph
    expected = triangles_brute(id_edges)
    res = triangle_count(e)
    assert res.total == expected
    assert expected > 0  # fixture must make the test non-trivial
