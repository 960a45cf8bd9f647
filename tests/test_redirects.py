"""Redirect-chain resolution (graph/redirects.py): pointer doubling,
cycle detection, deterministic pointer dedup, edge canonicalization."""

from __future__ import annotations

from amanogawa_spark.graph.redirects import (
    redirect_pointers,
    resolve_redirects,
    rewrite_edges,
)


def _red(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_chain_resolution_exact_hops(spark):
    r = _red(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {x["src"]: (x["final"], x["hops"], x["is_cycle"]) for x in resolve_redirects(r).collect()}
    assert got == {"a": ("d", 3, False), "b": ("d", 2, False), "c": ("d", 1, False)}


def test_long_chain_within_doubling_budget(spark):
    # 40-hop chain: resolved in ceil(log2(40)) = 6 rounds, hops exact
    n = 40
    r = _red(spark, [(f"u{i}", f"u{i + 1}") for i in range(n)])
    got = {x["src"]: (x["final"], x["hops"]) for x in resolve_redirects(r).collect()}
    assert got[f"u{0}"] == (f"u{n}", n)
    assert got[f"u{n - 1}"] == (f"u{n}", 1)
    assert not any(x["is_cycle"] for x in resolve_redirects(r).collect())


def test_cycle_flagged_not_resolved(spark):
    r = _red(spark, [("x", "y"), ("y", "z"), ("z", "x"), ("a", "x")])
    got = {x["src"]: x["is_cycle"] for x in resolve_redirects(r).collect()}
    # cycle members AND chains feeding into a cycle never terminate
    assert got == {"x": True, "y": True, "z": True, "a": True}


def test_pointer_dedup_deterministic(spark):
    # two targets for one source → lexicographic min wins; self-loop dropped
    r = _red(spark, [("a", "c"), ("a", "b"), ("b", "b")])
    ptrs = {x["src"]: x["dst"] for x in redirect_pointers(r).collect()}
    assert ptrs == {"a": "b"}


def test_rewrite_edges_canonicalizes_and_drops_cycles(spark):
    red = _red(spark, [("a", "b"), ("b", "c"), ("x", "y"), ("y", "x")])
    res = resolve_redirects(red)
    e = spark.createDataFrame(
        [("a", "q"), ("q", "b"), ("x", "q"), ("c", "a")],
        ["src_id", "dst_id"],
    )
    got = {(x["src_id"], x["dst_id"]) for x in rewrite_edges(e, res).collect()}
    # a→c, b→c rewrites; x is a cycle member → left as-is; c→a becomes
    # c→c self-loop → dropped
    assert got == {("c", "q"), ("q", "c"), ("x", "q")}


def test_repartition_invariance(spark):
    pairs = [(f"s{i}", f"s{(i * 7) % 23 + 100}") for i in range(60)] + [
        (f"s{100 + i}", f"s{100 + (i + 1) % 5}") for i in range(5)
    ]
    r = _red(spark, pairs)
    a = sorted(map(tuple, resolve_redirects(r).collect()))
    b = sorted(map(tuple, resolve_redirects(r.repartition(13)).collect()))
    assert a == b
