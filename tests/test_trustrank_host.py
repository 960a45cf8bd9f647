"""Algorithm oracles for TrustRank/spam-mass and the host-graph rollup."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _np_seeded_pagerank(n, edges, seeds, iters, d=0.85):
    """Reference power iteration: r' = (1−d)s + d(Aᵀ r/out + dm·s);
    uniform PageRank is the seeds=all special case with s = 1/n."""
    s = np.zeros(n)
    s[list(seeds)] = 1.0 / len(seeds)
    out = np.zeros(n)
    for u, _ in edges:
        out[u] += 1
    r = s.copy()
    for _ in range(iters):
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[v] += d * r[u] / out[u]
        dm = r[out == 0].sum()
        nxt += s * ((1 - d) + d * dm)
        r = nxt
    return r


EDGES = [
    (0, 1), (1, 0), (1, 2), (2, 0),          # trusted cluster
    (3, 4), (4, 3), (4, 5), (5, 3), (5, 4),  # spam farm, unreachable from seeds
    (5, 0),                                   # farms point AT real sites
]
N = 6


@pytest.fixture(scope="module")
def graph(spark):
    e = spark.createDataFrame(EDGES, "src_id long, dst_id long")
    v = spark.createDataFrame([(i,) for i in range(N)], "id long")
    return v, e


def test_trustrank_matches_numpy(spark, graph):
    from amanogawa_spark.graph.trustrank import trustrank

    v, e = graph
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    got = {
        r["id"]: r["rank"]
        for r in trustrank(v, e, seeds, tol=-1.0, max_iter=5).ranks.collect()
    }
    want = _np_seeded_pagerank(N, EDGES, [0, 1], 5)
    assert np.allclose([got[i] for i in range(N)], want, atol=1e-12)


def test_spam_mass_separates_farm_from_trusted(spark, graph):
    """The farm pages (3,4,5) accumulate rank from their own loop but no
    trust reaches them (no in-link from the trusted side) → spam mass = 1;
    the trusted cluster's mass is far lower (negative = over-trusted)."""
    from amanogawa_spark.graph.trustrank import spam_mass_scores

    v, e = graph
    seeds = spark.createDataFrame([(0,), (1,)], "id long")
    m = {
        r["id"]: r["spam_mass"]
        for r in spam_mass_scores(v, e, seeds, tol=-1.0, max_iter=20).collect()
    }
    assert all(m[i] < 0.5 for i in (0, 1, 2)), m
    assert all(m[i] > 0.99 for i in (3, 4, 5)), m
    # score vectors both sum to 1 → mass formula mirrors numpy exactly
    pr = _np_seeded_pagerank(N, EDGES, list(range(N)), 20)
    tr = _np_seeded_pagerank(N, EDGES, [0, 1], 20)
    want = (pr - tr) / pr
    assert np.allclose([m[i] for i in range(N)], want, atol=1e-10)


def test_host_graph_rollup(spark):
    from amanogawa_spark.graph.host import host_graph, host_vertices

    rows = [
        ("http://a.com/1", "https://B.COM/x"),     # a->b
        ("http://a.com/2", "http://b.com:80/y"),   # a->b (port stripped)
        ("http://a.com/3", "http://a.com/4"),      # intra-host: dropped
        ("https://User@b.com/z", "http://c.org/"), # userinfo stripped: b->c
        ("not a url", "http://c.org/"),            # junk src: dropped
    ]
    e = spark.createDataFrame(rows, "src_url string, dst_url string")
    hg = {(r["src_host"], r["dst_host"]): r["weight"] for r in host_graph(e).collect()}
    assert hg == {("a.com", "b.com"): 2, ("b.com", "c.org"): 1}
    hosts = {r["id"] for r in host_vertices(host_graph(e)).collect()}
    assert hosts == {"a.com", "b.com", "c.org"}
    kept = host_graph(e, keep_intra_host=True).collect()
    assert {(r["src_host"], r["dst_host"]) for r in kept} >= {("a.com", "a.com")}


def test_host_rank_mass_and_weighting(spark):
    """Host rank sums to 1; the host receiving 10 page links outranks the
    one receiving 1 from the same source (weighted split)."""
    from amanogawa_spark.graph.host import host_rank

    rows = [("http://s.com/%d" % i, "http://big.com/x") for i in range(10)]
    rows += [("http://s.com/z", "http://small.com/y")]
    e = spark.createDataFrame(rows, "src_url string, dst_url string")
    r = {x["id"]: x["rank"] for x in host_rank(e, fixed_iterations=4).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-9
    assert r["big.com"] > r["small.com"]


def test_powerlaw_alpha_matches_numpy(spark):
    from amanogawa_spark.operators.stats import powerlaw_alpha

    rng = [float(2 + (i * 7) % 40) for i in range(500)] + [0.5, 1.0]
    df = spark.createDataFrame([(x,) for x in rng], "x double")
    row = powerlaw_alpha(df, "x", xmin=2.0).collect()[0]
    tail = np.array([x for x in rng if x >= 2.0])
    want = 1.0 + len(tail) / np.log(tail / 2.0).sum()
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - want) < 1e-9
    assert row["xmin"] == 2.0


def test_weighted_reservoir_deterministic_and_weighted(spark):
    from amanogawa_spark.operators.sampling import weighted_reservoir

    df = spark.createDataFrame(
        [(i, float(1 + i % 10)) for i in range(2000)], "id long, w double"
    )
    a = {r["id"] for r in weighted_reservoir(df, 100, "w", ["id"]).collect()}
    b = {
        r["id"]
        for r in weighted_reservoir(df.repartition(7), 100, "w", ["id"]).collect()
    }
    assert a == b and len(a) == 100
    # heavier rows are drawn more often: mean weight of the sample must
    # exceed the population mean (deterministic given the fixed coins)
    mean_w = sum(1 + i % 10 for i in a) / 100
    pop_w = sum(1 + i % 10 for i in range(2000)) / 2000
    assert mean_w > pop_w
    # w <= 0 rows can never be drawn
    df2 = df.withColumn("w", F.when(F.col("id") < 1990, -1.0).otherwise(F.col("w")))
    only_pos = {r["id"] for r in weighted_reservoir(df2, 100, "w", ["id"]).collect()}
    assert only_pos == set(range(1990, 2000))


def test_weighted_reservoir_matches_local_mirror(spark):
    """The drawn subset equals the brute-force local A-ES computation with
    the same md5 coins."""
    import hashlib

    from amanogawa_spark.operators.sampling import weighted_reservoir

    n, k = 500, 40
    rows = [(i, float(1 + i % 7)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {
        r["id"]
        for r in weighted_reservoir(df, k, "w", ["id"], hash="md5").collect()
    }
    keys = []
    for i, w in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        keys.append((round(np.log(u) / w, 8), -i))
    want = {-t[1] for t in sorted(keys, reverse=True)[:k]}
    assert got == want


def test_perplexity_buckets_match_naive_ntile(spark):
    """The range-partitioned formulation == the single-window NTILE on the
    same (rounded score, id) order, for sizes that do and don't divide 3."""
    from pyspark.sql.window import Window

    from amanogawa_spark.operators.quality import perplexity_buckets

    for n in (9, 10, 11, 2):
        rows = [(i, float((i * 37) % 13) / 7.0) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, s double")
        got = {
            r["id"]: (r["bucket"], r["label"])
            for r in perplexity_buckets(df, "s", "id", n_buckets=3).collect()
        }
        w = Window.orderBy(F.round(F.col("s"), 8).desc(), F.col("id").asc())
        want = {
            r["id"]: r["b"]
            for r in df.select("id", F.ntile(3).over(w).alias("b")).collect()
        }
        labels = {1: "head", 2: "middle", 3: "tail"}
        assert got == {i: (b, labels[b]) for i, b in want.items()}, n


def test_perplexity_buckets_empty(spark):
    from amanogawa_spark.operators.quality import perplexity_buckets

    df = spark.createDataFrame([], "id long, s double")
    assert perplexity_buckets(df, "s", "id").count() == 0
