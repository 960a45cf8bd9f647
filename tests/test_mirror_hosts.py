"""Cross-host mirror detection — planted mirrors, guard, thresholds."""

from __future__ import annotations

from amanogawa_spark.operators.dedup import mirror_hosts


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_full_and_partial_mirror(spark):
    rows = [(f"https://big.com/p{i}", f"doc {i}") for i in range(10)]
    rows += [(f"https://copy.com/x{i}", f"doc {i}") for i in range(10)]  # full
    rows += [(f"https://scrape.com/y{i}", f"doc {i}") for i in range(4)]  # subset
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_hosts(_corpus(spark, rows), min_shared=3).collect()
    }
    full = got[("big.com", "copy.com")]
    assert full["n_shared"] == 10 and full["jaccard_r"] == 1.0
    assert full["containment_r"] == 1.0
    sub = got[("big.com", "scrape.com")]
    assert sub["n_shared"] == 4 and sub["containment_r"] == 1.0
    assert sub["jaccard_r"] == round(4 / 10, 6)  # low jaccard, high containment
    assert ("copy.com", "scrape.com") in got  # the mirror pair also shares


def test_min_shared_and_containment_filters(spark):
    rows = [(f"https://a.com/{i}", f"t {i}") for i in range(10)]
    rows += [(f"https://b.com/{i}", f"t {i}") for i in range(2)]  # only 2 shared
    rows += [(f"https://c.com/{i}", f"t {i}") for i in range(3)]
    rows += [(f"https://c.com/own{i}", f"own {i}") for i in range(7)]  # cont 0.3
    got = mirror_hosts(_corpus(spark, rows), min_shared=3).collect()
    keys = {(r["host_a"], r["host_b"]) for r in got}
    assert ("a.com", "b.com") not in keys  # below min_shared
    assert ("a.com", "c.com") not in keys  # containment 3/10 < 0.5
    got2 = mirror_hosts(
        _corpus(spark, rows), min_shared=2, containment_threshold=0.2
    ).collect()
    keys2 = {(r["host_a"], r["host_b"]) for r in got2}
    assert ("a.com", "b.com") in keys2 and ("a.com", "c.com") in keys2


def test_hot_fingerprint_guard(spark):
    # one boilerplate page served by 30 hosts + real mirror pair
    rows = [(f"https://s{i}.com/404", "not found") for i in range(30)]
    rows += [(f"https://x.com/{i}", f"real {i}") for i in range(5)]
    rows += [(f"https://y.com/{i}", f"real {i}") for i in range(5)]
    got = mirror_hosts(_corpus(spark, rows), min_shared=3, max_hosts_per_fp=20)
    pairs = {(r["host_a"], r["host_b"]) for r in got.collect()}
    # the 30-host boilerplate fp is dropped: no s*xs* cross-product pairs
    assert pairs == {("x.com", "y.com")}


def test_within_host_dups_count_once(spark):
    # duplicated text WITHIN a host dedupes before sizing (distinct fps)
    rows = [("https://a.com/1", "same"), ("https://a.com/2", "same")]
    rows += [("https://b.com/1", "same"), ("https://b.com/2", "other")]
    got = mirror_hosts(
        _corpus(spark, rows), min_shared=1, containment_threshold=0.0
    ).collect()
    r = got[0]
    assert (r["host_a"], r["host_b"]) == ("a.com", "b.com")
    assert r["n_a"] == 1 and r["n_b"] == 2 and r["n_shared"] == 1
    assert r["containment_r"] == 1.0
