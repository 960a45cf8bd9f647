"""Incremental (cross-snapshot) dedup against fingerprint/signature stores
and the Bloom-filter seen-set — hand-built batches with planted exact and
near duplicates, plus a pure-python Bloom mirror."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_build,
    bloom_contains,
    bloom_merge,
)
from amanogawa_spark.operators.dedup import (
    incremental_exact_dedup,
    incremental_minhash_dedup,
    minhash_signature_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "completely different content about spark physical plans"),
    (3, "a third document with its own unique words entirely"),
]


def test_incremental_exact_bootstrap_and_second_batch(spark):
    b1 = _docs(spark, BASE)
    kept1, store1 = incremental_exact_dedup(b1, None)
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2, 3]
    assert store1.count() == 3

    b2 = _docs(
        spark,
        [
            (10, BASE[0][1]),              # exact dup of stored 1 → dropped
            (11, "The  QUICK brown fox jumps over the lazy dog again and again"),
            (12, "genuinely new content in the second crawl"),
            (13, "genuinely new content in the second crawl"),  # within-batch dup
        ],
    )
    kept2, store2 = incremental_exact_dedup(b2, store1)
    # 11 normalizes to the same text as 1 (case/whitespace) → dropped too
    assert sorted(r["doc_id"] for r in kept2.collect()) == [12]
    assert store2.count() == 4
    # idempotent: re-presenting batch 2 against the new store keeps nothing
    kept3, _ = incremental_exact_dedup(b2, store2)
    assert kept3.count() == 0


def test_incremental_exact_matches_batch_dedup_when_bootstrapping(spark):
    from amanogawa_spark.operators.dedup import dedup_exact

    rows = [(i, f"text number {i % 4}") for i in range(12)]
    df = _docs(spark, rows)
    kept, _ = incremental_exact_dedup(df, None)
    batch = dedup_exact(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in batch.collect()
    )


NEAR_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
NEAR_A2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"


def test_incremental_minhash_drops_vs_store_and_within_batch(spark):
    b1 = _docs(spark, [(1, NEAR_A), (2, "totally unrelated words about parquet row groups and columnar io")])
    kept1, store1 = incremental_minhash_dedup(b1, None, threshold=0.5, hash="md5")
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]
    assert store1.count() == 2

    b2 = _docs(
        spark,
        [
            (10, NEAR_A2),  # near-dup of stored 1 → dropped
            (11, "brand new content concerning shuffle partitions and skew"),
            (12, "brand new content concerning shuffle partitions and skew joins"),
        ],
    )
    kept2, store2 = incremental_minhash_dedup(b2, store1, threshold=0.5, hash="md5")
    ids = sorted(r["doc_id"] for r in kept2.collect())
    # 12 is a near-dup of 11 within the batch → higher id dropped
    assert ids == [11]
    assert store2.count() == 3


def test_incremental_minhash_bootstrap_no_store(spark):
    b = _docs(spark, [(1, NEAR_A), (2, NEAR_A2), (3, "unrelated text with other words wholly distinct")])
    kept, store = incremental_minhash_dedup(b, None, threshold=0.5, hash="md5")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    # store carries the kept signatures only
    assert sorted(r["id"] for r in store.collect()) == [1, 3]


def test_incremental_minhash_store_never_pairs_with_itself(spark):
    # two near-identical docs ALREADY in the store must both survive —
    # old x old is out of scope by construction
    b1 = _docs(spark, [(1, NEAR_A)])
    _, store1 = incremental_minhash_dedup(b1, None, threshold=0.5, hash="md5")
    sig2 = minhash_signature_table(_docs(spark, [(2, NEAR_A2)]), hash="md5")
    store = store1.unionByName(sig2)
    b2 = _docs(spark, [(10, "fresh unrelated second crawl content")])
    kept, new_store = incremental_minhash_dedup(b2, store, threshold=0.5, hash="md5")
    assert kept.count() == 1
    assert new_store.count() == 3  # nothing evicted from the store


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def _py_positions(key: str, k: int, m: int) -> list[int]:
    out = []
    for i in range(k):
        h = hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % m)
    return out


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], ["url"])


def test_bloom_build_matches_python_mirror(spark):
    keys = [f"https://example.com/page/{i}" for i in range(30)]
    m, k = 1 << 12, 4
    words = {
        r["word_idx"]: r["word"]
        for r in bloom_build(_keys(spark, keys), "url", m_bits=m, k_hashes=k).collect()
    }
    exp: dict[int, int] = {}
    for key in keys:
        for p in _py_positions(key, k, m):
            exp[p // BITS_PER_WORD] = exp.get(p // BITS_PER_WORD, 0) | (
                1 << (p % BITS_PER_WORD)
            )
    assert words == exp


def test_bloom_no_false_negatives_and_low_fp(spark):
    m, k = 1 << 14, 4
    members = [f"https://crawled.example/{i}" for i in range(200)]
    bloom = bloom_build(_keys(spark, members), "url", m_bits=m, k_hashes=k)
    probe = members + [f"https://new.example/{i}" for i in range(400)]
    res = {
        r["url"]: r["maybe_seen"]
        for r in bloom_contains(_keys(spark, probe), "url", bloom, m_bits=m, k_hashes=k).collect()
    }
    assert all(res[u] for u in members)  # zero false negatives — hard guarantee
    fp = sum(res[u] for u in probe if u not in set(members))
    assert fp / 400 < 0.05  # m/n = 82 bits/key, k=4 → expected fp ~1e-4


def test_bloom_merge_equals_joint_build(spark):
    m, k = 1 << 12, 3
    a = [f"a{i}" for i in range(50)]
    b = [f"b{i}" for i in range(50)]
    merged = bloom_merge(
        bloom_build(_keys(spark, a), "url", m, k),
        bloom_build(_keys(spark, b), "url", m, k),
    )
    joint = bloom_build(_keys(spark, a + b), "url", m, k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, joint.collect()))


def test_bloom_repartition_invariant(spark):
    keys = _keys(spark, [f"k{i}" for i in range(300)])
    x = sorted(map(tuple, bloom_build(keys, "url").collect()))
    y = sorted(map(tuple, bloom_build(keys.repartition(11), "url").collect()))
    assert x == y
