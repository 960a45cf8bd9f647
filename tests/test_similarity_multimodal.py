"""Similarity search (brute/LSH/kNN-graph) + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amanogawa_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    frame_sample_plan,
    synth_media,
)
from amanogawa_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_lsh,
    embedding_neardup_pairs,
    ivf_topk,
    knn_graph,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(11)
    n, dim = 60, 8
    data = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in data[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, data


def _topk_oracle(data: np.ndarray, k: int) -> dict[int, list[int]]:
    # float32 first (matching the array<float> storage), then double math
    d32 = data.astype(np.float32).astype(np.float64)
    unit = d32 / np.linalg.norm(d32, axis=1, keepdims=True)
    sims = unit @ unit.T
    out = {}
    for i in range(len(d32)):
        order = sorted(
            (j for j in range(len(d32)) if j != i),
            key=lambda j: (-sims[i, j], j),
        )
        out[i] = order[:k]
    return out


def test_brute_topk_matches_numpy(spark, vecs):
    df, data = vecs
    k = 5
    got = cosine_topk_brute(df, k=k).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r.query_id, -r.cosine, r.neighbor_id)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    expected = _topk_oracle(data, k)
    assert by_q == expected


def test_lsh_recall_reasonable(spark, vecs):
    df, data = vecs
    k = 5
    expected = _topk_oracle(data, k)
    got = cosine_topk_lsh(df, k=k, n_tables=8, n_planes=4).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(by_q.get(q, set()) & set(nb)) for q, nb in expected.items())
    recall = hits / (len(expected) * k)
    assert recall > 0.5, f"LSH recall too low: {recall}"


def test_ivf_recall_and_candidate_discipline(spark, vecs):
    df, data = vecs
    k = 5
    expected = _topk_oracle(data, k)
    got = ivf_topk(df, k=k, stride=10, nprobe=3).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    # every query probes >=1 non-empty list, so it gets candidates
    assert set(by_q) == set(expected)
    hits = sum(len(by_q.get(q, set()) & set(nb)) for q, nb in expected.items())
    recall = hits / (len(expected) * k)
    assert recall > 0.4, f"IVF recall too low: {recall}"
    # no self-pairs, at most k results per query
    assert all(q not in nbrs for q, nbrs in by_q.items())
    assert all(len(nbrs) <= k for nbrs in by_q.values())


def test_embedding_neardup_matches_numpy(spark, vecs):
    df, data = vecs
    tau = 0.3
    d32 = data.astype(np.float32).astype(np.float64)
    unit = d32 / np.linalg.norm(d32, axis=1, keepdims=True)
    sims = unit @ unit.T
    expected = {
        (i, j)
        for i in range(len(d32))
        for j in range(i + 1, len(d32))
        if sims[i, j] >= tau - 1e-9
    }
    got = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(df, threshold=tau).collect()}
    # fp tolerance: only boundary pairs may differ
    assert not {
        p for p in got ^ expected if abs(sims[p[0], p[1]] - tau) > 1e-6
    }


def test_knn_graph_undirected_dedup(spark, vecs):
    df, _ = vecs
    e = knn_graph(df, k=3, mode="exact").collect()
    pairs = [(r.src_id, r.dst_id) for r in e]
    assert len(pairs) == len(set(pairs))  # deduped
    assert all(s < d for s, d in pairs)  # canonical min/max orientation
    assert all(s != d for s, d in pairs)


def test_media_features_deterministic(spark):
    media = synth_media(spark, n=30)
    f1 = {r.media_id: r.feature for r in extract_features(media, dim=8).collect()}
    f2 = {
        r.media_id: r.feature
        for r in extract_features(media.repartition(7), dim=8).collect()
    }
    assert f1 == f2  # byte-stable across partitionings
    assert all(len(v) == 8 for v in f1.values())


def test_media_decode_stub_raises():
    from amanogawa_spark.operators.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"png")
    with pytest.raises(NotImplementedError):
        decode_audio(b"wav")
    # the fake decoder is a pure function of bytes
    assert fake_decoder(b"abc").tolist() == fake_decoder(b"abc").tolist()


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=9)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r.frame_ms % 1000 == 0 for r in rows)
    # frame instants are < duration: seeking t == duration is EOF
    assert all(r.frame_ms < 5000 for r in rows)
    vids = media.filter(F.col("kind") == "video").count()
    assert len(rows) == vids * 5  # 0..4999 step 1000


@pytest.fixture(scope="module")
def neardup_vecs(spark):
    """Clustered corpus with genuine near-duplicates: 20 base vectors, each
    with 2 jittered copies (cosine ~0.99) plus the independent remainder."""
    rng = np.random.default_rng(23)
    dim = 16
    rows, idx = [], 0
    for _ in range(20):
        base = rng.normal(size=dim)
        for _ in range(3):
            v = base + rng.normal(scale=0.03, size=dim)
            rows.append((idx, [float(x) for x in v]))
            idx += 1
    for _ in range(30):
        rows.append((idx, [float(x) for x in rng.normal(size=dim)]))
        idx += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_neardup_lsh_recall_vs_brute(spark, neardup_vecs):
    """The default (LSH-candidate) near-dup must recover nearly every
    brute-force pair at a real near-dup threshold; brute is opt-in only."""
    from amanogawa_spark.operators.similarity import embedding_neardup

    thr = 0.9
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(neardup_vecs, threshold=thr, candidates="brute").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(
            neardup_vecs, threshold=thr, candidates="lsh", dim=16, n_tables=8, n_planes=6
        ).collect()
    }
    assert brute, "fixture must contain near-dup pairs"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"LSH near-dup recall {recall:.2f} < 0.9 ({len(brute)} true pairs)"


def test_embedding_neardup_ivf_candidates(spark, neardup_vecs):
    from amanogawa_spark.operators.similarity import embedding_neardup

    thr = 0.9
    brute = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(neardup_vecs, threshold=thr, candidates="brute").collect()
    }
    ivf = {
        (r.id_a, r.id_b)
        for r in embedding_neardup(
            neardup_vecs, threshold=thr, candidates="ivf", stride=10, nprobe=3
        ).collect()
    }
    recall = len(ivf & brute) / len(brute)
    assert recall >= 0.6, f"IVF near-dup recall {recall:.2f} < 0.6"


def test_kmeans_matches_numpy_lloyd(spark, neardup_vecs):
    """Distributed Lloyd's == local numpy Lloyd's with the identical
    deterministic init (hash-smallest ids), per-iteration."""
    from amanogawa_spark.operators.kmeans import kmeans_centroids

    rows = sorted(
        ((r.vec_id, [float(x) for x in r.embedding]) for r in neardup_vecs.collect())
    )
    data = {i: np.array(v) for i, v in rows}
    k, iters, seed = 5, 4, 0

    got = kmeans_centroids(
        neardup_vecs, k=k, max_iter=iters, tol=-1.0, seed=seed
    ).collect()
    got_c = {r.cid: np.array(r.cv) for r in got}

    # replicate init: k hash-smallest ids under xxhash64(id, seed)
    from pyspark.sql import functions as F

    order = [
        r.vec_id
        for r in neardup_vecs.select("vec_id")
        .orderBy(F.xxhash64("vec_id", F.lit(seed)), F.asc("vec_id"))
        .limit(k)
        .collect()
    ]
    cents = [data[i].copy() for i in order]
    for _ in range(iters):
        assign = {}
        for i, v in data.items():
            d = [float(np.sum((v - c) ** 2)) for c in cents]
            assign[i] = int(np.argmin(d))  # first min == lowest cid
        for cid in range(k):
            members = [data[i] for i, a in assign.items() if a == cid]
            if members:
                cents[cid] = np.mean(members, axis=0)
    for cid in range(k):
        assert np.allclose(got_c[cid], cents[cid], atol=1e-9), cid


def test_ivf_with_kmeans_centroids_recall(spark, neardup_vecs):
    """ivf_topk fed by kmeans centroids: recall vs brute must beat the
    naive stride-quantizer on the clustered fixture."""
    from amanogawa_spark.operators.kmeans import kmeans_centroids
    from amanogawa_spark.operators.similarity import cosine_topk_brute, ivf_topk

    kk = 3
    brute = {}
    for r in cosine_topk_brute(neardup_vecs, k=kk).collect():
        brute.setdefault(r.query_id, set()).add(r.neighbor_id)
    cents = kmeans_centroids(neardup_vecs, k=12, max_iter=5)
    got = {}
    for r in ivf_topk(neardup_vecs, k=kk, nprobe=3, centroids=cents).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & nb) for q, nb in brute.items())
    recall = hits / (len(brute) * kk)
    assert recall >= 0.7, f"IVF+kmeans recall {recall:.2f}"
