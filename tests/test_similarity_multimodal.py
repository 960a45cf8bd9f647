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


def test_embedding_neardup_hot_bucket_guard(spark):
    """A dense direction cluster funnels into one LSH bucket per table; the
    max_bucket_size guard must drop those buckets and bound the candidate
    self-join (the measured B²-blowup in BENCH/BASELINE.md §3c, reached
    through the embedding_neardup entry point)."""
    from amanogawa_spark.operators.similarity import embedding_neardup

    rng = np.random.default_rng(7)
    dim = 16
    hot = rng.normal(size=dim)
    rows = [
        (i, [float(x) for x in hot + rng.normal(scale=0.001, size=dim)])
        for i in range(50)
    ]
    rows += [
        (50 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    unguarded = embedding_neardup(df, threshold=0.99, candidates="lsh").count()
    guarded = embedding_neardup(
        df, threshold=0.99, candidates="lsh", max_bucket_size=10
    ).count()
    assert unguarded >= 50 * 49 / 2  # the hot cluster is all-pairs similar
    # every bucket holding the 50-member cluster exceeds the cap, so its
    # B² self-join never happens
    assert guarded < unguarded / 10

    # ivf branch takes the same guard
    g_ivf = embedding_neardup(
        df, threshold=0.99, candidates="ivf", stride=10, nprobe=2,
        max_bucket_size=10,
    ).count()
    u_ivf = embedding_neardup(
        df, threshold=0.99, candidates="ivf", stride=10, nprobe=2
    ).count()
    assert g_ivf <= u_ivf


def test_knn_graph_default_has_no_cartesian_product(spark, vecs):
    """The default mode a user grabs must be the bucketed scale path:
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    df, _ = vecs
    e = knn_graph(df, k=3)
    plan = e._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # and it still yields canonical undirected edges
    pairs = [(r.src_id, r.dst_id) for r in e.collect()]
    assert pairs and all(s < d for s, d in pairs)


def test_ppm_decode_roundtrip():
    """decode_image must reproduce the exact pixel values synth_ppm wrote."""
    from amanogawa_spark.operators.multimodal import decode_image, synth_ppm

    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n7 5\n255\n" + pixels.tobytes()
    img = decode_image(payload)
    assert img.shape == (5, 7, 3)
    assert np.array_equal((img * 255).round().astype(np.uint8), pixels)
    # and the synth helper parses through the same path
    img2 = decode_image(synth_ppm(8, 6, seed=1))
    assert img2.shape == (6, 8, 3) and 0.0 <= img2.min() and img2.max() <= 1.0


def test_wav_decode_roundtrip():
    from amanogawa_spark.operators.multimodal import decode_audio, synth_wav

    payload = synth_wav(4000, rate=8000, seed=2)
    x = decode_audio(payload)
    assert x.shape == (4000,)
    assert np.abs(x).max() <= 1.0
    # the 250 Hz sine dominates: energy is non-trivial
    assert np.sqrt(np.mean(x**2)) > 0.2


def test_real_decoders_end_to_end(spark):
    """extract_features(decoder='image'/'audio') over real PPM/WAV payloads:
    deterministic under repartitioning (the round-3 'no stub left' check)."""
    from amanogawa_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        synth_ppm,
        synth_wav,
    )

    rows = [
        (i, "image", synth_ppm(16, 12, seed=i), "image/x-portable-pixmap", 16, 12, None)
        for i in range(8)
    ] + [
        (100 + i, "audio", synth_wav(2000, seed=i), "audio/wav", None, None, 250)
        for i in range(8)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    imgs = media.filter(F.col("kind") == "image")
    auds = media.filter(F.col("kind") == "audio")

    f1 = {r.media_id: r.feature for r in extract_features(imgs, dim=9, decoder="image").collect()}
    f2 = {
        r.media_id: r.feature
        for r in extract_features(imgs.repartition(5), dim=9, decoder="image").collect()
    }
    assert f1 == f2 and len(f1) == 8
    assert all(len(v) == 9 and any(x > 0 for x in v) for v in f1.values())

    a1 = {r.media_id: r.feature for r in extract_features(auds, dim=6, decoder="audio").collect()}
    a2 = {
        r.media_id: r.feature
        for r in extract_features(auds.repartition(3), dim=6, decoder="audio").collect()
    }
    assert a1 == a2 and len(a1) == 8
    assert all(len(v) == 6 and any(x > 0 for x in v) for v in a1.values())


def test_png_decode_roundtrip_matches_ppm():
    """decode_image over a synthesized PNG (all five filter types across
    rows) reproduces the exact pixel matrix the PPM path yields."""
    import numpy as np

    from amanogawa_spark.operators.multimodal import (
        decode_image,
        encode_png,
        synth_png,
        synth_ppm,
    )

    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    for filters in (None, [1] * 9, [2] * 9, [3] * 9, [4] * 9, [0, 1, 2, 3, 4, 4, 3, 2, 1]):
        img = decode_image(encode_png(pixels, filters=filters))
        assert img.shape == (9, 7, 3)
        assert np.array_equal((img * 255).round().astype(np.uint8), pixels), filters
    # PNG and PPM of the same seed decode bit-identically
    a = decode_image(synth_png(8, 6, seed=3))
    b = decode_image(synth_ppm(8, 6, seed=3))
    assert np.array_equal(a, b)
    # greyscale color type 0 expands to 3 identical channels
    grey = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    g = decode_image(encode_png(grey, filters=[4, 2, 1, 3]))
    assert np.array_equal(g[:, :, 0], g[:, :, 2])
    assert np.array_equal((g[:, :, 0] * 255).round().astype(np.uint8), grey)


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import numpy as np
    import pytest

    from amanogawa_spark.operators.multimodal import _PNG_SIG, decode_image, encode_png

    with pytest.raises(NotImplementedError):
        decode_image(_PNG_SIG + b"\x00" * 10)  # no IHDR/IDAT
    # forge a 16-bit-depth IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(NotImplementedError):
        decode_image(_PNG_SIG + chunk)
    # valid PNG still decodes after the failures (no shared state)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    assert decode_image(encode_png(px)).shape == (2, 2, 3)


def test_png_media_pipeline_repartition_invariant(spark):
    """PNG payloads through the media feature pipeline: byte-stable
    features, invariant to input partitioning."""
    from amanogawa_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        synth_png,
    )

    rows = [
        (i, "image", synth_png(12, 10, seed=i), "image/png", 12, 10, None)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    f1 = {
        r["media_id"]: tuple(r["feature"])
        for r in extract_features(df, dim=8, decoder="image").collect()
    }
    f2 = {
        r["media_id"]: tuple(r["feature"])
        for r in extract_features(df.repartition(7), dim=8, decoder="image").collect()
    }
    assert f1 == f2
    assert all(len(v) == 8 for v in f1.values())


def test_lsh_arrow_path_matches_expr_path(spark):
    """The gram-matrix per-bucket top-k == the pair-join path (lossless
    vs the pair-union semantics); cosines compared at 1e-9."""
    from amanogawa_spark.fixtures.distributed import distributed_embeddings
    from amanogawa_spark.operators.similarity import cosine_topk_lsh

    emb = distributed_embeddings(spark, 600, dim=16, n_clusters=20)
    kw = dict(k=4, dim=16, n_tables=3, n_planes=8, max_bucket_size=200)
    expr = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk_lsh(emb, **kw).collect()
    }
    arrow = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk_lsh(emb, method="arrow", **kw).collect()
    }
    assert set(expr) == set(arrow)
    for key, v in expr.items():
        assert abs(arrow[key] - v) < 1e-9, key
