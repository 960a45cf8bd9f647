"""Algorithm oracles for winnowing, conductance, and calibration bins."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from amanogawa_spark.graph.metrics import community_conductance
from amanogawa_spark.operators.classifier import calibration_bins
from amanogawa_spark.operators.dedup import winnow_candidates, winnow_fingerprints


# --- winnowing -------------------------------------------------------------

def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _py_winnow(text: str, k: int = 8, w: int = 4) -> set[tuple[int, int]]:
    hs = [(_h(text[p - 1 : p - 1 + k]), p) for p in range(1, len(text) - k + 2)]
    if not hs:
        return set()
    picks = set()
    if len(hs) < w:
        m = min(h for h, _ in hs)
        picks.add((max(p for h, p in hs if h == m), m))
        return picks
    for s in range(len(hs) - w + 1):
        win = hs[s : s + w]
        m = min(h for h, _ in win)
        picks.add((max(p for h, p in win if h == m), m))
    return picks


TEXT = (
    "winnowing selects a bounded density fingerprint set with a match "
    "guarantee for substrings longer than the window plus gram size"
)


def test_winnow_matches_python_mirror(spark):
    df = spark.createDataFrame([(0, TEXT)], "doc_id long, text string")
    got = {(r["pos"], r["fp"]) for r in winnow_fingerprints(df).collect()}
    assert got == _py_winnow(TEXT)


def test_winnow_match_guarantee(spark):
    """Two docs sharing a substring of length >= w + k - 1 share >= 1
    selected fingerprint (the paper's guarantee)."""
    shared = "this exact shared passage is long enough to guarantee overlap"
    a = "prefix words before " + shared
    b = shared + " completely different suffix content follows here"
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df).collect()
    f0 = {r["fp"] for r in fps if r["doc_id"] == 0}
    f1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    assert f0 & f1
    pairs = winnow_candidates(df, min_shared=1).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]


def test_winnow_hot_fp_guard(spark):
    # the same boilerplate in many docs; guard drops its fingerprints
    docs = [(i, f"unique lead {i} " + "common boilerplate tail everywhere") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    guarded = winnow_candidates(df, min_shared=1, max_docs_per_fp=4).count()
    unguarded = winnow_candidates(df, min_shared=1, max_docs_per_fp=1000).count()
    assert unguarded == 12 * 11 // 2
    assert guarded < unguarded


# --- conductance -----------------------------------------------------------

def test_conductance_two_cliques_one_bridge(spark):
    # two directed triangles bridged by one edge
    tri1 = [(0, 1), (1, 2), (2, 0)]
    tri2 = [(3, 4), (4, 5), (5, 3)]
    e = spark.createDataFrame(tri1 + tri2 + [(0, 3)], "src_id long, dst_id long")
    assign = spark.createDataFrame(
        [(i, 0) for i in (0, 1, 2)] + [(i, 1) for i in (3, 4, 5)],
        "id long, label long",
    )
    rows = {r["label"]: r for r in community_conductance(e, assign).collect()}
    # each community: volume 7 (6 intra endpoints + 1 bridge endpoint),
    # cut 1, total vol 14 -> phi = 1/7
    for lab in (0, 1):
        assert rows[lab]["cut_edges"] == 1
        assert rows[lab]["volume"] == 7
        assert abs(rows[lab]["conductance"] - 1 / 7) < 1e-8


def test_conductance_isolated_community_zero(spark):
    e = spark.createDataFrame([(0, 1), (1, 0), (2, 3)], "src_id long, dst_id long")
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, label long"
    )
    rows = {r["label"]: r for r in community_conductance(e, assign).collect()}
    assert rows[0]["cut_edges"] == 0 and rows[0]["conductance"] == 0.0


# --- calibration -----------------------------------------------------------

def test_calibration_perfectly_calibrated_gaps_zero(spark):
    # bin [0.2, 0.3): score 0.25, 1 of 4 positive -> frac 0.25, gap 0
    rows = [(0.25, 1.0), (0.25, 0.0), (0.25, 0.0), (0.25, 0.0)] + [
        (0.75, 1.0),
        (0.75, 1.0),
        (0.75, 1.0),
        (0.75, 0.0),
    ]
    df = spark.createDataFrame(rows, "score double, label double")
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert out[2]["abs_gap"] == 0.0 and out[7]["abs_gap"] == 0.0
    assert out[2]["n"] == 4 and out[7]["frac_pos"] == 0.75


def test_calibration_top_bin_clamped(spark):
    df = spark.createDataFrame([(1.0, 1.0), (0.999, 1.0)], "score double, label double")
    rows = calibration_bins(df, n_bins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 9 and rows[0]["n"] == 2


def test_calibration_miscalibration_detected(spark):
    df = spark.createDataFrame(
        [(0.9, 0.0)] * 8 + [(0.9, 1.0)] * 2, "score double, label double"
    )
    r = calibration_bins(df, n_bins=10).collect()[0]
    assert abs(r["abs_gap"] - 0.7) < 1e-8  # predicted 0.9, observed 0.2
