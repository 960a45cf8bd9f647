"""Algorithm oracles for content-defined chunking."""

from __future__ import annotations

import hashlib

from amanogawa_spark.operators.chunking import cdc_chunks, cdc_dup_stats


def _py_cuts(text: str, window: int, modulus: int) -> list[int]:
    """Pure-python mirror of the boundary rule (md5 window hash)."""
    cuts = []
    for i in range(window, len(text) + 1):
        gram = text[i - window : i]
        h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
        if h % modulus == 0:
            cuts.append(i)
    if not cuts or cuts[-1] != len(text):
        cuts.append(len(text))
    return cuts


def _py_chunks(text: str, window: int = 8, modulus: int = 32) -> list[str]:
    cuts = _py_cuts(text, window, modulus)
    out, prev = [], 0
    for c in cuts:
        out.append(text[prev:c])
        prev = c
    return out


def _spark_chunks(spark, text: str, **kw) -> list[str]:
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = cdc_chunks(df, **kw).orderBy("chunk_idx").collect()
    return [r["chunk_text"] for r in rows]


TEXT = (
    "the quick brown fox jumps over the lazy dog and then the quick "
    "brown fox jumps again across a much wider river of words before "
    "settling down near the old stone bridge for a quiet afternoon nap"
)


def test_matches_python_mirror(spark):
    got = _spark_chunks(spark, TEXT)
    want = _py_chunks(TEXT)
    assert got == want
    assert "".join(got) == TEXT  # chunks reassemble the document exactly


def test_shift_resistance_under_prefix_edit(spark):
    """An insertion at the top shifts only the chunk it lands in — every
    chunk after the first re-aligned boundary is byte-identical (the
    property fixed-stride chunking lacks)."""
    orig = _py_chunks(TEXT)
    edited = _py_chunks("BREAKING UPDATE: " + TEXT)
    # everything from the second original chunk onward reappears verbatim
    assert len(orig) > 3
    tail = orig[1:]
    assert all(c in edited for c in tail)
    # and the same holds through the Spark path
    assert _spark_chunks(spark, "BREAKING UPDATE: " + TEXT) == edited


def test_short_and_empty_docs_one_chunk(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "tiny"), (2, "exactly8")], "doc_id long, text string"
    )
    rows = cdc_chunks(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    assert [r["chunk_text"] for r in by[0]] == [""]
    assert [r["chunk_text"] for r in by[1]] == ["tiny"]
    assert "".join(r["chunk_text"] for r in sorted(by[2], key=lambda r: r["chunk_idx"])) == "exactly8"


def test_xxhash_mode_also_reassembles(spark):
    got = _spark_chunks(spark, TEXT, hash="xxhash64", modulus=16)
    assert "".join(got) == TEXT
    assert len(got) >= 2  # expected length 16 -> multiple chunks


def test_dup_stats_flags_shared_chunks(spark):
    # doc 1 embeds doc 0's text wholesale -> doc 0's chunks are shared
    df = spark.createDataFrame(
        [(0, TEXT), (1, TEXT + " plus an entirely new trailing sentence"),
         (2, "completely unrelated content with no overlap whatsoever here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cdc_dup_stats(df).collect()}
    assert rows[0]["dup_frac"] > 0.5
    assert rows[1]["n_shared"] >= 1
    assert rows[2]["dup_frac"] == 0.0


def test_poly_mode_reassembles_and_shift_resists(spark):
    got = _spark_chunks(spark, TEXT, hash="poly")
    assert "".join(got) == TEXT
    assert len(got) >= 2
    edited = _spark_chunks(spark, "BREAKING UPDATE: " + TEXT, hash="poly")
    # content-defined: everything after the first re-aligned boundary matches
    assert all(c in edited for c in got[1:])


def test_poly_mode_matches_numpy_mirror(spark):
    import numpy as np

    window, modulus = 8, 32
    n = len(TEXT)
    cp = np.frombuffer(TEXT.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    acc = np.zeros(n - window + 1, dtype=np.uint64)
    mul = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(window):
            acc += cp[j : n - window + 1 + j] * mul
            mul = mul * np.uint64(1099511628211)
    ends = sorted(set((np.nonzero(acc % np.uint64(modulus) == 0)[0] + window).tolist()) | {n})
    want, prev = [], 0
    for c in ends:
        want.append(TEXT[prev:c])
        prev = c
    assert _spark_chunks(spark, TEXT, hash="poly", modulus=modulus) == want


def test_poly_dup_stats_flags_shared_chunks(spark):
    from amanogawa_spark.operators.chunking import cdc_dup_stats

    df = spark.createDataFrame(
        [(0, TEXT), (1, TEXT + " extra trailing content"), (2, "nothing in common at all here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in cdc_dup_stats(df, hash="poly").collect()}
    assert rows[0]["dup_frac"] > 0.5 and rows[2]["dup_frac"] == 0.0
