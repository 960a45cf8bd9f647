"""Property-based tests (hypothesis) for the invariants that matter at any
scale: packing conserves the token stream exactly, template induction is an
identity when nothing is wildcarded, negative-sampling draws are unique per
(edge, sample_no) — i.e. the interval->bucket join can never double-emit."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_FAST = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    tokens=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40),
    max_tokens=st.integers(min_value=8, max_value=64),
)
@_FAST
def test_pack_sequences_conserves_the_stream(spark, tokens, max_tokens):
    from amanogawa_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    rows = pack_sequences(df, max_tokens=max_tokens, hash="md5").collect()
    assert len(rows) == len(tokens)
    # reconstruct each doc's global start offset; sorted starts must be the
    # exact prefix sums of the token stream (no gaps, no overlaps)
    starts = sorted(
        (r["seq_id"] * max_tokens + r["seq_offset"], r["n_tokens"]) for r in rows
    )
    acc = 0
    for start, n in starts:
        assert start == acc
        acc += n
    assert acc == sum(tokens)


@given(
    paths=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4
        ).map(lambda segs: "/" + "/".join(segs)),
        min_size=1,
        max_size=15,
    )
)
@_FAST
def test_url_templates_identity_when_nothing_wildcards(spark, paths):
    from amanogawa_spark.functions.url import url_templates

    df = spark.createDataFrame(
        [(f"http://h.com{p}",) for p in paths], "url string"
    )
    # threshold above any possible cardinality: every position stays literal
    out = url_templates(df, wildcard_min_distinct=10_000).collect()
    for r in out:
        assert r["template"] == r["url"].removeprefix("http://h.com")


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
        unique=True,
    ),
    m=st.integers(min_value=1, max_value=4),
)
@_FAST
def test_negative_samples_unique_per_draw(spark, edges, m):
    from amanogawa_spark.graph.negsample import degree_negative_samples

    df = spark.createDataFrame(edges, "src_id long, dst_id long")
    rows = degree_negative_samples(df, m=m, hash="md5").collect()
    keys = [(r["src_id"], r["dst_id"], r["sample_no"]) for r in rows]
    # at most one candidate owns any draw's interval: no duplicate keys ever
    assert len(keys) == len(set(keys))
    assert len(keys) <= len(edges) * m


@given(
    tokens=st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=30),
    max_tokens=st.integers(min_value=8, max_value=48),
)
@_FAST
def test_sequence_manifest_tiles_every_sequence_exactly(spark, tokens, max_tokens):
    from amanogawa_spark.operators.packing import pack_sequences, sequence_manifest

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, max_tokens=max_tokens, hash="md5")
    rows = sequence_manifest(packed, max_tokens=max_tokens).collect()
    total = sum(tokens)
    # slices within bounds, nonempty, and zero-token docs absent
    for r in rows:
        assert 0 <= r["tok_begin"] < r["tok_end"] <= max_tokens
    # per sequence: slices sort into a gapless tiling [0, fill)
    from collections import defaultdict

    per_seq = defaultdict(list)
    for r in rows:
        per_seq[r["seq_id"]].append((r["tok_begin"], r["tok_end"]))
    covered = 0
    for seq, sl in per_seq.items():
        sl.sort()
        assert sl[0][0] == 0
        for (b1, e1), (b2, e2) in zip(sl, sl[1:]):
            assert e1 == b2  # gapless, non-overlapping
        covered += sl[-1][1]
        if seq != max(per_seq):
            assert sl[-1][1] == max_tokens  # every non-final sequence is full
    assert covered == total


@given(
    text=st.text(
        alphabet=st.sampled_from(list("abcdefg hij")), min_size=0, max_size=240
    ),
    modulus=st.sampled_from([8, 16, 32]),
)
@_FAST
def test_cdc_chunks_reassemble_any_text(spark, text, modulus):
    """CDC chunking is a partition of the document for ANY input: chunks
    concatenate back to the text, starts/lengths are consistent, and the
    poly and expression modes both hold the invariant."""
    from amanogawa_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    for mode in ("xxhash64", "poly"):
        rows = sorted(
            cdc_chunks(df, modulus=modulus, hash=mode).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert "".join(r["chunk_text"] for r in rows) == text
        pos = 0
        for r in rows:
            assert r["chunk_start"] == pos
            assert r["chunk_len"] == len(r["chunk_text"])
            pos += r["chunk_len"]


@given(
    weights=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.integers(min_value=1, max_value=40),
        min_size=1,
        max_size=5,
    ),
    budget=st.integers(min_value=1, max_value=500),
)
@_FAST
def test_crawl_budget_conservation_any_weights(spark, weights, budget):
    """Largest-remainder quotas always sum exactly to the budget and stay
    within 1 of the proportional share, whatever the mass distribution."""
    from amanogawa_spark.graph.frontier import crawl_budget

    rows = [(h, m) for h, m in sorted(weights.items())]
    total = sum(m for _, m in rows)
    df = spark.createDataFrame(rows, "host string, mass long")
    got = {r["host"]: r["quota"] for r in crawl_budget(df, budget).collect()}
    assert sum(got.values()) == budget
    for h, m in rows:
        share = m / total * budget
        assert share - 1 < got[h] < share + 1


@given(
    a=st.text(alphabet=st.sampled_from(list("xyz w")), min_size=30, max_size=60),
    b=st.text(alphabet=st.sampled_from(list("pqr v")), min_size=30, max_size=60),
    shared=st.text(
        alphabet=st.sampled_from(list("klmno ")), min_size=14, max_size=30
    ),
)
@_FAST
def test_winnow_guarantee_any_shared_substring(spark, a, b, shared):
    """Any two docs sharing a substring of length >= w + k - 1 (= 11 at
    k=8, w=4) share at least one winnowed fingerprint."""
    from amanogawa_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(0, a + shared), (1, shared + b)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, k=8, w=4).collect()
    f0 = {r["fp"] for r in fps if r["doc_id"] == 0}
    f1 = {r["fp"] for r in fps if r["doc_id"] == 1}
    assert f0 & f1
