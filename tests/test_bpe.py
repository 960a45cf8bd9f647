"""BPE training/encoding (operators/bpe.py) vs the pure-Python mirror."""

from __future__ import annotations

from amanogawa_spark.operators.bpe import (
    _merge_pass,
    bpe_encode,
    bpe_reference_train,
    bpe_train,
    sample_vocab,
    word_vocab,
)

DOCS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "wider wider new new"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _word_counts():
    wc: dict[str, int] = {}
    for _, t in DOCS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_merge_pass_left_to_right_nonoverlapping():
    assert _merge_pass(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_pass(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _merge_pass(["x"], "a", "b") == ["x"]
    assert _merge_pass([], "a", "b") == []


def test_bpe_train_matches_reference(spark):
    got = bpe_train(_docs_df(spark), num_merges=8)
    want = bpe_reference_train(_word_counts(), num_merges=8)
    assert got == want
    assert len(got) >= 4  # the classic corpus yields several merges


def test_bpe_train_repartition_invariant(spark):
    a = bpe_train(_docs_df(spark), num_merges=5)
    b = bpe_train(_docs_df(spark).repartition(7), num_merges=5)
    assert a == b


def test_bpe_encode_round_trip_and_counts(spark):
    merges = bpe_train(_docs_df(spark), num_merges=8)
    enc = {r["id"]: list(r["tokens"]) for r in bpe_encode(_docs_df(spark), merges).collect()}
    # concatenating tokens reconstructs the normalized text
    for did, text in DOCS:
        assert "".join(enc[did]) == text.replace(" ", "")
    # training merges compress: fewer tokens than characters
    assert all(len(toks) < sum(len(w) for w in t.split()) for (did, t), toks in
               zip(DOCS, (enc[d] for d, _ in DOCS)))
    # empty merge list = character tokens
    chars = {r["id"]: list(r["tokens"]) for r in bpe_encode(_docs_df(spark), []).collect()}
    assert chars[0] == list("low" * 5)


def test_bpe_encode_null_and_empty(spark):
    df = spark.createDataFrame([(0, None), (1, "  "), (2, "ab")], ["doc_id", "text"])
    rows = {r["id"]: (list(r["tokens"]), r["n_tokens"]) for r in bpe_encode(df, [("a", "b")]).collect()}
    assert rows[0] == ([], 0)
    assert rows[1] == ([], 0)
    assert rows[2] == (["ab"], 1)


def test_sample_vocab_deterministic_subset(spark):
    vocab = word_vocab(_docs_df(spark))
    s1 = sorted(r["word"] for r in sample_vocab(vocab, 2).collect())
    s2 = sorted(r["word"] for r in sample_vocab(vocab.repartition(5), 2).collect())
    assert s1 == s2
    assert set(s1) <= {r["word"] for r in vocab.collect()}
