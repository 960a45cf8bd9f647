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


def test_local_merge_loop_mirrors_reference_exactly():
    """The incremental driver-local loop == the full-recount reference on
    every prefix (same counts, same tie-breaks)."""
    from amanogawa_spark.operators.bpe import bpe_merge_loop_local

    wc = _word_counts()
    for n in (1, 3, 8, 50):
        assert bpe_merge_loop_local(wc, n) == bpe_reference_train(wc, n)


def test_local_merge_loop_mirrors_reference_random_corpus():
    import random

    from amanogawa_spark.operators.bpe import bpe_merge_loop_local

    rng = random.Random(11)
    alphabet = "abcdef"
    wc = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9))): rng.randint(1, 40)
        for _ in range(300)
    }
    assert bpe_merge_loop_local(wc, 120) == bpe_reference_train(wc, 120)


def test_bpe_train_local_matches_distributed(spark):
    from amanogawa_spark.operators.bpe import bpe_train_local

    got = bpe_train_local(_docs_df(spark), num_merges=8)
    want = bpe_train(_docs_df(spark), num_merges=8)
    assert got == want


def test_bpe_train_local_32k_merges_fast():
    """32k merges over a synthetic 20k-word vocabulary in seconds — the
    scale shape the distributed per-merge loop cannot reach."""
    import random
    import time

    from amanogawa_spark.operators.bpe import bpe_merge_loop_local

    rng = random.Random(3)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    wc = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 14))): rng.randint(1, 1000)
        for _ in range(20_000)
    }
    t0 = time.time()
    merges = bpe_merge_loop_local(wc, 32_000, min_pair_count=1)
    dt = time.time() - t0
    assert len(merges) > 5_000  # vocabulary yields many thousand merges
    assert dt < 120, f"local merge loop too slow: {dt:.1f}s"


def test_tokenizer_fertility_hand_mirror(spark):
    from amanogawa_spark.operators.bpe import tokenizer_fertility

    docs = spark.createDataFrame(
        [
            (0, "en", "spar spar ar"),
            (1, "en", "par"),
            (2, "ja", "sp sp sp"),
        ],
        ["doc_id", "lang", "text"],
    )
    merges = [("s", "p"), ("sp", "a"), ("a", "r")]
    got = {r["lang"]: tuple(r)[1:] for r in tokenizer_fertility(docs, merges, group_col="lang").collect()}
    # en: "spar" -> [spa, r] (2 subwords) x2 words, "ar" -> [ar] (1), "par" -> [p, ar] (2)
    #     words=4, tokens=2+2+1+2=7, chars=4+4+2+3=13
    assert got["en"][:3] == (4, 7, 13)
    assert abs(got["en"][3] - round(7 / 4, 8)) < 1e-9
    assert abs(got["en"][4] - round(13 / 7, 8)) < 1e-9
    # ja: "sp" -> [sp] once per word: words=3, tokens=3, chars=6
    assert got["ja"][:3] == (3, 3, 6)
    # corpus-level (no group): one row labelled 'all'
    allrow = tokenizer_fertility(docs, merges).collect()
    assert len(allrow) == 1 and allrow[0]["grp"] == "all"
    assert allrow[0]["n_words"] == 7 and allrow[0]["n_tokens"] == 10
