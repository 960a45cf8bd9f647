"""C4/Gopher quality filters: known-text value checks."""

from __future__ import annotations

from amanogawa_spark.operators.quality import (
    c4_line_filter,
    redact_pii,
    repetition_features,
)


def test_repetition_features_known(spark):
    text = "Buy now\nBuy now\nA real sentence here.\nbuy NOW \nAnother one."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = repetition_features(df).collect()[0]
    # normalized 'buy now' x3 of 5 lines
    assert r.n_lines == 5
    assert abs(r.dup_line_frac - 3 / 5) < 1e-12
    assert abs(r.top_line_frac - 3 / 5) < 1e-12


def test_c4_line_filter_known(spark):
    text = "menu\nThis line stays here.\nshort.\nNo punctuation line\nAlso kept for sure!"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = c4_line_filter(df).collect()[0]
    assert r.clean_text == "This line stays here.\nAlso kept for sure!"
    assert r.n_kept == 2 and r.n_dropped == 3
    # trailing digits must survive trimming (regression: F.trim arity bug)
    df2 = spark.createDataFrame(
        [(2, "Version two point 5.")], "doc_id long, text string"
    )
    assert c4_line_filter(df2).collect()[0].clean_text == "Version two point 5."


def test_redact_pii_known(spark):
    text = "Mail a.b@test.org or x@y.io, call +1 555 123 4567 today."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    assert r.n_emails == 2 and r.n_phones == 1
    assert "[EMAIL]" in r.redacted and "[PHONE]" in r.redacted
    assert "test.org" not in r.redacted and "555" not in r.redacted


def test_hll_accuracy_and_merge(spark):
    """Estimate within ~5% at 20k distinct (p=12 → ~1.6% std err); merging
    two shard sketches equals sketching the union."""
    from pyspark.sql import functions as F

    from amanogawa_spark.operators.sketch import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.range(0, 20_000).select(F.col("id"))
    est = hll_distinct(df, "id").collect()[0].estimate
    assert abs(est - 20_000) / 20_000 < 0.05
    # shard merge: [0,12k) ∪ [8k,20k) (overlapping) == full sketch
    a = hll_registers(df.filter(F.col("id") < 12_000), "id")
    b = hll_registers(df.filter(F.col("id") >= 8_000), "id")
    merged = hll_merge(a, b)
    full = {(r.bucket, r.rho) for r in hll_registers(df, "id").collect()}
    assert {(r.bucket, r.rho) for r in merged.collect()} == full
    est_m = hll_estimate(merged).collect()[0].estimate
    assert est_m == est


def test_cms_never_undercounts_and_merges(spark):
    """Point estimates are upper bounds that equal true counts when
    collisions are absent; shard merge == full sketch."""
    from pyspark.sql import functions as F

    from amanogawa_spark.operators.sketch import cms_merge, cms_query, cms_registers

    # skewed frequencies: value v appears v+1 times, v in 0..49
    rows = [(v,) for v in range(50) for _ in range(v + 1)]
    df = spark.createDataFrame(rows, "v long")
    regs = cms_registers(df, "v", d=4, w=2048)
    items = df.select("v").distinct()
    est = {r.v: r.est for r in cms_query(regs, items, "v", d=4, w=2048).collect()}
    for v in range(50):
        assert est[v] >= v + 1  # CMS never undercounts
    # with w=2048 and 50 keys collisions are essentially absent in >=1 row
    assert sum(1 for v in range(50) if est[v] == v + 1) >= 48
    a = cms_registers(df.filter(F.col("v") < 25), "v", d=4, w=2048)
    b = cms_registers(df.filter(F.col("v") >= 25), "v", d=4, w=2048)
    merged = {(r.row, r.bucket): r.cnt for r in cms_merge(a, b).collect()}
    full = {(r.row, r.bucket): r.cnt for r in regs.collect()}
    assert merged == full


def test_contamination_flags_known(spark):
    from amanogawa_spark.operators.dedup import contamination_flags

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "a completely different sentence with no overlap at all"),
            (2, "we note the quick brown fox jumps over the fence"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "quick brown fox jumps over the lazy")], "bid long, text string"
    )
    got = {r.id: (r.n_hits, r.contaminated) for r in contamination_flags(docs, bench, n=5).collect()}
    assert got[0][1] is True and got[0][0] >= 1  # shares 5-grams
    assert got[1] == (0, False)
    assert got[2][1] is True  # 'quick brown fox jumps over' present


def test_unigram_lm_scores_rank_gibberish_lower(spark):
    """Common-word docs must outscore a rare-token doc; values match a
    handwritten Laplace model."""
    import math

    from amanogawa_spark.operators.bow import unigram_logprob_scores

    docs = [
        (0, "the cat sat"),
        (1, "the cat ran"),
        (2, "zq xv jk"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.id: (r.n_tokens, r.avg_logprob) for r in unigram_logprob_scores(df).collect()}
    tf = {"the": 2, "cat": 2, "sat": 1, "ran": 1, "zq": 1, "xv": 1, "jk": 1}
    T, V = sum(tf.values()), len(tf)

    def lp(t):
        return math.log((tf[t] + 1) / (T + V))

    exp0 = (lp("the") + lp("cat") + lp("sat")) / 3
    assert got[0][0] == 3 and abs(got[0][1] - exp0) < 1e-12
    assert got[2][1] < got[0][1] and got[2][1] < got[1][1]


def test_readability_scores_hand_mirror(spark):
    from amanogawa_spark.operators.quality import readability_scores

    docs = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran! Did it?"),
            (1, "unbroken words without terminal punctuation here"),
            (2, "Strengths crypt tsk"),  # consonant-heavy: min-1 syllable floor
            (3, None),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: r
        for r in readability_scores(docs).collect()
    }
    assert set(got) == {0, 1, 2}

    import re

    def syl(w):
        return max(len(re.findall(r"[aeiouy]+", w)), 1)

    def mirror(text):
        ns = max(sum(1 for s in re.split(r"[.!?]+", text) if s.strip()), 1)
        ws = [w for w in re.sub(r"\s+", " ", text.strip()).lower().split(" ") if w]
        nw, nsyl = len(ws), sum(syl(w) for w in ws)
        fl = 206.835 - 1.015 * (nw / ns) - 84.6 * (nsyl / nw)
        fk = 0.39 * (nw / ns) + 11.8 * (nsyl / nw) - 15.59
        return ns, nw, nsyl, round(fl, 6), round(fk, 6)

    for i, text in [(0, "The cat sat. The dog ran! Did it?"),
                    (1, "unbroken words without terminal punctuation here"),
                    (2, "Strengths crypt tsk")]:
        ns, nw, nsyl, fl, fk = mirror(text)
        r = got[i]
        assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (ns, nw, nsyl)
        assert r["flesch"] == fl and r["fk_grade"] == fk
    # doc 0: 3 sentences; doc 2: strengths=1 run, crypt=1 ('y'), tsk floors at 1
    assert got[0]["n_sentences"] == 3
    assert got[2]["n_syllables"] == 3
