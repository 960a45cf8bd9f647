"""Mixture sampling + DSIR importance resampling properties."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from amanogawa_spark.operators.sampling import (
    _apportion,
    dsir_logratios,
    importance_resample,
    mixture_sample,
)


def test_apportion_exact_total_and_deterministic():
    w = {"en": 0.5, "de": 0.3, "zh": 0.2}
    c = _apportion(w, 101)
    assert sum(c.values()) == 101
    assert c == _apportion(w, 101)
    # proportions within 1 of quota
    for g, p in w.items():
        assert abs(c[g] - 101 * p) < 1.0


def test_mixture_exact_counts_and_invariance(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(
        df, "lang", {"en": 0.6, "de": 0.3, "zh": 0.1}, total=50, key_cols=["doc_id"]
    )
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 30, "de": 15, "zh": 5}
    ids = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df.repartition(13),
            "lang",
            {"en": 0.6, "de": 0.3, "zh": 0.1},
            total=50,
            key_cols=["doc_id"],
        ).collect()
    )
    assert ids == ids2


def test_mixture_rates_drops_unlisted_groups(spark):
    rows = [(i, ["en", "fr"][i % 2]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mixture_sample(df, "lang", {"en": 1.0}, key_cols=["doc_id"]).collect()
    assert all(r["lang"] == "en" for r in out)
    assert len(out) == 100  # rate 1.0 keeps every en row


def test_dsir_separates_target_like_docs(spark):
    """Docs drawn from the target vocabulary must outscore off-target docs."""
    target_text = "alpha beta gamma delta epsilon"
    noise_text = "zork quux blarg frobnicate mumble"
    corpus = [(i, target_text) for i in range(20)] + [
        (100 + i, noise_text) for i in range(20)
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    tdf = spark.createDataFrame([(0, target_text)], "doc_id long, text string")
    scored = {r["id"]: r["logratio"] for r in dsir_logratios(cdf, tdf).collect()}
    assert min(scored[i] for i in range(20)) > max(
        scored[100 + i] for i in range(20)
    )


def test_gumbel_topk_deterministic_and_weight_biased(spark):
    rows = [(i, 5.0 if i < 50 else 0.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in importance_resample(df, 100, "w", ["doc_id"]).collect()
    )
    again = sorted(
        r["doc_id"]
        for r in importance_resample(
            df.repartition(11), 100, "w", ["doc_id"]
        ).collect()
    )
    assert got == again
    # weight 5 vs 0 → exp(5) ≈ 148x more likely; nearly all 50 heavy rows drawn
    heavy = sum(1 for i in got if i < 50)
    assert heavy >= 45


def test_gumbel_key_matches_python_mirror(spark):
    import hashlib

    rows = [(i, float(i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        r["doc_id"]
        for r in importance_resample(df, 25, "w", ["doc_id"], hash="md5").collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        return round(w - math.log(-math.log(u)), 8)

    expect = [i for i, _ in sorted(rows, key=lambda r: (-key(*r), r[0]))[:25]]
    assert got == expect


def test_temperature_rates_properties(spark):
    import pytest

    # skewed corpus: en 800, de 150, zh 50
    rows = [("en",)] * 800 + [("de",)] * 150 + [("zh",)] * 50
    df = spark.createDataFrame(rows, ["lang"])
    from amanogawa_spark.operators.sampling import temperature_rates

    # T=1: natural proportions -> every rate equal (no rebalancing)
    r1 = temperature_rates(df, "lang", temperature=1.0)
    assert len({round(v, 9) for v in r1.values()}) == 1

    # T=2: low-resource groups keep a larger FRACTION of themselves
    r2 = temperature_rates(df, "lang", temperature=2.0)
    assert r2["zh"] > r2["de"] > r2["en"]
    assert max(r2.values()) <= 1.0
    # default scaling: the binding group keeps everything
    assert max(r2.values()) == pytest.approx(1.0)

    # expected kept mixture matches count^(1/T) shares
    counts = {"en": 800, "de": 150, "zh": 50}
    kept = {g: counts[g] * r2[g] for g in counts}
    tot = sum(kept.values())
    powered = {g: (c / 1000) ** 0.5 for g, c in counts.items()}
    psum = sum(powered.values())
    for g in counts:
        assert kept[g] / tot == pytest.approx(powered[g] / psum, rel=1e-9)

    # target_frac scales the whole-corpus expectation
    r3 = temperature_rates(df, "lang", temperature=2.0, target_frac=0.1)
    assert sum(counts[g] * r3[g] for g in counts) / 1000 == pytest.approx(
        0.1, rel=1e-6
    )


def test_mixture_plan_math(spark):
    from amanogawa_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 500), ("c", 1000)],
        "src string, toks long",
    )
    out = {
        r["group"]: r
        for r in mixture_plan(
            df, "src", {"a": 0.5, "b": 0.5}, budget_tokens=1000,
            token_col="toks", max_epochs=2.0,
        ).collect()
    }
    # a: available 200, target 500, cap 400 -> planned 400, deficit 100
    assert out["a"]["target_tokens"] == 500
    assert out["a"]["planned_tokens"] == 400
    assert out["a"]["deficit_tokens"] == 100
    assert out["a"]["epochs_r"] == 2.0
    # b: available 500, target 500 -> satisfied at 1 epoch
    assert out["b"]["planned_tokens"] == 500 and out["b"]["deficit_tokens"] == 0
    # c: not in weights -> target 0
    assert out["c"]["target_tokens"] == 0 and out["c"]["planned_tokens"] == 0


def test_mixture_plan_weights_renormalized(spark):
    from amanogawa_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([("a", 10**6), ("b", 10**6)], "src string, toks long")
    out = {
        r["group"]: r["target_tokens"]
        for r in mixture_plan(
            df, "src", {"a": 2.0, "b": 6.0}, budget_tokens=8000, token_col="toks"
        ).collect()
    }
    assert out == {"a": 2000, "b": 6000}  # weights need not sum to 1
