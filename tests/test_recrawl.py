"""Change-rate estimation + revisit scheduling — hand-computed oracles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from amanogawa_spark.operators.recrawl import change_rates, revisit_schedule

DAY = 86400


def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, F.lit(None), f) for u, _, f in rows][:0] or rows,
        "url string, es long, fp string",
    ).select("url", F.timestamp_seconds("es").alias("ts"), "fp")


def test_estimator_hand_case(spark):
    # 4 daily observations, fp flips at obs 1 and 3 -> m=3 intervals, X=2
    rows = [
        ("a", 0 * DAY, "f0"),
        ("a", 1 * DAY, "f1"),
        ("a", 2 * DAY, "f1"),
        ("a", 3 * DAY, "f2"),
    ]
    got = change_rates(_hist(spark, rows)).collect()[0]
    assert got["n_obs"] == 4 and got["n_changes"] == 2
    assert got["interval_days"] == 1.0
    expect = -math.log((3 - 2 + 0.5) / (3 + 0.5))  # per 1-day interval
    assert abs(got["lambda_day"] - expect) < 1e-8


def test_estimator_all_changes_finite_and_zero_changes(spark):
    rows = [("b", i * DAY, f"v{i}") for i in range(5)]  # changes every fetch
    rows += [("c", i * 2 * DAY, "same") for i in range(5)]  # never changes
    got = {r["url"]: r for r in change_rates(_hist(spark, rows)).collect()}
    # X = m: the naive X/m estimator is infinite-rate-biased; corrected
    # form stays finite
    assert got["b"]["lambda_day"] == round(-math.log(0.5 / 4.5), 8)
    assert got["c"]["n_changes"] == 0
    assert got["c"]["lambda_day"] == round(-math.log(4.5 / 4.5) / 2, 8) == 0.0
    assert got["c"]["interval_days"] == 2.0


def test_single_observation_null_rate(spark):
    got = change_rates(_hist(spark, [("solo", 0, "x")])).collect()[0]
    assert got["n_obs"] == 1
    assert got["interval_days"] is None and got["lambda_day"] is None


def test_out_of_order_history_is_sorted_by_ts(spark):
    rows = [("a", 2 * DAY, "f1"), ("a", 0 * DAY, "f0"), ("a", 1 * DAY, "f1")]
    got = change_rates(_hist(spark, rows)).collect()[0]
    assert got["n_changes"] == 1  # f0->f1 once; shuffled input order irrelevant


def test_schedule_budget_math_and_defaults(spark):
    rates = spark.createDataFrame(
        [("hot", 1.0), ("cold", 0.001), ("new", None)],
        "url string, lambda_day double",
    )
    got = {
        r["url"]: r
        for r in revisit_schedule(rates, period_days=7.0, budget=10).collect()
    }
    p_hot = 1 - math.exp(-7.0)
    p_cold = 1 - math.exp(-0.007)
    p_new = 1 - math.exp(-0.05 * 7)  # default_lambda_day cold-start prior
    tot = p_hot + p_cold + p_new
    assert abs(got["hot"]["p_change"] - p_hot) < 1e-8
    assert abs(got["new"]["p_change"] - p_new) < 1e-8  # NOT frozen out
    assert abs(got["hot"]["interval_days"] - 7.0 * tot / (10 * p_hot)) < 1e-8
    # cold page's proportional interval (7*tot/(10*p_cold) ~ 134 days) is
    # inside the clamp; a tighter max clips it
    assert abs(got["cold"]["interval_days"] - 7.0 * tot / (10 * p_cold)) < 1e-8
    clipped = revisit_schedule(
        rates, period_days=7.0, budget=10, max_interval_days=30.0
    ).collect()
    assert {r["url"]: r["interval_days"] for r in clipped}["cold"] == 30.0


def test_schedule_rank_weighting(spark):
    rates = spark.createDataFrame(
        [("a", 0.5, 10.0), ("b", 0.5, 1.0)],
        "url string, lambda_day double, rank double",
    )
    got = {
        r["url"]: r
        for r in revisit_schedule(
            rates, rank_col="rank", period_days=7.0, budget=10
        ).collect()
    }
    # same p_change, 10x rank -> 10x weight -> 10x shorter interval
    assert abs(got["a"]["weight"] / got["b"]["weight"] - 10.0) < 1e-6
    assert abs(got["b"]["interval_days"] / got["a"]["interval_days"] - 10.0) < 1e-6


def test_schedule_no_budget_uses_freshness_form(spark):
    rates = spark.createDataFrame(
        [("a", 0.2)], "url string, lambda_day double"
    )
    got = revisit_schedule(rates, period_days=7.0, budget=None).collect()[0]
    p = 1 - math.exp(-0.2 * 7)
    assert abs(got["interval_days"] - 7.0 * (1 - p)) < 1e-8


def test_repartition_invariance(spark):
    rows = [(f"u{k}", i * DAY * (1 + k % 3), f"f{i // (1 + k % 2)}") for k in range(40) for i in range(5)]
    h = _hist(spark, rows)
    a = change_rates(h).orderBy("url").collect()
    b = change_rates(h.repartition(7)).orderBy("url").collect()
    assert a == b
