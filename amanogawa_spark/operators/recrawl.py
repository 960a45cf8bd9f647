"""Recrawl scheduling: per-URL change-rate estimation + revisit intervals.

A crawler that refetches 10^12 pages uniformly wastes almost all of its
budget: most pages never change, a few change hourly. The standard
structure (Cho & Garcia-Molina, "Estimating Frequency of Change", ACM
TOIT 2003) models page change as a Poisson process and estimates each
URL's rate λ from its observed snapshot history, then allocates the
fetch budget by expected-change mass. The reference engine has no crawl
scheduler (single-shot pipelines, ``core/executor.h:29-72``); this module
is the engine-side addition that makes its graph ingest incremental in
TIME the way ``graph/incremental.py`` makes it incremental in SPACE.

Scale shape: change detection is one window ``lag`` over
(url, ts)-sorted history — a single hash shuffle on url — followed by a
map-side-combined per-url aggregate; the estimator itself is closed-form
per row. Scheduling is one 1-row total-weight aggregate broadcast back
over the rates table. Nothing is driver-side except the O(1) total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SECONDS_PER_DAY = 86400.0


def change_rates(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fp",
    round_to: int = 8,
) -> DataFrame:
    """(url, n_obs, n_changes, interval_days, lambda_day) per URL.

    ``history``: one row per fetch observation — (url, fetch timestamp,
    content fingerprint). Consecutive-fingerprint inequality over the
    ts-ordered history counts detected changes X across m = n_obs - 1
    comparison intervals; the bias-corrected Poisson estimator

        r_hat = -ln((m - X + 0.5) / (m + 0.5))   changes per interval

    (Cho & Garcia-Molina 2003, §4.2 — finite even when X = m, unlike the
    naive X/m) divided by the mean observed interval gives ``lambda_day``
    in changes/day. URLs with a single observation carry NULL rate and
    interval (no comparison possible) so downstream schedulers can route
    them to an explicit cold-start policy instead of silently treating
    them as frozen.
    """
    w = Window.partitionBy(url_col).orderBy(F.col(ts_col).asc())
    steps = history.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        (F.lag(fp_col).over(w) != F.col(fp_col)).cast("int").alias("chg"),
    )
    agg = steps.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum("chg").alias("n_changes"),
        (
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            / F.lit(SECONDS_PER_DAY)
        ).alias("_span_days"),
    )
    m = F.col("n_obs") - 1
    interval = F.when(m > 0, F.col("_span_days") / m)
    r_hat = -F.log((m - F.col("n_changes") + 0.5) / (m + 0.5))
    lam = F.when((m > 0) & (interval > 0), r_hat / interval)
    return agg.select(
        "url",
        "n_obs",
        F.coalesce("n_changes", F.lit(0)).alias("n_changes"),
        F.round(interval, round_to).alias("interval_days"),
        F.round(lam, round_to).alias("lambda_day"),
    )


def revisit_schedule(
    rates: DataFrame,
    rank_col: str | None = None,
    period_days: float = 7.0,
    budget: int | None = None,
    min_interval_days: float = 0.25,
    max_interval_days: float = 365.0,
    default_lambda_day: float = 0.05,
    round_to: int = 8,
) -> DataFrame:
    """(url, p_change, weight, interval_days) — budget-proportional
    revisit intervals by expected-change mass.

    ``p_change = 1 - exp(-lambda_day * period_days)`` is the probability
    the page changed within one period (Poisson); ``weight`` multiplies
    it by ``rank_col`` when given (importance-weighted freshness — a
    stale hub costs more than a stale leaf). With ``budget`` = N fetches
    per period, each URL's real-valued fetch rate is N·w/ΣW and its
    revisit interval ``period_days·ΣW/(N·w)``, clamped to
    [min_interval_days, max_interval_days]; without a budget the
    interval is the rate-optimal ``period_days·(1-p_change)`` shrunk
    toward min as p_change → 1. NULL rates (single-observation URLs)
    take ``default_lambda_day`` — the cold-start prior, NOT zero, so new
    URLs are revisited rather than frozen out.

    Fractional-rate contract (vs integer apportionment): schedulers
    consume intervals, and apportioning N over 10^12 URLs driver-side
    (the :func:`~amanogawa_spark.operators.sampling.mixture_sample`
    trick) only works for small group sets; the interval form needs one
    1-row ΣW broadcast and no collect.
    """
    lam = F.coalesce(F.col("lambda_day"), F.lit(default_lambda_day))
    p = 1.0 - F.exp(-lam * F.lit(period_days))
    wcol = p * F.col(rank_col) if rank_col else p
    base = rates.select(
        "url", p.alias("_p"), wcol.alias("_w"), F.lit(True).alias("_keep")
    )
    if budget is not None:
        tot = base.agg(F.sum("_w").alias("_tot"))
        base = base.join(F.broadcast(tot))
        interval = F.lit(period_days) * F.col("_tot") / (F.lit(float(budget)) * F.col("_w"))
    else:
        interval = F.lit(period_days) * (1.0 - F.col("_p"))
    clamped = F.least(
        F.greatest(interval, F.lit(min_interval_days)), F.lit(max_interval_days)
    )
    return base.select(
        "url",
        F.round("_p", round_to).alias("p_change"),
        F.round("_w", round_to).alias("weight"),
        F.round(clamped, round_to).alias("interval_days"),
    )
