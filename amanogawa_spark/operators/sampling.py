"""Deterministic sampling for training-data curation.

Real corpus pipelines need reproducible subsets: "n docs per language",
"1% of pages per domain" — stable across reruns, partitionings, and
cluster sizes, so downstream training sees the identical corpus. Both
operators order rows by a pure per-row hash instead of RNG state:

- :func:`stratified_sample` — exactly n rows per group (top-n by hash
  inside each group; one hash shuffle + window, the bounded-k pattern).
- :func:`hash_sample` — keep each row independently with probability p
  (a filter — no shuffle at all; the per-row coin is the same trick as
  DOULION edge sampling in ``graph/triangles.py``).

``hash='md5'`` makes either engine-portable (DuckDB computes the same
hex), which is how the oracle queries value-check the sampled sets;
'xxhash64' is the cheaper JVM-codegen default for production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _row_hash(cols: list[str], hash: str, seed: int) -> Column:
    strs = [F.col(c).cast("string") for c in cols]
    if hash == "md5":
        return F.md5(F.encode(F.concat_ws("~", *strs), "UTF-8"))
    return F.xxhash64(*strs, F.lit(seed)).cast("string")


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_cols: list[str],
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order.

    ``key_cols`` must identify a row (e.g. the primary key): the sample is
    then a pure function of the data — repartition/cluster-size invariant.
    The window's top-n short-circuits shuffle volume the same way every
    other bounded-k operator here does (rank > n rows never leave the
    partial sort).
    """
    h = _row_hash(key_cols, hash, seed)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def _coin32(key_cols: list[str], hash: str, seed: int) -> Column:
    """Deterministic 32-bit per-row coin in [0, 2^32)."""
    if hash == "md5":
        strs = [F.col(c).cast("string") for c in key_cols]
        return F.conv(
            F.substring(F.md5(F.encode(F.concat_ws("~", *strs), "UTF-8")), 1, 8),
            16,
            10,
        ).cast("long")
    return F.xxhash64(*key_cols, F.lit(seed)).bitwiseAND(F.lit((1 << 32) - 1))


def hash_sample(
    df: DataFrame,
    p: float,
    key_cols: list[str],
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Bernoulli(p) sample with a deterministic per-row coin — a pure
    filter (no shuffle, pushdown-friendly), reproducible anywhere."""
    return df.filter(_coin32(key_cols, hash, seed) < int(p * (1 << 32)))


def _apportion(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder apportionment of ``total`` by ``weights`` —
    deterministic (remainder desc, group name asc tiebreak), sums to
    ``total`` exactly when weights sum to 1."""
    wsum = sum(weights.values())
    quotas = {g: total * w / wsum for g, w in weights.items()}
    counts = {g: int(q) for g, q in quotas.items()}
    leftover = total - sum(counts.values())
    by_rem = sorted(quotas, key=lambda g: (-(quotas[g] - counts[g]), g))
    for g in by_rem[:leftover]:
        counts[g] += 1
    return counts


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    total: int | None = None,
    key_cols: list[str] | None = None,
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Domain/language mixture control — THE data-mixing primitive for
    training-corpus assembly (rebalance a crawl to target proportions).

    Two modes, both deterministic functions of the data:

    - ``total=None``: ``weights`` are per-group Bernoulli keep RATES
      ("keep 30% of en, 5% of each hub domain") — a zero-shuffle filter,
      the per-group threshold is a literal map lookup. Groups absent
      from ``weights`` are dropped.
    - ``total=N``: ``weights`` are target PROPORTIONS; per-group counts
      come from largest-remainder apportionment of N (driver-side over
      the small weights dict), then exactly min(n_g, |g|) rows per group
      by hash order (one hash shuffle + bounded-k window — same plan as
      :func:`stratified_sample`).

    At 100 TB the rates mode is the default (no shuffle, AQE-free);
    the exact-count mode is for fixed-size eval/calibration sets.
    """
    key_cols = key_cols or [group_col]
    if total is None:
        thresh = F.create_map(
            *[
                lit
                for g, p in sorted(weights.items())
                for lit in (F.lit(g), F.lit(int(p * (1 << 32))))
            ]
        )[F.col(group_col)]
        return df.filter(_coin32(key_cols, hash, seed) < thresh)
    counts = _apportion(weights, total)
    cap = F.create_map(
        *[lit for g, n in sorted(counts.items()) for lit in (F.lit(g), F.lit(n))]
    )[F.col(group_col)]
    h = _row_hash(key_cols, hash, seed)
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def dsir_logratios(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 4096,
    hash: str = "xxhash64",
    tokenizer: str = "whitespace",
) -> DataFrame:
    """(id, n_tokens, logratio) — DSIR-style importance weights.

    Data Selection via Importance Resampling (Xie et al. 2023, public):
    score each corpus document by the mean log-likelihood ratio of a
    TARGET unigram model vs the CORPUS unigram model over hashed token
    buckets (Laplace-smoothed: p(b) = (cnt_b + 1) / (T + B)). Documents
    that look like the target distribution score high; pair with
    :func:`importance_resample` to draw the training subset.

    Scale shape: two map-side-combined aggregates build the two LMs —
    each at most ``num_buckets`` rows, so the per-doc scoring join
    BROADCASTS the ratio table (no shuffle of the corpus beyond its own
    (id, bucket) aggregate). The target set is typically tiny (an eval
    distribution sample); the corpus never materializes pairs.
    """
    from amanogawa_spark.operators.bow import term_counts

    def bucket(term: Column) -> Column:
        if hash == "md5":
            return F.conv(
                F.substring(F.md5(F.encode(term, "UTF-8")), 1, 8), 16, 10
            ).cast("long") % num_buckets
        return F.pmod(F.xxhash64(term), F.lit(num_buckets))

    doc_b = (
        term_counts(corpus, id_col, text_col, tokenizer)
        .select("id", bucket(F.col("term")).alias("b"), "cnt")
        .groupBy("id", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    lm_c = doc_b.groupBy("b").agg(F.sum("cnt").alias("cc"))
    lm_t = (
        term_counts(target, id_col, text_col, tokenizer)
        .select(bucket(F.col("term")).alias("b"), "cnt")
        .groupBy("b")
        .agg(F.sum("cnt").alias("ct"))
    )
    tot_c = lm_c.agg(F.sum("cc").alias("tc"))
    tot_t = lm_t.agg(F.sum("ct").alias("tt"))
    ratios = (
        lm_c.join(lm_t, "b", "full_outer")
        .crossJoin(F.broadcast(tot_c))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0.0)) + 1.0)
                    / (F.col("tt") + F.lit(float(num_buckets)))
                )
                - F.log(
                    (F.coalesce(F.col("cc"), F.lit(0.0)) + 1.0)
                    / (F.col("tc") + F.lit(float(num_buckets)))
                )
            ).alias("logr"),
        )
    )
    return (
        doc_b.join(F.broadcast(ratios), "b")
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            (F.sum(F.col("cnt") * F.col("logr")) / F.sum("cnt")).alias("logratio"),
        )
    )


def importance_resample(
    scored: DataFrame,
    k: int,
    weight_col: str = "logratio",
    key_cols: list[str] | None = None,
    temperature: float = 1.0,
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Gumbel top-k: a deterministic sample of ``k`` rows WITHOUT
    replacement with P(row) ∝ exp(weight/temperature).

    key = w/T + Gumbel(0,1) with the Gumbel noise derived from the
    per-row hash coin (u = (h+0.5)/2^32, g = −log(−log u)) — no RNG
    state, so the drawn subset is identical across partitionings and
    reruns. Global top-k is a bounded TakeOrderedAndProject (k rows per
    partition, then k at the driver) — no full sort, no shuffle of the
    losers. The key is rounded to 8 decimals (with a key-column
    tiebreak) so the selection is stable across engines for the oracle.
    """
    key_cols = key_cols or ["id"]
    u = (_coin32(key_cols, hash, seed) + F.lit(0.5)) / F.lit(float(1 << 32))
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col(weight_col) / temperature + gumbel, 8)
    return (
        scored.withColumn("_gkey", key)
        .orderBy(F.col("_gkey").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
    )


def weighted_reservoir(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str] | None = None,
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, P(row in sample) ∝ weight:
    the Efraimidis–Spirakis A-ES reservoir, deterministic.

    Each row draws u ∈ (0,1) from its hash coin and ranks by
    key = ln(u)/w (equivalent to maximizing u^{1/w}; the classic
    one-pass weighted reservoir). Unlike :func:`importance_resample`
    (Gumbel over exp(weight) — a softmax draw), this samples ∝ the RAW
    weight, the contract for "sample documents proportionally to token
    count / quality score". Rows with w ≤ 0 or NULL can never be drawn
    and are filtered up front (pushdown-friendly).

    Scale shape: no RNG state, no shuffle of losers — the global top-k
    compiles to TakeOrderedAndProject (bounded k rows per partition,
    k·partitions at the driver), identical under any partitioning. The
    key is rounded to 8 decimals with a key-column tiebreak so the drawn
    subset is stable across engines for the value oracle.
    """
    key_cols = key_cols or ["id"]
    w = F.col(weight_col).cast("double")
    u = (_coin32(key_cols, hash, seed) + F.lit(0.5)) / F.lit(float(1 << 32))
    key = F.round(F.log(u) / w, 8)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_rkey", key)
        .orderBy(F.col("_rkey").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(k)
        .drop("_rkey")
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    temperature: float = 2.0,
    target_frac: float | None = None,
) -> dict[str, float]:
    """Per-group keep rates implementing temperature-scaled mixing
    (the multilingual-LM recipe, e.g. mBERT/XLM-R/mT5: sample groups
    ∝ count^(1/T) so low-resource groups are up-weighted relative to
    their raw share; T=1 keeps natural proportions, T→∞ → uniform).

    Returns a rates dict to feed straight into
    ``mixture_sample(df, group_col, rates)``. The group histogram is one
    map-side-combined count (the only data pass); the rate arithmetic is
    driver-side over the small group dict. ``target_frac`` scales the
    rates so the expected kept fraction of the WHOLE corpus is that
    value (rates are capped at 1.0 — a group too small to fill its
    temperature share keeps everything; no upsampling/duplication here).
    """
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g")).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return {}
    total = sum(counts.values())
    powered = {g: (n / total) ** (1.0 / temperature) for g, n in counts.items()}
    psum = sum(powered.values())
    shares = {g: p / psum for g, p in powered.items()}  # target mixture
    frac = target_frac if target_frac is not None else min(
        counts[g] / (shares[g] * total) for g in counts
    )
    # rate_g = (wanted rows in group g) / (available rows in group g)
    return {
        g: min(1.0, shares[g] * total * frac / counts[g]) for g in sorted(counts)
    }


def host_disjoint_split(
    df: DataFrame,
    url_col: str = "url",
    weights: dict[str, float] | None = None,
    hash: str = "xxhash64",
    seed: int = 42,
) -> DataFrame:
    """Append (rdom, split): a leak-free train/valid/test assignment —
    every page of a registered domain lands in the SAME split.

    Random per-PAGE splits leak: mirrors, templated variants, and
    boilerplate-sharing pages within a site straddle the train/eval
    boundary and inflate eval scores. Splitting on the eTLD+1 coin keeps
    whole sites together (the standard web-corpus hygiene rule). The
    assignment is a pure hash of the registered domain — no RNG state,
    stable across reruns, partitionings, and cluster sizes, and a pure
    map-side projection (no shuffle, no dictionary).

    ``weights`` insertion order defines the coin's interval order
    (default {'train': .9, 'valid': .05, 'test': .05}); they must sum
    to ~1. ``hash='md5'`` is the engine-portable flavour the value
    oracle mirrors; xxhash64 is the cheaper JVM default.
    """
    from amanogawa_spark.functions.url import registered_domain

    weights = weights or {"train": 0.90, "valid": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {weights}")
    dom = registered_domain(F.col(url_col))
    if hash == "md5":
        h32 = F.conv(
            F.substring(
                F.md5(F.encode(F.concat_ws("~", F.lit(str(seed)), dom), "UTF-8")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    else:
        h32 = F.xxhash64(F.lit(str(seed)), dom).bitwiseAND(F.lit((1 << 32) - 1))
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    names = list(weights)
    expr = F.lit(names[-1])  # last bucket absorbs the tail
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += weights[name]
        conds.append((cum, name))
    for bound, name in reversed(conds):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("rdom", dom).withColumn("split", expr)

def mixture_plan(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    budget_tokens: int,
    token_col: str,
    max_epochs: float = 1.0,
) -> DataFrame:
    """(group, available_tokens, target_tokens, planned_tokens, epochs_r,
    deficit_tokens) — feasibility math for a target data mixture: given
    per-source token inventories and desired proportions of a token
    budget, how much each source actually yields under an epoch cap.

    target = ⌊w_g/Σw · budget⌋; planned = min(target,
    ⌊max_epochs · available⌋); ``deficit_tokens`` > 0 marks a source the
    plan CANNOT satisfy without raising ``max_epochs`` (the
    over-sampling / repetition trade-off a mixture designer tunes
    before :func:`mixture_sample` executes the draw).

    One map-side-combined token aggregate + literal-map lookups — no
    joins, no collects; sources absent from ``weights`` get target 0.
    """
    total_w = sum(weights.values())
    wmap = F.create_map(
        *[
            lit
            for g, p in sorted(weights.items())
            for lit in (F.lit(g), F.lit(float(p) / total_w))
        ]
    )
    inv = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.col(token_col)).cast("long").alias("available_tokens")
    )
    target = F.floor(
        F.coalesce(wmap[F.col("group")], F.lit(0.0)) * budget_tokens
    ).cast("long")
    cap = F.floor(F.lit(float(max_epochs)) * F.col("available_tokens")).cast(
        "long"
    )
    out = inv.select(
        "group",
        "available_tokens",
        target.alias("target_tokens"),
        F.least(target, cap).alias("planned_tokens"),
    )
    return out.select(
        "group",
        "available_tokens",
        "target_tokens",
        "planned_tokens",
        F.round(
            F.col("planned_tokens") / F.col("available_tokens").cast("double"), 8
        ).alias("epochs_r"),
        (F.col("target_tokens") - F.col("planned_tokens")).alias("deficit_tokens"),
    )
