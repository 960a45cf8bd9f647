"""Distributed PLSA topic modeling via fixed-round EM.

Why a training-data engine wants this: domain/topic balance is a
first-class curation axis — a topic mixture per document feeds
``operators/sampling.py``'s mixture planner the same way a language or
quality label does, and per-topic term tables expose what a crawl slice
is actually about. PLSA (Hofmann '99) is the EM skeleton shared by LDA
without the Dirichlet smoothing — exact, hyperparameter-light, and
expressible as pure DataFrame algebra (LDA's collapsed Gibbs sampler is
sequential by construction; variational LDA adds digammas to the same
join/aggregate shape, so this module IS the scale blueprint for it).

Model: p(w|d) = Σ_t θ(t|d)·φ(w|t). Each EM round:

- E-step: responsibilities r(t|d,w) ∝ θ(t|d)·φ(w|t), normalized over t.
- M-step: θ(t|d) ∝ Σ_w n(d,w)·r, φ(w|t) ∝ Σ_d n(d,w)·r (per-topic
  normalized).

Distributed shape per round (the whole round is 2 hash joins + one
k-fold explode + two map-side-combined aggregates):

- θ and φ ride as ``array<double>`` columns (length k) keyed by doc /
  term — the E-step is ``zip_with`` + ``aggregate`` + ``transform``,
  entirely inside whole-stage codegen, no per-(d,w,t) row until the
  explode;
- the k-fold ``posexplode`` feeds BOTH M-step aggregates; per-doc
  normalizers fall out of the same grouped row (arrays rebuilt with
  ``sort_array(collect_list(struct(t, s)))`` — k elements per key,
  deterministic order);
- per-TOPIC normalizers are a k-row aggregate broadcast back — nothing
  O(V)·O(vocab) ever converges on one node, no driver collect at all;
- init is hash-deterministic (md5 of term:topic), θ uniform — two
  engines produce identical fixed-round trajectories, which is what the
  DuckDB oracle checks; EM's monotone-likelihood property and agreement
  with a numpy mirror are pinned in tests/test_topics.py.

Lineage is truncated per round with eager ``localCheckpoint`` (the
pagerank pattern); float sums are grouped aggregates, so cross-layout
runs agree to ~1e-12 relative (the oracle compares rounded values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, cnt) — whitespace-token counts over lowercased text
    (the engine-portable ``_NORM`` tokenization shared by the LM/TF-IDF
    operators)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.split(norm, " ")).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("id", "term")
        .agg(F.count("*").cast("double").alias("cnt"))
    )


def _init_phi_array(k: int, term_col):
    """array<double> of positive per-(term, topic) hash inits: 1 + (first
    8 md5 hex digits of 'term:t' as int) % 97 — portable to the SQL
    mirror, positive so every responsibility normalizer is > 0. Built
    from k plain expressions, NOT transform(sequence(...)) — an outer
    column captured inside a higher-order-function lambda hits a
    Catalyst attribute-binding bug (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    on Spark 4.1."""
    return F.array(
        *[
            (
                1.0
                + F.conv(
                    F.substring(
                        F.md5(F.concat(term_col, F.lit(f":{t}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 97
            ).cast("double")
            for t in range(k)
        ]
    )


def plsa(
    counts: DataFrame,
    k: int = 4,
    iterations: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """EM over (id, term, cnt). Returns (theta, phi) in long format:
    theta = (id, topic, p) with Σ_topic p = 1 per doc; phi = (term,
    topic, p) with Σ_term p = 1 per topic."""
    counts = counts.select("id", "term", F.col("cnt").cast("double"))
    theta = (
        counts.select("id")
        .distinct()
        .select("id", F.array_repeat(F.lit(1.0 / k), k).alias("th"))
        .localCheckpoint(eager=True)
    )
    terms = counts.select("term").distinct()
    phi = terms.select(
        "term", _init_phi_array(k, terms["term"]).alias("ph")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        j = counts.join(theta, "id").join(phi, "term")
        resp = F.zip_with("th", "ph", lambda a, b: a * b)
        z = F.aggregate(resp, F.lit(0.0), lambda acc, x: acc + x)
        ex = j.select(
            "id",
            "term",
            "cnt",
            F.posexplode(F.transform(resp, lambda x: x / z)).alias("t", "rv"),
        ).select("id", "term", "t", (F.col("cnt") * F.col("rv")).alias("m"))
        # ex feeds BOTH M-step aggregates: cache it (the θ checkpoint
        # below fills the cache, the φ job reads it) instead of a third
        # eager materialization per round
        ex = ex.persist()
        theta = (
            ex.groupBy("id", "t")
            .agg(F.sum("m").alias("s"))
            .groupBy("id")
            .agg(F.sort_array(F.collect_list(F.struct("t", "s"))).alias("l"))
            .select(
                "id",
                F.transform(
                    "l",
                    lambda x: x["s"]
                    / F.aggregate("l", F.lit(0.0), lambda acc, y: acc + y["s"]),
                ).alias("th"),
            )
            .localCheckpoint(eager=True)
        )
        psums = ex.groupBy("term", "t").agg(F.sum("m").alias("s"))
        ptot = psums.groupBy("t").agg(F.sum("s").alias("tot"))
        phi = (
            psums.join(F.broadcast(ptot), "t")
            .select("term", "t", (F.col("s") / F.col("tot")).alias("p"))
            .groupBy("term")
            .agg(F.sort_array(F.collect_list(F.struct("t", "p"))).alias("l"))
            .select(
                "term", F.transform("l", lambda x: x["p"]).alias("ph")
            )
            .localCheckpoint(eager=True)
        )
        ex.unpersist()
    theta_long = theta.select(
        "id", F.posexplode("th").alias("topic", "p")
    )
    phi_long = phi.select("term", F.posexplode("ph").alias("topic", "p"))
    return theta_long, phi_long


def top_topic_terms(phi_long: DataFrame, n: int = 5) -> DataFrame:
    """(topic, term, p, rank) — top-n terms per topic under the
    deterministic order (p desc, term asc); bounded window over the
    vocab-sized phi table."""
    from pyspark.sql import Window

    w = Window.partitionBy("topic").orderBy(F.desc("p"), F.asc("term"))
    return (
        phi_long.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("topic", "term", "p", "rank")
    )


def perplexity(counts: DataFrame, theta_long: DataFrame, phi_long: DataFrame) -> float:
    """Corpus perplexity exp(−LL/N) under the PLSA model — the
    convergence/quality scalar (EM guarantees it is non-increasing per
    round). One join pass + one aggregate; returns a driver float."""
    # expand only the OBSERVED (id, term) pairs by k — nnz·k rows, never
    # the |docs|×|vocab| dense product
    mix = (
        counts.join(theta_long.select("id", "topic", F.col("p").alias("pt")), "id")
        .join(phi_long.select("term", "topic", F.col("p").alias("pw")), ["term", "topic"])
        .groupBy("id", "term", "cnt")
        .agg(F.sum(F.col("pt") * F.col("pw")).alias("pwd"))
    )
    row = (
        mix.agg(
            F.sum(F.col("cnt") * F.log(F.col("pwd"))).alias("ll"),
            F.sum("cnt").alias("n"),
        )
        .collect()[0]
    )
    import math

    return math.exp(-row["ll"] / row["n"])
