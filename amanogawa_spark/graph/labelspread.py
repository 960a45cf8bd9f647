"""Semi-supervised label spreading with clamped seeds.

The web-curation use: a small labeled subset (human-reviewed spam/ham
hosts, high-confidence language IDs, licensed/unlicensed flags)
propagates across the link graph to label the unlabeled mass — links
carry label evidence ("you are what links to you"). Unlike
:mod:`amanogawa_spark.graph.lpa` (every vertex starts self-labeled and
may flip — community detection) the SEED labels here are clamped: a
seed never changes, and unlabeled vertices only ever adopt evidence
that traces back to seeds, so the output is a classification, not a
clustering. Unlike :mod:`amanogawa_spark.graph.trustrank` (scalar mass
from a seed set) this propagates CATEGORICAL labels with majority
voting.

Per round, synchronously: every non-seed vertex adopts the
highest-scoring label among its currently-labeled neighbors (score =
neighbor count, or summed edge weight); ties break to the smallest
label string; vertices with no labeled neighbor stay unlabeled that
round. A non-seed vertex MAY flip between labels across rounds as
deeper evidence arrives (standard iterative label-spreading semantics).

Spark shape per round: one join (neighbor labels onto the symmetrized
pair list), one map-side-combinable ``groupBy(id, label)`` aggregate,
one struct-max argmax (no window — the label VOCABULARY is
dictionary-encoded to dense ints up front, a tiny driver-side sorted
distinct, so "smallest label" inverts numerically exactly like
:mod:`~amanogawa_spark.graph.lpa`), one left join back. All rounds
synchronous; deterministic (no RNG anywhere). At 10^12 vertices the
only driver-side state is the label vocabulary (O(languages) ≈ O(10²)).

Reference parity: no equivalent in the reference (its pipeline ends at
graph emission, ``plugin/flow/to_graph/to_graph.cpp``); engine addition
for the link-graph tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from amanogawa_spark.graph.components import _symmetrize


def label_spreading(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """Returns (id long, label string nullable, is_seed boolean).

    ``vertices``: (id). ``edges``: (src_id, dst_id [, weight]).
    ``seeds``: (id, label string) — clamped; duplicate seed ids resolve
    to the smallest label deterministically. After ``rounds``
    synchronous rounds, ``label`` is NULL for vertices the seed
    evidence never reached (further than ``rounds`` hops from every
    seed).
    """
    if weight_col is not None:
        e = edges.filter(F.col("src_id") != F.col("dst_id"))
        pairs = (
            e.select(
                F.col("src_id").alias("u"),
                F.col("dst_id").alias("v"),
                F.col(weight_col).cast("double").alias("w"),
            )
            .unionAll(
                e.select(
                    F.col("dst_id").alias("u"),
                    F.col("src_id").alias("v"),
                    F.col(weight_col).cast("double").alias("w"),
                )
            )
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
        )
    else:
        pairs = _symmetrize(edges).withColumn("w", F.lit(1.0))
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)

    seed_tbl = (
        seeds.select(F.col("id"), F.col("label").cast("string").alias("label"))
        .groupBy("id")
        .agg(F.min("label").alias("label"))
    )
    # dictionary-encode the label vocabulary (tiny: languages / spam-ham /
    # license classes) so the per-round argmax is a single struct-max with
    # a numeric inversion for the smallest-label tie-break
    vocab = sorted(
        r["label"] for r in seed_tbl.select("label").distinct().collect()
    )
    code_of = {lab: i for i, lab in enumerate(vocab)}
    if vocab:
        enc = F.create_map(
            *[x for lab in vocab for x in (F.lit(lab), F.lit(code_of[lab]))]
        )
        dec = F.create_map(
            *[x for lab in vocab for x in (F.lit(code_of[lab]), F.lit(lab))]
        )
    else:  # no seeds: everything stays NULL
        enc = F.lit(None).cast("int")
        dec = F.lit(None).cast("string")

    state = (
        vertices.select("id")
        .join(seed_tbl, "id", "left")
        .select(
            "id",
            (enc[F.col("label")] if vocab else F.lit(None).cast("int")).alias(
                "code"
            ),
            F.col("label").isNotNull().alias("is_seed"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev = None
    for _r in range(rounds):
        votes = (
            pairs.join(
                state.filter(F.col("code").isNotNull()).select(
                    F.col("id").alias("v"), "code"
                ),
                "v",
            )
            .groupBy(F.col("u").alias("id"), "code")
            .agg(F.sum("w").alias("score"))
        )
        best = (
            votes.groupBy("id")
            .agg(
                F.max(
                    F.struct(F.col("score"), (-F.col("code")).alias("neg"))
                ).alias("m")
            )
            .select("id", (-F.col("m.neg")).cast("int").alias("_new"))
        )
        nxt = (
            state.join(best, "id", "left")
            .select(
                "id",
                F.when(F.col("is_seed"), F.col("code"))
                .otherwise(F.coalesce("_new", "code"))
                .alias("code"),
                "is_seed",
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nxt.count()
        if prev is not None:
            prev.unpersist()
        prev, state = state, nxt
    if prev is not None:
        prev.unpersist()
    pairs.unpersist()
    out = state.select(
        "id",
        (dec[F.col("code")] if vocab else F.lit(None).cast("string")).alias(
            "label"
        ),
        "is_seed",
    )
    return out
