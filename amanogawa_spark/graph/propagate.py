"""GraphSAGE-style neighbor feature aggregation (k-layer propagation).

The preprocessing step every graph-ML training pipeline runs at corpus
scale: layer k replaces each vertex's feature vector with the mean (or
sum) of its neighbors' layer-(k-1) vectors, so after k layers a vertex's
vector summarizes its k-hop neighborhood. On a web graph this turns
per-page embeddings into neighborhood embeddings (link-context features
for quality models, spam detection, topic smoothing) without any
parameter training — it is the aggregation half of GraphSAGE/SGC
("Simplifying Graph Convolutional Networks", Wu et al. 2019: the
propagation S^k X is the whole model).

Spark shape per layer: one equi-join (edges ⋈ features on the source
end) and ONE hash aggregate whose output columns are ``dim`` per-element
``sum(element_at(vec, i))`` expressions plus a neighbor count. This
stays entirely JVM-side WITH map-side partial combine — the alternative
``posexplode`` shape multiplies the shuffled row count by ``dim`` and
loses nothing we need, and a grouped pandas UDF loses partial
aggregation entirely (every raw neighbor vector would cross the wire;
with element aggregates each map task pre-sums its local neighbors, so
at 100 TB the shuffle carries ~|V|·dim partials instead of |E|·dim
rows). For very wide vectors the per-element expression count grows the
plan linearly; ``arrow=True`` switches the aggregate to an
``applyInPandas`` numpy sum with identical output (equality-tested) as
the escape hatch beyond ~2k dims.

Vertices with no (in-scope) neighbors carry their previous vector
forward unchanged, so every input id always has an output vector and
the operator composes across layers with no dropped rows.

Reference parity note: the reference engine has no GNN/propagation
operator (its graph stage ends at kNN-graph emission,
``plugin/flow/to_graph/to_graph.cpp``); this is an engine addition for
the training-data story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def aggregate_neighbor_features(
    edges: DataFrame,
    features: DataFrame,
    *,
    layers: int = 1,
    agg: str = "mean",
    direction: str = "in",
    include_self: bool = False,
    dim: int | None = None,
    arrow: bool = False,
) -> DataFrame:
    """k-layer neighbor aggregation → (id, vec array<double>, n_neighbors).

    ``edges``: (src_id, dst_id). ``features``: (id, vec array<numeric>).
    ``direction``: 'in' — a vertex aggregates the vectors of pages that
    LINK TO it (the natural web-graph direction: a page is described by
    its in-links); 'out' — of pages it links to; 'both' — symmetrized.
    ``include_self``: the vertex's own previous vector joins the mean
    (GCN-style self-loop).
    ``agg``: 'mean' or 'sum'.
    ``n_neighbors`` reports the last layer's aggregated-neighbor count
    (0 for carried-forward isolates; includes the self row when
    ``include_self``).

    Deterministic: no sampling — exact aggregation over all neighbors.
    Hub vertices with 10^7 in-links are ONE group of the hash aggregate
    (partials combine map-side, so no single task sees all of a hub's
    neighbors' raw rows).
    """
    if agg not in ("mean", "sum"):
        raise ValueError(f"agg must be 'mean' or 'sum', got {agg!r}")
    if direction not in ("in", "out", "both"):
        raise ValueError(f"direction must be in/out/both, got {direction!r}")
    if layers < 1:
        raise ValueError("layers must be >= 1")

    if direction == "in":
        pairs = edges.select(F.col("src_id").alias("u"), F.col("dst_id").alias("v"))
    elif direction == "out":
        pairs = edges.select(F.col("dst_id").alias("u"), F.col("src_id").alias("v"))
    else:
        pairs = edges.select(
            F.col("src_id").alias("u"), F.col("dst_id").alias("v")
        ).unionAll(
            edges.select(F.col("dst_id").alias("u"), F.col("src_id").alias("v"))
        ).distinct()
    pairs = pairs.filter(F.col("u") != F.col("v")).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    feats = features.select(
        F.col("id"), F.col("vec").cast("array<double>").alias("vec")
    )
    if dim is None:
        probe = feats.select(F.size("vec").alias("d")).first()
        if probe is None:
            pairs.unpersist()
            return feats.withColumn("n_neighbors", F.lit(0).cast("long"))
        dim = int(probe["d"])

    cur = feats.withColumn("n_neighbors", F.lit(0).cast("long")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    prev = None
    for _layer in range(layers):
        # vectors flowing along u -> v: v aggregates u's current vector
        contrib = pairs.join(
            cur.select(F.col("id").alias("u"), "vec"), "u"
        ).select(F.col("v").alias("id"), "vec")
        if include_self:
            contrib = contrib.unionAll(cur.select("id", "vec"))
        if arrow:
            agged = _sum_vectors_arrow(contrib, dim)
        else:
            agged = contrib.groupBy("id").agg(
                *[
                    F.sum(F.element_at("vec", i + 1)).alias(f"_s{i}")
                    for i in range(dim)
                ],
                F.count(F.lit(1)).alias("_n"),
            )
        denom = F.col("_n") if agg == "mean" else F.lit(1)
        newvec = F.array(
            *[(F.col(f"_s{i}") / denom).alias(f"_e{i}") for i in range(dim)]
        )
        agged = agged.select("id", newvec.alias("_newvec"), "_n")
        nxt = (
            cur.join(agged, "id", "left")
            .select(
                "id",
                F.coalesce("_newvec", "vec").alias("vec"),
                F.coalesce("_n", F.lit(0)).cast("long").alias("n_neighbors"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        nxt.count()  # materialize before releasing the previous layer
        if prev is not None:
            prev.unpersist()
        prev, cur = cur, nxt
    if prev is not None:
        prev.unpersist()
    pairs.unpersist()
    return cur


def _sum_vectors_arrow(contrib: DataFrame, dim: int) -> DataFrame:
    """applyInPandas numpy per-group vector sum — the wide-dim escape
    hatch. Same output columns as the expression aggregate (_s0.._s{dim-1},
    _n). No map-side combine (Spark grouped-pandas limitation), so the
    expression path is the default; this exists for dims where a
    dim-column aggregate plan is impractical."""
    import pandas as pd  # noqa: F401 — schema side

    schema = (
        "id long, "
        + ", ".join(f"_s{i} double" for i in range(dim))
        + ", _n long"
    )

    def summed(pdf):
        import numpy as np
        import pandas as pd

        mat = np.vstack(pdf["vec"].to_numpy())
        s = mat.sum(axis=0)
        row = {"id": [pdf["id"].iloc[0]]}
        for i in range(dim):
            row[f"_s{i}"] = [float(s[i])]
        row["_n"] = [len(pdf)]
        return pd.DataFrame(row)

    return contrib.groupBy("id").applyInPandas(summed, schema=schema)


def sample_neighbors(
    edges: DataFrame,
    roots: DataFrame,
    fanouts: list[int],
    direction: str = "out",
    hash: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """(root_id, hop, src_id, dst_id): bounded-fanout k-hop sampled
    neighborhoods — the GraphSAGE minibatch block builder (Hamilton et
    al. 2017 §3.1: cap each node's neighborhood at a fixed fanout per
    layer so a minibatch's receptive field is O(Π fanouts), not
    O(deg^k) — on a web graph an unsampled 2-hop neighborhood of a hub
    is the whole graph).

    ``roots``: (id) — the minibatch seed nodes. ``fanouts``: per-hop
    caps, e.g. [10, 5]. Hop h's sampled edges are (src=frontier node,
    dst=sampled neighbor); a node reached by several paths within one
    root's block is expanded once per (root, node). Sampling is
    hash-deterministic (no RNG state — reruns, repartitionings, and,
    with ``hash='md5'``, the DuckDB oracle agree): neighbor v of node u
    in root r's block at hop h ranks by hash(r, u, h, v), keep the
    first ``fanouts[h-1]``.

    Spark shape per hop: one equi-join (frontier ⋈ edges) + one
    window top-k partitioned by (root, node) — groups are single-node
    neighborhoods, so the window parallelizes across the frontier; the
    frontier never exceeds |roots|·Π fanouts rows. No collect, no
    per-root driver loop.
    """
    if direction not in ("out", "in"):
        raise ValueError(f"direction must be out/in, got {direction!r}")
    if not fanouts:
        raise ValueError("fanouts must name at least one hop, e.g. [10, 5]")
    from pyspark.sql.window import Window

    if direction == "out":
        pairs = edges.select(F.col("src_id").alias("_u"), F.col("dst_id").alias("_v"))
    else:
        pairs = edges.select(F.col("dst_id").alias("_u"), F.col("src_id").alias("_v"))
    pairs = pairs.filter(F.col("_u") != F.col("_v"))

    frontier = roots.select(
        F.col("id").alias("root_id"), F.col("id").alias("_u")
    ).distinct()
    hops = []
    cached = []
    for h, f in enumerate(fanouts, start=1):
        if hash == "md5":
            score = F.md5(
                F.encode(
                    F.concat_ws(
                        "~",
                        F.col("root_id").cast("string"),
                        F.col("_u").cast("string"),
                        F.lit(str(h)),
                        F.col("_v").cast("string"),
                    ),
                    "UTF-8",
                )
            )
        else:
            score = F.xxhash64(
                "root_id", "_u", F.lit(h), "_v", F.lit(seed)
            ).cast("string")
        w = (
            Window.partitionBy("root_id", "_u")
            .orderBy(score.asc(), F.col("_v").asc())
        )
        samp = (
            frontier.join(pairs, "_u")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= f)
            .select(
                "root_id",
                F.lit(h).cast("int").alias("hop"),
                F.col("_u").alias("src_id"),
                F.col("_v").alias("dst_id"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cached.append(samp)
        hops.append(samp)
        frontier = samp.select(
            "root_id", F.col("dst_id").alias("_u")
        ).distinct()
    out = hops[0]
    for hdf in hops[1:]:
        out = out.unionAll(hdf)
    out = out.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    return out
