"""SCC scale probe: bowtie web graph, FW-BW peel with and without Trim.

Synthesizes the 200k-page bowtie used by BENCH/BASELINE.md §3 (giant core
SCC ~70%, IN/OUT tendril chains, disconnected fringe; xxhash64 vertex ids
— the web-scale id path), then times ``strongly_connected_components``
at ``max_trim=0`` (round-2 behavior) vs the default Trim. Run:

    python tools/scc_probe.py [--pages 200000] [--cpus 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def bowtie_edges(spark, n_pages: int):
    """Deterministic bowtie: ids are xxhash64 of a dense page ordinal.

    - core  (70%): ring (strong connectivity) + ~15 pseudo-random chords
      per vertex (density);
    - IN    (12%): chains of 8 whose last hop enters the core;
    - OUT   (12%): chains of 8 fed from the core;
    - fringe (6%): short disconnected chains.
    """
    n_core = int(n_pages * 0.70)
    n_in = int(n_pages * 0.12)
    n_out = int(n_pages * 0.12)
    core = spark.range(n_core)
    ring = core.select(
        F.col("id").alias("u"), ((F.col("id") + 1) % n_core).alias("v")
    )
    chords = (
        core.select("id", F.explode(F.sequence(F.lit(1), F.lit(15))).alias("j"))
        .select(
            F.col("id").alias("u"),
            (F.abs(F.xxhash64("id", "j")) % n_core).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    in_base = n_core
    chains_in = (
        spark.range(n_in)
        .select((F.col("id") + in_base).alias("u"))
        .select(
            "u",
            F.when(
                (F.col("u") - in_base) % 8 == 7,
                F.abs(F.xxhash64("u")) % n_core,  # chain tail -> core
            ).otherwise(F.col("u") + 1).alias("v"),
        )
    )
    out_base = n_core + n_in
    chains_out = (
        spark.range(n_out)
        .select((F.col("id") + out_base).alias("u"))
        .select(
            F.when(
                (F.col("u") - out_base) % 8 == 0,
                F.abs(F.xxhash64("u", F.lit(1))) % n_core,  # core -> chain head
            ).otherwise(F.col("u") - 1).alias("u2"),
            F.col("u").alias("v"),
        )
        .select(F.col("u2").alias("u"), "v")
    )
    fringe_base = n_core + n_in + n_out
    n_fringe = n_pages - fringe_base
    fringe = (
        spark.range(max(n_fringe - 1, 0))
        .select((F.col("id") + fringe_base).alias("u"))
        .filter((F.col("u") - fringe_base) % 4 != 3)  # chains of 4
        .select("u", (F.col("u") + 1).alias("v"))
    )
    e = ring.unionAll(chords).unionAll(chains_in).unionAll(chains_out).unionAll(fringe)
    # web-scale id path: dense ordinals -> 64-bit hash ids
    return e.select(
        F.xxhash64(F.lit(42), "u").alias("src_id"),
        F.xxhash64(F.lit(42), "v").alias("dst_id"),
    ).distinct()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--skip-notrim", action="store_true")
    args = ap.parse_args()

    from amanogawa_spark.session import get_spark
    from amanogawa_spark.graph.scc import strongly_connected_components

    spark = get_spark(cpus=args.cpus, app_name="scc_probe", shuffle_partitions=args.cpus)
    e = bowtie_edges(spark, args.pages).persist()
    v = (
        e.select(F.col("src_id").alias("id"))
        .unionAll(e.select(F.col("dst_id").alias("id")))
        .distinct()
        .persist()
    )
    n_e, n_v = e.count(), v.count()
    print(f"graph: {n_v} vertices, {n_e} directed edges")

    out = {"n_vertices": n_v, "n_edges": n_e}
    for label, trim in (
        [("trim5", 5)] if args.skip_notrim else [("notrim", 0), ("trim5", 5)]
    ):
        t0 = time.time()
        res = strongly_connected_components(v, e, max_trim=trim)
        top = (
            res.groupBy("scc").count().orderBy(F.desc("count")).limit(3).collect()
        )
        dt = time.time() - t0
        out[label] = {"sec": round(dt, 1), "top_scc_sizes": [r["count"] for r in top]}
        print(f"{label}: {dt:.1f}s top SCCs {[r['count'] for r in top]}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
