"""AQE toggling for iterative driver loops.

Adaptive Query Execution re-plans at every exchange by materializing
query stages — one extra scheduling barrier per shuffle per iteration.
The PageRank-shaped loops pin their physical plans deliberately:
partitioning is fixed once and reused from cache, the O(V)-side joins
carry explicit ``shuffle_hash`` hints, and partial aggregation already
collapses hub fan-in map-side — so runtime re-planning has nothing left
to improve and only adds latency.

Measured on the bench corpus (10k pages, 33k edges, local[32]), per
algorithm, before deciding scope:

- PageRank to 1e-6 (41 iters): 72.7 s AQE-on vs 23.8 s off
  (1.77 → 0.58 s/iteration) → **wrapped** (pagerank + personalized).
- connected components: 11.4 s vs 11.4 s → left on default AQE (its
  rounds are union/distinct-heavy; stage coalescing pays for itself).
- LPA 5 rounds: 17.8 s vs 16.0 s; HITS 10 iters: 32.2 s vs 29.3 s —
  both within the host variance band → left on default AQE.

At 10^12-edge scale per-iteration compute dominates and this matters
less; conversely AQE's skew-join splitting can be worth the barriers if
a graph's residual hub skew defeats the salting/partial-agg story — so
every loop exposes ``adaptive=True`` to opt back in.

The Spark conf is session-scoped: a concurrent query on another thread
of the SAME session during the loop would also run without AQE. The
previous value is always restored on exit (including on error).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_KEY = "spark.sql.adaptive.enabled"


@contextmanager
def iteration_conf(spark: SparkSession, disable_aqe: bool = True):
    if not disable_aqe:
        yield
        return
    prev = spark.conf.get(_KEY, "true")
    spark.conf.set(_KEY, "false")
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)
