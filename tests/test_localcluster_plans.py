"""Physical-plan audits for graph/localcluster.py: the sweep's graph-sized
work must touch the edge table via BROADCAST joins against the tiny rank
table (never shuffle the edges on a rank key), and the only windows in the
plan run over the push-bounded support frame."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from amanogawa_spark.graph.localcluster import ppr_sweep_cut
from amanogawa_spark.graph.push import forward_push_ppr


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def cliques(spark):
    pairs = [
        (a, b)
        for grp in ([1, 2, 3, 4], [11, 12, 13, 14])
        for a, b in itertools.permutations(grp, 2)
    ] + [(4, 11), (11, 4)]
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def test_sweep_edge_joins_are_broadcast(spark, cliques):
    seeds = spark.createDataFrame([(1,)], ["id"])
    ppr = forward_push_ppr(cliques, seeds, alpha=0.15, eps=1e-9, fixed_rounds=2)
    df = ppr_sweep_cut(cliques, ppr)
    df.collect()
    plan = _plan(df)
    # both endpoint-rank attaches must be broadcast hash joins; a
    # SortMergeJoin here would shuffle the full edge table on a rank key
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
