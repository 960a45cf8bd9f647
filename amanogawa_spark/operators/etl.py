"""ETL parity operators mirroring the reference's plugin set.

- :func:`row_filter` — the reference declares ``flow.filter`` but ships a
  pass-through stub (``plugin/flow/filter/filter.cpp:19-28``); its intended
  op set lives in the predicate kernels (``include/util.h:110-161``):
  ``== != > < >= <=`` for numerics and ``== != contains !contains`` for
  strings. Implemented here for real as Catalyst expressions, so the
  predicate pushes down to the parquet scan.
- :func:`branch_columns` — ``branch.column`` named projections
  (``plugin/branch/column/column.cpp:26-48``). Catalyst column pruning
  makes each branch read only its columns.
- :func:`key_join` — ``confluence.key`` inner equi-join semantics
  (``plugin/confluence/key/key.cpp:17-134``): one key per side, output =
  all left columns + right columns minus the right key, left key name
  kept, duplicate keys fan out. The reference nested-loops O(|L|·|R|);
  here Catalyst picks broadcast-hash / shuffled-hash / sort-merge, and
  the reference's "let left be smaller" intent (``key.cpp:132``) maps to
  an optional broadcast hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_OPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
}
_STRING_OPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "contains": lambda c, v: c.contains(v),
    "!contains": lambda c, v: ~c.contains(v),
}


def filter_predicate(key: str, op: str, cond) -> Column:
    """Build the reference predicate {key, op, cond} as a Catalyst Column.

    Note the reference kernels return the *negated* predicate (true means
    "skip the row", ``json.cpp:76-90``); this returns the positive
    keep-the-row form, matching the declared config semantics.
    """
    col = F.col(key)
    ops = _STRING_OPS if isinstance(cond, str) and op in ("contains", "!contains") else {
        **_NUMERIC_OPS,
        **_STRING_OPS,
    }
    if op not in ops:
        raise ValueError(f"unsupported filter op: {op!r}")
    return ops[op](col, cond)


def row_filter(df: DataFrame, key: str, op: str, cond) -> DataFrame:
    return df.filter(filter_predicate(key, op, cond))


def branch_columns(df: DataFrame, branches: dict[str, list[str]]) -> dict[str, DataFrame]:
    """One input → N named column projections (zero-copy in Catalyst)."""
    return {name: df.select(*cols) for name, cols in branches.items()}


def key_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    broadcast_left: bool = False,
    broadcast_right: bool = False,
) -> DataFrame:
    """Inner equi-join, right key dropped, left key name kept (key.cpp:22-31)."""
    lhs = F.broadcast(left) if broadcast_left else left
    rhs = F.broadcast(right) if broadcast_right else right
    joined = lhs.join(rhs, lhs[left_key] == rhs[right_key], "inner")
    out_cols = [lhs[c] for c in left.columns] + [
        rhs[c] for c in right.columns if c != right_key
    ]
    return joined.select(*out_cols)


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the newest row per key — recrawl dedup, the first step of any
    Common-Crawl-style ingest (a url recrawled N times must contribute ONE
    version to the vertex dictionary, or the graph double-counts pages).

    Deterministic: ties on ``order_col`` break by ``tiebreak_cols``
    ascending (pass the natural unique key). One hash shuffle; the
    bounded top-1 window prunes losers inside the partial sort, so a
    url recrawled 10^4 times still moves one surviving row downstream.
    """
    from pyspark.sql.window import Window

    order = [F.desc(order_col)] + [
        F.asc(c) for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
