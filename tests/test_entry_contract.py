"""Driver-contract smoke: entry() runs on sf0.001, queries() are callable."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "pr_value"}
    total = sum(r.pr_value for r in rows)
    assert abs(total - 1.0) < 1e-3  # rank mass ~1 (rounding at 8dp)


def test_queries_oracle_keys_consistent():
    import __spark_entry__ as m

    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 25
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # round 2: EVERY query is value-checked (the round-1 rows-only set was
    # converted via md5-portable hashing / recursive CTEs / exact mirrors)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), f"queries without a value oracle: {sorted(rows_only)}"
