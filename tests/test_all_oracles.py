"""Full-suite oracle gate: every queries() entry vs its DuckDB oracle.

The correctness driver caps at the first 50 QUERIES entries per round, so
this session re-checks ALL of them (rows + columns + physical dtypes +
order-insensitive values) at sf0.001 — the round-2 judge ran this by hand;
now it runs in CI every round regardless of the driver cap.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_oracles", REPO / "tools" / "check_oracles.py"
)
check_oracles = importlib.util.module_from_spec(_spec)
sys.modules["check_oracles"] = check_oracles
_spec.loader.exec_module(check_oracles)

from amanogawa_spark.oracle_suite import ORACLE_SQL, QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in check_oracles.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", list(QUERIES))
def test_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    cur = duck.execute(ORACLE_SQL[name])
    dcols = [d[0] for d in cur.description]
    atbl = cur.fetch_arrow_table()
    drows = [tuple(r.values()) for r in atbl.to_pylist()]

    assert len(srows) == len(drows), f"rowcount spark={len(srows)} duckdb={len(drows)}"
    assert sorted(scols) == sorted(dcols)
    dt_problems = check_oracles.dtype_problems(sdf.schema, atbl.schema)
    assert not dt_problems, dt_problems
    sk = check_oracles.rows_key(scols, srows)
    dk = check_oracles.rows_key(dcols, drows)
    if sk != dk:
        diff = next((a, b) for a, b in zip(sk, dk) if a != b)
        pytest.fail(f"values differ, first diff: spark={diff[0]} duckdb={diff[1]}")
