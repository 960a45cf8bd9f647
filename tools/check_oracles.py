"""Local stand-in for the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
set, and order-insensitive values. Exits nonzero on any mismatch.

Usage: python tools/check_oracles.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        # rounded in-query; normalize -0.0 and format compactly
        return repr(value + 0.0 if value != 0 else 0.0)
    if hasattr(value, "isoformat"):
        return value.isoformat()
    try:
        from decimal import Decimal

        if isinstance(value, Decimal):
            return repr(float(value))
    except ImportError:
        pass
    return repr(value)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def spark_type_family(dt) -> str:
    """Canonical physical-type family for a Spark DataType.

    Int widths collapse to one family: the driver's hasher accepts
    int32 vs int64 (r2 ledger: q_topk_per_group's row_number was green)
    but NOT int64 vs HUGEINT/decimal — that is the case to catch.
    """
    name = dt.simpleString()
    return {
        "tinyint": "int", "smallint": "int", "int": "int",
        "bigint": "int", "float": "float32", "double": "float64",
        "string": "string", "boolean": "bool", "date": "date",
        "binary": "binary",
    }.get(name, name)


def arrow_type_family(at) -> str:
    """Canonical physical-type family for an Arrow type (DuckDB result)."""
    import pyarrow as pa

    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_decimal(at):
        return f"decimal({at.precision},{at.scale})"
    if pa.types.is_large_string(at):
        return "string"
    if pa.types.is_integer(at):
        return "int"
    # align Arrow's spelling with the Spark families above
    return {"double": "float64", "float": "float32", "halffloat": "float16"}.get(
        str(at), str(at)
    )


def dtype_problems(sdf_schema, arrow_schema):
    """Compare Spark vs DuckDB-Arrow physical column types by name.

    The driver hashes serialized values, so a DuckDB HUGEINT/DECIMAL result
    hash-mismatches a Spark BIGINT even when the numeric values are identical
    (the r2 q_pack_sequences red row). Catch that locally.
    """
    spark_types = {f.name: spark_type_family(f.dataType) for f in sdf_schema.fields}
    problems = []
    for field in arrow_schema:
        st = spark_types.get(field.name)
        if st is None:
            continue
        dt = arrow_type_family(field.type)
        if st != dt and {st, dt} != {"timestamp"}:
            problems.append(f"dtype mismatch {field.name}: spark={st} duckdb={dt}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from amanogawa_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(cpus=8, app_name="oracle_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.queries or list(qs)
    failures = []
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, args.sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            atbl = cur.fetch_arrow_table()
            drows = [tuple(r.values()) for r in atbl.to_pylist()]
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        problems.extend(dtype_problems(sdf.schema, atbl.schema))
        if not problems:
            sk = rows_key(scols, [tuple(r) for r in srows])
            dk = rows_key(dcols, drows)
            if sk != dk:
                diff_idx = next(i for i, (a, b) in enumerate(zip(sk, dk)) if a != b) if len(sk) == len(dk) else -1
                sample = (sk[diff_idx], dk[diff_idx]) if diff_idx >= 0 else (sk[:2], dk[:2])
                problems.append(f"values differ, first diff: spark={sample[0]} duckdb={sample[1]}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)[:400]}")
        else:
            print(f"[ OK ] {name}: {len(srows)} rows match")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
