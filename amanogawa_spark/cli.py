"""CLI: run a TOML job spec — ``python -m amanogawa_spark.cli config.toml``.

Parity with the reference's ``./amanogawa-cli config.toml`` entry point
(``src/amanogawa/cli.cpp:5-9``): parse the config, build the component
DAG, execute every sink. Spark session parameters come from the
environment (SPARK_GRAFT_CPUS, defaulting to all local cores) so the same
command scales from a laptop to ``spark-submit --py-files`` cluster runs
(where an active session already exists and is reused).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="amanogawa-spark", description="Run a TOML job spec on Spark"
    )
    ap.add_argument("config", help="path to the TOML job spec")
    ap.add_argument(
        "--cpus",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or None,
        help="local[N] parallelism (ignored when a session already exists)",
    )
    args = ap.parse_args(argv)

    from amanogawa_spark.plans.config import run_config
    from amanogawa_spark.session import get_spark

    spark = get_spark(cpus=args.cpus)
    slots = run_config(args.config, spark)
    print(f"executed {args.config}: {len(slots)} components materialized")
    return 0


if __name__ == "__main__":
    sys.exit(main())
