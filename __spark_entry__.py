"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship link-graph query on sf0.001.
``queries()`` / ``oracle_sql()`` — the full operator suite from SURVEY.md §2
plus training-data ops; implementations live in
``amanogawa_spark/oracle_suite.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from amanogawa_spark.oracle_suite import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived edge graph → 5-iteration PageRank → scored vertices."""
    from amanogawa_spark.oracle_suite import q_pagerank5

    return q_pagerank5(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
