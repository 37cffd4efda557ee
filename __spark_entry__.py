"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship transcript feature backfill at sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query (omitted for approximate /
                 non-SQL-expressible ops, which get rows-only checks).

Implementations live in chronon_spark/driver_contract.py so they are part of
the installable package and covered by tests/test_entry_parity.py (which
replicates the driver's compare locally).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chronon_spark.driver_contract import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["transcripts_backfill"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
