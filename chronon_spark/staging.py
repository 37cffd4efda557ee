"""StagingQuery: arbitrary SQL with date macros + incremental backfill.

Reference: spark/src/main/scala/ai/chronon/spark/StagingQuery.scala:42-126 —
macros `{{ start_date }}`, `{{ end_date }}`, `{{ latest_date }}`,
`{{ max_date(table=...) }}` substituted per unfilled partition range, result
insert-overwritten. Ours renders to plain spark.sql over temp views/tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from chronon_spark.sources.tableio import PartitionedTable, backfill

MACRO_RE = re.compile(r"\{\{\s*(start_date|end_date|latest_date|max_date\(table=([\w.]+)\))\s*\}\}")


def render(
    spark: SparkSession, sql: str, start_ds: str, end_ds: str, latest_ds: str | None = None
) -> str:
    """Substitute the reference's date macros (quoted date literals)."""

    def sub(m: re.Match) -> str:
        kind = m.group(1)
        if kind == "start_date":
            return f"'{start_ds}'"
        if kind == "end_date":
            return f"'{end_ds}'"
        if kind == "latest_date":
            return f"'{latest_ds or end_ds}'"
        table = m.group(2)
        row = spark.sql(f"SELECT max(ds) FROM {table}").first()
        return f"'{row[0]}'"

    return MACRO_RE.sub(sub, sql)


def run_staging_query(
    spark: SparkSession, sql: str, start_ds: str, end_ds: str, latest_ds: str | None = None
) -> DataFrame:
    return spark.sql(render(spark, sql, start_ds, end_ds, latest_ds))


def backfill_staging_query(
    spark: SparkSession,
    sql: str,
    table: PartitionedTable,
    start_ds: str,
    end_ds: str,
    semantic_hash: str = "",
    step_days: int = 30,
) -> list[dict]:
    """Incremental staging-query backfill: each unfilled chunk re-renders the
    macros for its own [start, end] and overwrites exactly those partitions."""
    return backfill(
        spark,
        table,
        lambda s, lo, hi: run_staging_query(s, sql, lo, hi),
        start_ds,
        end_ds,
        semantic_hash=semantic_hash,
        step_days=step_days,
    )
