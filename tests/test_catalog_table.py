"""Catalog-managed table backend (sources/catalog.py): the TableUtils DDL
surface — creation, SHOW PARTITIONS, dynamic INSERT OVERWRITE, append-only
ALTER TABLE ADD COLUMNS evolution, TBLPROPERTIES lineage, archive tables —
executed through a real Spark catalog (reference TableUtils.scala:104-282,
480-534, 970-1031)."""

import uuid

import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.catalog import CatalogTable
from chronon_spark.sources.tableio import (
    SchemaEvolutionError,
    backfill,
    insert_overwrite_partitions,
)


@pytest.fixture()
def db(spark, tmp_path):
    name = f"cat_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {name} LOCATION '{tmp_path}/wh'")
    yield name
    spark.sql(f"DROP DATABASE {name} CASCADE")


def _frame(spark, days, base=0):
    rows = [(base + i, f"k{i % 3}", d) for d in days for i in range(4)]
    return spark.createDataFrame(rows, "id long, k string, ds string")


def test_create_partitions_and_pruned_read(spark, db):
    t = CatalogTable(spark, f"{db}.t1")
    assert not t.exists() and t.partitions() == []
    insert_overwrite_partitions(_frame(spark, ["2026-01-01", "2026-01-02"]), t)
    assert t.exists()
    assert t.provider() == "parquet"
    assert t.partitions() == ["2026-01-01", "2026-01-02"]
    got = t.read_range(spark, "2026-01-02", "2026-01-02")
    assert got.count() == 4
    # the ds predicate must prune at the catalog/partition level, not post-scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "2026-01-02" in plan


def test_dynamic_overwrite_replaces_only_matching_partitions(spark, db):
    t = CatalogTable(spark, f"{db}.t2")
    insert_overwrite_partitions(_frame(spark, ["2026-01-01", "2026-01-02"]), t)
    # overwrite day 2 only, with different ids
    insert_overwrite_partitions(_frame(spark, ["2026-01-02"], base=100), t)
    d1 = t.read().where("ds = '2026-01-01'").agg(F.min("id")).collect()[0][0]
    d2 = t.read().where("ds = '2026-01-02'").agg(F.min("id")).collect()[0][0]
    assert d1 == 0 and d2 == 100
    assert t.partitions() == ["2026-01-01", "2026-01-02"]


def test_append_only_evolution_via_alter_table(spark, db):
    t = CatalogTable(spark, f"{db}.t3")
    insert_overwrite_partitions(_frame(spark, ["2026-01-01"]), t)
    widened = _frame(spark, ["2026-01-02"]).withColumn("score", F.lit(1.5))
    insert_overwrite_partitions(widened, t)  # triggers ALTER TABLE ADD COLUMNS
    assert "score" in t.read().columns
    old = t.read().where("ds = '2026-01-01'").select("score").collect()
    assert all(r.score is None for r in old)  # old partitions read null
    new = t.read().where("ds = '2026-01-02'").select("score").collect()
    assert all(r.score == 1.5 for r in new)


def test_drop_and_retype_rejected(spark, db):
    t = CatalogTable(spark, f"{db}.t4")
    insert_overwrite_partitions(_frame(spark, ["2026-01-01"]), t)
    with pytest.raises(SchemaEvolutionError, match="dropped"):
        insert_overwrite_partitions(
            _frame(spark, ["2026-01-02"]).drop("k"), t
        )
    with pytest.raises(SchemaEvolutionError, match="type"):
        insert_overwrite_partitions(
            _frame(spark, ["2026-01-02"]).withColumn("k", F.lit(7)), t
        )


def test_lineage_rides_table_properties(spark, db):
    t = CatalogTable(spark, f"{db}.t5")
    insert_overwrite_partitions(_frame(spark, ["2026-01-01"]), t)
    assert t.lineage("2026-01-01") is None
    t.write_lineage("2026-01-01", {"rows": 4, "semantic_hash": "h'1"})
    got = t.lineage("2026-01-01")
    assert got == {"rows": 4, "semantic_hash": "h'1"}  # quote survives escaping


def test_backfill_resume_and_archive_through_catalog(spark, db):
    t = CatalogTable(spark, f"{db}.t6")
    calls = []

    def compute(s, lo, hi):
        calls.append((lo, hi))
        return _frame(s, [lo] if lo == hi else [lo, hi])

    recs = backfill(spark, t, compute, "2026-01-01", "2026-01-02",
                    semantic_hash="v1", step_days=1)
    assert len(recs) == 2 and all(r["rows"] == 4 for r in recs)
    assert t.partitions() == ["2026-01-01", "2026-01-02"]
    # resume: nothing to do, compute not called again
    n = len(calls)
    backfill(spark, t, compute, "2026-01-01", "2026-01-02",
             semantic_hash="v1", step_days=1)
    assert len(calls) == n
    # definition change: stale partitions archived to their own table, recomputed
    backfill(spark, t, compute, "2026-01-01", "2026-01-02",
             semantic_hash="v2", step_days=1)
    assert len(calls) == n + 2
    assert t.lineage("2026-01-01")["semantic_hash"] == "v2"
    archive = CatalogTable(spark, f"{db}.t6__archive_pre_v2")
    assert archive.exists()
    assert archive.partitions() == ["2026-01-01", "2026-01-02"]
