"""Layout-compatibility contract: the parquet tables tableio writes map 1:1
onto Iceberg identity-partitioned tables.

No Iceberg jars ship in this environment (tableio.py documents the scope;
session.get_spark's ``extra_conf`` is the catalog hook), so this pins the
CLAIM as tests instead of prose: every property Iceberg's ``add_files`` /
identity-partition import relies on for a hive-layout parquet table
(reference format handling: spark/src/main/scala/ai/chronon/spark/
TableUtils.scala:104-282; Iceberg partition listing L223-247).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.tableio import (
    PartitionedTable,
    ds_range,
    insert_overwrite_partitions,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = PartitionedTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(d, i, float(i)) for d in ds_range("2024-03-01", "2024-03-03") for i in range(4)],
        "ds string, k int, v double",
    )
    insert_overwrite_partitions(df, t, n_files=2)
    return t


def test_one_identity_partition_dir_per_day(table):
    """Hive layout `ds=<value>`: exactly Iceberg's identity(ds) transform —
    one directory per distinct value, value verbatim in the path."""
    dirs = sorted(d for d in os.listdir(table.path) if d.startswith("ds="))
    assert dirs == ["ds=2024-03-01", "ds=2024-03-02", "ds=2024-03-03"]
    for d in dirs:
        files = os.listdir(os.path.join(table.path, d))
        assert all(f.endswith(".parquet") or f.startswith(("_", ".")) for f in files)


def test_partition_column_not_in_data_files(table):
    """Iceberg `add_files` with an identity spec derives the partition value
    from the PATH; the data files must not carry the ds column (they would
    shadow the spec on import)."""
    part_dir = os.path.join(table.path, "ds=2024-03-01")
    f = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
    schema = pq.read_schema(os.path.join(part_dir, f))
    assert "ds" not in schema.names
    assert set(schema.names) == {"k", "v"}


def test_partition_values_stay_strings(spark, table):
    """PartitionSpec contract: ds is a STRING ('yyyy-MM-dd'), never inferred
    to DATE — Iceberg identity partitions compare raw values, so a DATE
    inference on one side would split the table into two partition spaces."""
    df = table.read(spark)
    assert dict(df.dtypes)["ds"] == "string"
    assert table.partitions() == ["2024-03-01", "2024-03-02", "2024-03-03"]


def test_overwrite_replaces_exactly_one_partition(spark, table):
    """Dynamic partition overwrite == Iceberg's overwrite-by-partition-filter
    (snapshot-atomic replace of exactly the partitions present in the write)."""
    df2 = spark.createDataFrame([("2024-03-02", 99, 9.9)], "ds string, k int, v double")
    insert_overwrite_partitions(df2, table)
    out = table.read(spark)
    assert out.where(F.col("ds") == "2024-03-02").count() == 1
    assert out.where(F.col("ds") != "2024-03-02").count() == 8  # untouched


def test_extra_conf_catalog_hook_applies():
    """A deployment WITH Iceberg jars attaches its catalog purely through
    get_spark(extra_conf=...) — the hook must deliver arbitrary catalog confs
    into the session verbatim (no code change needed, session.py:7-17)."""
    from chronon_spark.session import get_spark

    conf = {
        "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.lake.type": "hadoop",
        "spark.sql.catalog.lake.warehouse": "/tmp/lake_wh",
    }
    s = get_spark("iceberg_conf_probe", master="local[2]", extra_conf=conf)
    try:
        for k, v in conf.items():
            assert s.conf.get(k) == v
    finally:
        pass  # shared JVM: leave the session to the suite's lifecycle
