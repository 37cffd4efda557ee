"""SparkSession factory.

Mirrors the reference's session defaults (UTC timezone, dynamic partition
overwrite, AQE; reference: spark/src/main/scala/ai/chronon/spark/
SparkSessionBuilder.scala:65-76) but on stock PySpark. Iceberg extensions are
attached only when the runtime jars are present (not in this image — gated).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "chronon_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local mode: match cores, not the 200 default (no cluster to absorb it)
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        # read parquet timestamp[us] (isAdjustedToUTC=false) as TIMESTAMP_LTZ
        # under the UTC session zone — same instant arithmetic as the DuckDB
        # oracle's naive timestamps, and unix_millis() applies directly
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # ds partition values stay strings (reference PartitionSpec contract),
        # not auto-inferred DATEs
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    )
    # Iceberg support is optional: the sandbox image has no Iceberg jars, so we
    # fall back to plain parquet tables with hive-style `ds=` partitioning
    # (same day-partition semantics; see sources/tableio.py).
    if os.environ.get("CHRONON_ICEBERG_JARS"):
        builder = (
            builder.config("spark.jars", os.environ["CHRONON_ICEBERG_JARS"])
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config(
                "spark.sql.catalog.local.warehouse",
                os.environ.get("CHRONON_WAREHOUSE", "/tmp/chronon_warehouse"),
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
