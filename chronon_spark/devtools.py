"""Dev utilities: load local CSV/JSON files as catalog tables and export
tables back to single local files — the reference's quickstart/dev loop
(spark/src/main/scala/ai/chronon/spark/LocalDataLoader.scala:33-123,
LocalTableExporter.scala:26-75), re-expressed over the DataFrame reader/
writer. Semantics kept:

- extensions csv / json / jsonl (LocalDataLoader.writeTableFromFile);
  csv reads header+inferSchema, json multiLine, both FAILFAST;
- a STRING ``ts`` column is promoted to epoch millis assuming
  'yyyy-MM-dd HH:mm:ss' (the readability affordance, L62-68);
- a ``ds`` column makes the saved table ds-partitioned (L75-79);
- directory loads recurse, directory names become namespace parts and
  ``name.table.ext`` files carry their own namespace (loadDataRecursively
  L80-93); namespaces are created on demand;
- existing tables are left untouched (idempotent re-loads);
- export writes exactly ONE file named ``[prefix.]namespace.table.format``
  (csv with header / parquet / json), via coalesce(1) through a temp dir
  (LocalTableExporter.exportTable).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOADABLE = ("csv", "json", "jsonl")
SUPPORTED_EXPORT_FORMATS = ("csv", "parquet", "json")
DEFAULT_NAMESPACE = "default"


def _read_local_file(spark: SparkSession, path: str) -> DataFrame:
    ext = path.rsplit(".", 1)[-1].lower()
    if ext not in _LOADABLE:
        raise ValueError(
            f"unsupported extension '{ext}' for local load: {path} "
            f"(supported: {', '.join(_LOADABLE)})"
        )
    reader = spark.read.option("inferSchema", "true").option("mode", "FAILFAST")
    if ext == "csv":
        df = reader.option("header", "true").csv(path)
    else:
        df = (
            reader.option("multiLine", ext == "json")
            .option("allowComments", "true")
            .json(path)
        )
    # readability affordance: a string ts is assumed 'yyyy-MM-dd HH:mm:ss'
    # and promoted to epoch millis (reference L62-68). Spark's csv
    # inferSchema may have already parsed it as a timestamp — normalize
    # that to millis too, so loaded tables always carry the engine's
    # standard long-millis ts.
    if "ts" in df.columns:
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.StringType):
            df = df.withColumn(
                "ts",
                F.unix_timestamp(F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")) * 1000,
            )
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            df = df.withColumn("ts", F.unix_millis(F.col("ts").cast("timestamp")))
    return df


def write_table_from_file(spark: SparkSession, path: str, table_name: str) -> bool:
    """Load one local file into ``table_name`` (ds-partitioned when a ds
    column exists). Returns False when the table already exists (no-op,
    reference behavior) or the extension is unsupported."""
    if spark.catalog.tableExists(table_name):
        return False
    try:
        df = _read_local_file(spark, path)
    except ValueError:
        return False
    writer = df.write
    if "ds" in df.columns:
        writer = writer.partitionBy("ds")
    writer.saveAsTable(table_name)
    return True


def _ensure_namespace(spark: SparkSession, namespace: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{namespace}`")


def load_data_file_as_table(
    spark: SparkSession, path: str, namespace_and_table: str
) -> bool:
    """Load one file as ``[namespace.]table`` (default namespace when
    unqualified) — reference loadDataFileAsTable."""
    parts = namespace_and_table.split(".")
    if not 1 <= len(parts) <= 2:
        raise ValueError(f"invalid table name {namespace_and_table}")
    namespace, table = (DEFAULT_NAMESPACE, parts[0]) if len(parts) == 1 else parts
    if not os.path.isfile(path):
        raise FileNotFoundError(f"cannot load a non-file as a local table: {path}")
    _ensure_namespace(spark, namespace)
    return write_table_from_file(spark, path, f"{namespace}.{table}")


def load_data_recursively(
    spark: SparkSession, root: str, namespaces: list[str] | None = None
) -> list[str]:
    """Walk a directory tree loading every csv/json/jsonl file; directory
    names accumulate into the namespace (joined with '_'), and a file named
    ``extra.table.ext`` contributes 'extra' as a namespace part (reference
    loadDataRecursively). Returns the fully-qualified tables loaded."""
    if not os.path.exists(root):
        raise FileNotFoundError(f"non existent file: {root}")
    ns = list(namespaces or [])
    loaded: list[str] = []
    if os.path.isdir(root):
        for entry in sorted(os.listdir(root)):
            loaded += load_data_recursively(
                spark, os.path.join(root, entry), ns + [os.path.basename(root.rstrip("/"))]
            )
        return loaded
    splits = os.path.basename(root).split(".")
    ns_fields = ns or [DEFAULT_NAMESPACE]
    if len(splits) == 2:
        table = splits[0]
    else:
        ns_fields = ns_fields + [splits[0]]
        table = splits[1]
    namespace = "_".join(ns_fields)
    _ensure_namespace(spark, namespace)
    full = f"{namespace}.{table}"
    if write_table_from_file(spark, root, full):
        loaded.append(full)
    return loaded


def export_table(
    spark: SparkSession,
    namespace_and_table: str,
    export_dir: str,
    fmt: str = "parquet",
    prefix: str | None = None,
) -> str:
    """Write the entire table as exactly ONE local file named
    ``[prefix.]namespace.table.fmt`` under ``export_dir`` (reference
    LocalTableExporter.exportTable: coalesce(1) through a temp dir, then
    move the single part file into place). Returns the output path."""
    fmt = fmt.lower()
    if fmt not in SUPPORTED_EXPORT_FORMATS:
        raise ValueError(
            f"unsupported export format '{fmt}' "
            f"(supported: {', '.join(SUPPORTED_EXPORT_FORMATS)})"
        )
    tmp = tempfile.mkdtemp(prefix="chronon_export_")
    try:
        writer = spark.table(namespace_and_table).coalesce(1).write.format(fmt).mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        out_tmp = os.path.join(tmp, "out")
        writer.save(out_tmp)
        parts = [f for f in os.listdir(out_tmp) if f.endswith(f".{fmt}")]
        if len(parts) != 1:
            raise RuntimeError(f"unexpected number of raw output files: {parts}")
        base = f"{namespace_and_table}.{fmt}"
        if prefix:
            base = f"{prefix}.{base}"
        os.makedirs(export_dir, exist_ok=True)
        dest = os.path.join(export_dir.rstrip("/"), base)
        shutil.move(os.path.join(out_tmp, parts[0]), dest)
        return dest
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
