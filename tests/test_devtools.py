"""Dev utilities (reference LocalDataLoader.scala / LocalTableExporter.scala
+ their tests LocalDataLoaderTest / LocalTableExporterTest): local files in,
catalog tables; tables out, exactly one local file."""

from __future__ import annotations

import json
import os

import pytest

from chronon_spark.devtools import (
    export_table,
    load_data_file_as_table,
    load_data_recursively,
    write_table_from_file,
)


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "sample.csv"
    p.write_text(
        "user_id,value,ts,ds\n"
        "1,10.5,2024-01-01 00:00:00,2024-01-01\n"
        "2,3.0,2024-01-02 12:30:00,2024-01-02\n"
    )
    return str(p)


def _cleanup(spark, *tables):
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        db, _, name = t.rpartition(".")
        loc = (
            os.path.join(wh, name)
            if db in ("", "default")
            else os.path.join(wh, f"{db}.db", name)
        )
        # a prior crashed run can leave the managed location behind in the
        # file-based warehouse even when the in-memory catalog forgot it
        shutil.rmtree(loc, ignore_errors=True)


def test_csv_load_ts_promotion_and_ds_partitioning(spark, csv_file):
    _cleanup(spark, "default.devtools_csv")
    assert load_data_file_as_table(spark, csv_file, "devtools_csv")
    df = spark.table("default.devtools_csv")
    rows = {r["user_id"]: r for r in df.collect()}
    # string ts promoted to epoch MILLIS (reference L62-68)
    assert rows[1]["ts"] == 1704067200000
    assert rows[2]["ts"] == 1704198600000
    # ds column -> partitioned table
    parts = [r[0] for r in spark.sql("SHOW PARTITIONS default.devtools_csv").collect()]
    assert sorted(parts) == ["ds=2024-01-01", "ds=2024-01-02"]
    # idempotent: second load is a no-op, not an overwrite/error
    assert load_data_file_as_table(spark, csv_file, "devtools_csv") is False
    _cleanup(spark, "default.devtools_csv")


def test_jsonl_load_and_unsupported_extension(spark, tmp_path):
    p = tmp_path / "ev.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"k": "a", "n": 1}) + "\n")
        f.write(json.dumps({"k": "b", "n": 2}) + "\n")
    _cleanup(spark, "default.devtools_jsonl")
    assert load_data_file_as_table(spark, str(p), "default.devtools_jsonl")
    assert spark.table("default.devtools_jsonl").count() == 2
    _cleanup(spark, "default.devtools_jsonl")
    # unsupported extension: skipped, not raised (reference logs + returns)
    bad = tmp_path / "x.parquet_not"
    bad.write_text("zzz")
    assert write_table_from_file(spark, str(bad), "default.devtools_bad") is False
    assert not spark.catalog.tableExists("default.devtools_bad")


def test_recursive_load_namespaces(spark, tmp_path):
    root = tmp_path / "data"
    (root / "sub").mkdir(parents=True)
    (root / "plain.csv").write_text("a,b\n1,2\n")
    (root / "extra.named.csv").write_text("a,b\n3,4\n")
    (root / "sub" / "inner.csv").write_text("a,b\n5,6\n")
    loaded = load_data_recursively(spark, str(root))
    # dir name 'data' is the namespace; 'extra.named.csv' appends 'extra';
    # nested dir 'sub' joins with '_'
    assert sorted(loaded) == ["data.plain", "data_extra.named", "data_sub.inner"]
    assert spark.table("data_sub.inner").first()["a"] == 5
    for t in loaded:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for db in ("data", "data_extra", "data_sub"):
        spark.sql(f"DROP DATABASE IF EXISTS `{db}`")


def test_export_single_file_csv_and_parquet(spark, csv_file, tmp_path):
    _cleanup(spark, "default.devtools_exp")
    load_data_file_as_table(spark, csv_file, "devtools_exp")
    out = export_table(spark, "default.devtools_exp", str(tmp_path / "exports"), "csv")
    assert out.endswith("default.devtools_exp.csv") and os.path.isfile(out)
    lines = open(out).read().strip().splitlines()
    assert lines[0].split(",")[0] in ("user_id", "ds", "value", "ts")  # header present
    assert len(lines) == 3  # header + 2 rows, ONE file
    outp = export_table(
        spark, "default.devtools_exp", str(tmp_path / "exports"), "parquet", prefix="pfx"
    )
    assert outp.endswith("pfx.default.devtools_exp.parquet")
    assert spark.read.parquet(outp).count() == 2
    with pytest.raises(ValueError, match="unsupported export format"):
        export_table(spark, "default.devtools_exp", str(tmp_path), "orc")
    _cleanup(spark, "default.devtools_exp")


def test_cli_local_data_path_preload(spark, tmp_path, capsys):
    """reference run.py local mode: --local-data-path loads files as tables
    before the command runs, so confs can spark.table() them."""
    import json as _json

    from chronon_spark.__main__ import main

    data = tmp_path / "localdata"
    data.mkdir()
    (data / "ev.csv").write_text(
        "user_id,value,ts\n1,2.0,2024-01-01 00:00:00\n1,3.0,2024-01-01 01:00:00\n"
    )
    conf = tmp_path / "conf.py"
    conf.write_text(
        """
from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window

group_by = GroupBy(
    name="local_gb", keys=["user_id"],
    aggregations=[Aggregation(Op.SUM, "value", windows=(Window(1, TimeUnit.DAYS),))],
)

def source(spark):
    return spark.table("localdata.ev")
"""
    )
    rc = main(
        ["analyze", "--conf", str(conf), "--local-data-path", str(data)], spark=spark
    )
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["errors"] == []
    spark.sql("DROP TABLE IF EXISTS localdata.ev")
    spark.sql("DROP DATABASE IF EXISTS localdata")
