"""The north-rule path executed over a REAL Iceberg table: transcripts
written as an iceberg-py v2 table (sources/iceberg.py), declared as an
``iceberg:`` EventSource, scanned with partition bounds pushed into
metadata-only planning, and fed through the as-of join backfill — results
must be row-identical to the same job over the raw DataFrame."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, EventSource, GroupBy, Join, JoinPart, Op, Query, TimeUnit, Window
from chronon_spark.operators.join import compute_join
from chronon_spark.sources.iceberg import IcebergTable, create_table
from chronon_spark.sources.scan import scan_source
from chronon_spark.sources.transcripts import generate_transcripts


def _transcripts_with_ds(spark):
    t = generate_transcripts(spark, n_conversations=40, avg_turns=8, n_days=6,
                             hot_conversations=1, hot_multiplier=20)
    return t.withColumn("ds", F.date_format(F.col("ts"), "yyyy-MM-dd"))


def _write(spark, tmp_path):
    df = _transcripts_with_ds(spark)
    loc = str(tmp_path / "transcripts_ice")
    create_table(df, loc, partition_by=["ds"])
    return df, loc


def test_scan_source_resolves_iceberg_with_partition_pushdown(spark, tmp_path):
    df, loc = _write(spark, tmp_path)
    all_ds = sorted(r["ds"] for r in df.select("ds").distinct().collect())
    lo, hi = all_ds[1], all_ds[-2]
    src = EventSource(
        table=f"iceberg:{loc}",
        query=Query(start_partition=lo, end_partition=hi),
    )
    got = scan_source(spark, src)
    exp = df.where((F.col("ds") >= lo) & (F.col("ds") <= hi))
    assert sorted(got.select(*exp.columns).collect()) == sorted(exp.collect())
    # the bounds reached METADATA planning: fewer files than a full scan
    t = IcebergTable(loc)
    audit_full, audit_rng = {}, {}
    t.plan_scan(_audit=audit_full)
    t.plan_scan(filters=[("ds", ">=", lo), ("ds", "<=", hi)], _audit=audit_rng)
    assert 0 < audit_rng["files_kept"] < audit_full["files_kept"]


def test_backfill_over_iceberg_equals_raw_frame(spark, tmp_path):
    df, loc = _write(spark, tmp_path)
    gb = GroupBy(
        name="conv_stats",
        keys=["conv_id"],
        aggregations=[
            Aggregation(Op.COUNT, "turn_idx", windows=(Window(1, TimeUnit.DAYS),)),
            Aggregation(Op.LAST, "role"),
        ],
    )
    join = Join(name="j", left_keys=["conv_id"], join_parts=[JoinPart(group_by=gb)])
    left = df.where(F.col("role") == "assistant").select("conv_id", "ts")

    events_ice = scan_source(spark, EventSource(table=f"iceberg:{loc}", query=Query()))
    out_ice = compute_join(left, {"conv_stats": events_ice.drop("ds")}, join)
    out_raw = compute_join(left, {"conv_stats": df.drop("ds")}, join)
    assert sorted(out_ice.collect()) == sorted(out_raw.collect())
