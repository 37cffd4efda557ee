"""Declarative Source/Query scanning (reference api.thrift:7-101 Query /
EventSource / EntitySource; SQL rendering QueryUtils.scala:23-56,
renderDataSourceQuery GroupBy.scala:608-680) compiled to native DataFrame
predicates/projections."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Aggregation,
    EntitySource,
    EventSource,
    GroupBy,
    Op,
    Query,
    TimeUnit,
    Window,
)
from chronon_spark.sources.scan import scan_source

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_event_source_selects_wheres(spark, events):
    src = EventSource(
        table=events,
        query=Query(
            selects={"user_id": "user_id", "v2": "value * 2", "ts": "ts"},
            wheres=["event_type = 'purchase'", "value > 0"],
        ),
    )
    out = scan_source(spark, src)
    assert out.columns == ["user_id", "v2", "ts"]
    base = events.where("event_type = 'purchase' AND value > 0")
    assert out.count() == base.count()
    a = out.agg(F.sum("v2")).first()[0]
    b = base.agg(F.sum(F.col("value") * 2)).first()[0]
    assert abs(a - b) < 1e-6


def test_event_source_predicates_reach_parquet_scan(spark):
    """wheres compile to native predicates: the parquet scan node must carry
    PushedFilters (not a post-scan-only filter over all rows)."""
    fresh = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = scan_source(
        spark,
        EventSource(table=fresh, query=Query(wheres=["user_id = 7"])),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:120]


def test_event_source_catalog_name_and_partition_bounds(spark, events):
    events.withColumn("ds", F.date_format("ts", "yyyy-MM-dd")).createOrReplaceTempView(
        "scan_events_v"
    )
    src = EventSource(
        table="scan_events_v",
        query=Query(start_partition="2024-01-05", end_partition="2024-01-10"),
    )
    out = scan_source(spark, src)
    days = [r[0] for r in out.select("ds").distinct().collect()]
    assert days and all("2024-01-05" <= d <= "2024-01-10" for d in days)


def test_cumulative_event_source_reads_latest_partition(spark, events):
    cum = (
        events.where(F.to_date("ts") <= F.lit("2024-01-15"))
        .withColumn("ds", F.lit("2024-01-15"))
        .unionByName(events.withColumn("ds", F.lit("2024-01-30")))
    )
    src = EventSource(
        table=cum,
        query=Query(end_partition="2024-01-20"),
        is_cumulative=True,
    )
    out = scan_source(spark, src)
    assert "ds" not in out.columns
    assert out.count() == events.where(F.to_date("ts") <= F.lit("2024-01-15")).count()


def test_query_setups_udf_available_in_selects(spark, events):
    src = EventSource(
        table=events,
        query=Query(
            selects={"user_id": "user_id", "v3": "chronon_scan_triple(value)"},
            setups=[
                "CREATE OR REPLACE TEMPORARY FUNCTION chronon_scan_triple(x DOUBLE) "
                "RETURNS DOUBLE RETURN x * 3"
            ],
        ),
    )
    out = scan_source(spark, src)
    a = out.agg(F.sum("v3")).first()[0]
    b = events.agg(F.sum(F.col("value") * 3)).first()[0]
    assert a == pytest.approx(b)


def test_entity_source_snapshot_and_cdc_pair(spark):
    snaps = spark.createDataFrame(
        [(1, "2024-01-01", "gold", 10.0, 1704067200000)],
        "user_id long, ds string, tier string, balance double, ts long",
    )
    muts = spark.createDataFrame(
        [(1, "2024-01-02", "gold", 10.0, 1704153600000, 1704153600000, True)],
        "user_id long, ds string, tier string, balance double, ts long, "
        "mutation_ts long, is_before boolean",
    )
    q = Query(selects={"user_id": "user_id", "balance": "balance", "ts": "ts"})
    only = scan_source(spark, EntitySource(snapshot_table=snaps, query=q))
    # partition + CDC bookkeeping columns survive an explicit select list
    assert set(only.columns) == {"user_id", "balance", "ts", "ds"}
    pair = scan_source(
        spark, EntitySource(snapshot_table=snaps, mutation_table=muts, query=q)
    )
    assert isinstance(pair, tuple) and len(pair) == 2
    s, m = pair
    assert "ds" in s.columns
    assert {"mutation_ts", "is_before"} <= set(m.columns)


def test_scanned_cdc_source_feeds_join_part(spark):
    """scan_source output plugs straight into compute_join's sources dict."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators.join import compute_join

    day0 = 1704067200000  # 2024-01-01T00:00Z
    snaps = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, day0), (2, "2024-01-01", 3.0, day0)],
        "user_id long, ds string, balance double, ts long",
    )
    muts = spark.createDataFrame(
        [
            (1, "2024-01-02", 10.0, day0, day0 + 86_400_000 + 3_600_000, True),
            (1, "2024-01-02", 25.0, day0 + 86_400_000 + 3_600_000,
             day0 + 86_400_000 + 3_600_000, False),
        ],
        "user_id long, ds string, balance double, ts long, "
        "mutation_ts long, is_before boolean",
    )
    gb = GroupBy(
        name="acct",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "balance", windows=(Window(7, TimeUnit.DAYS),))],
    )
    left = spark.createDataFrame(
        [(1, day0 + 86_400_000 + 2 * 3_600_000), (2, day0 + 86_400_000 + 2 * 3_600_000)],
        "user_id long, ts long",
    )
    src = scan_source(
        spark, EntitySource(snapshot_table=snaps, mutation_table=muts, query=Query())
    )
    out = compute_join(
        left,
        {"acct": src},
        Join(name="j", left_keys=["user_id"], join_parts=[JoinPart(group_by=gb)]),
    )
    got = {r["user_id"]: r["acct_balance_sum_7d"] for r in out.collect()}
    # user 1: snapshot 10 reversed, 25 inserted before the query ts -> 25
    assert got[1] == pytest.approx(25.0)
    assert got[2] == pytest.approx(3.0)


def test_scan_sources_unions_by_name(spark, events):
    """Multi-source GroupBy: each source's Query projects onto the same
    schema, the scans union by name (reference GroupBy.scala:484-488)."""
    from chronon_spark.sources.scan import scan_sources

    s1 = EventSource(
        table=events,
        query=Query(
            selects={"user_id": "user_id", "v": "value", "ts": "ts"},
            wheres=["event_type = 'purchase'"],
        ),
    )
    s2 = EventSource(
        table=events,
        query=Query(
            # different shape on disk, same projected schema
            selects={"user_id": "user_id", "v": "value * 1.0", "ts": "ts"},
            wheres=["event_type = 'click'"],
        ),
    )
    out = scan_sources(spark, [s1, s2])
    assert out.columns == ["user_id", "v", "ts"]
    want = events.where("event_type IN ('purchase', 'click')").count()
    assert out.count() == want
    snaps = spark.createDataFrame([(1, "2024-01-01")], "user_id long, ds string")
    muts = spark.createDataFrame(
        [(1, "2024-01-02", 0, False)],
        "user_id long, ds string, mutation_ts long, is_before boolean",
    )
    with pytest.raises(TypeError):
        scan_sources(
            spark,
            [EntitySource(snapshot_table=snaps, mutation_table=muts, query=Query())],
        )


def test_compute_join_accepts_declarative_sources(spark, events):
    """compute_join's sources dict accepts EventSource values directly —
    the declarative authoring flow end-to-end."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators.join import compute_join

    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    left = events.where("event_type = 'purchase'").select("user_id", "ts").distinct()
    j = Join(name="dj", left_keys=["user_id"], join_parts=[JoinPart(group_by=gb)])
    declared = compute_join(
        left,
        {"g": EventSource(table=events, query=Query(
            selects={"user_id": "user_id", "value": "value", "ts": "ts"}))},
        j,
        tiebreak=None,
    )
    direct = compute_join(
        left, {"g": events.select("user_id", "value", "ts")}, j, tiebreak=None
    )
    a = sorted(map(str, declared.collect()))
    b = sorted(map(str, direct.collect()))
    assert a == b


def test_custom_cdc_column_names_normalized(spark):
    """Query.mutation_time_column / reversal_column (api.thrift:15-16) are
    renamed to the engine's standard mutation_ts / is_before at scan time."""
    snaps = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, 1704067200000)],
        "user_id long, ds string, balance double, ts long",
    )
    muts = spark.createDataFrame(
        [(1, "2024-01-02", 10.0, 1704153600000, 1704153600000, True)],
        "user_id long, ds string, balance double, ts long, "
        "changed_at long, is_prior boolean",
    )
    src = EntitySource(
        snapshot_table=snaps,
        mutation_table=muts,
        query=Query(mutation_time_column="changed_at", reversal_column="is_prior"),
    )
    s, m = scan_source(spark, src)
    assert {"mutation_ts", "is_before"} <= set(m.columns)
    assert "changed_at" not in m.columns and "is_prior" not in m.columns


def test_scan_normalizes_time_and_partition_columns(spark, events):
    """Declared time/partition columns rename to the engine-standard ts/ds
    (the reference renders `(timeColumn) as ts`; Constants.scala:22)."""
    raw = events.select(
        "user_id", F.col("ts").alias("event_time"), F.col("value")
    ).withColumn("date", F.date_format("event_time", "yyyy-MM-dd"))
    out = scan_source(
        spark,
        EventSource(
            table=raw,
            query=Query(time_column="event_time", partition_column="date",
                        start_partition="2024-01-05"),
        ),
    )
    assert "ts" in out.columns and "ds" in out.columns
    assert "event_time" not in out.columns and "date" not in out.columns
    assert out.agg(F.min("ds")).first()[0] >= "2024-01-05"
    # entity snapshots normalize the same way
    snaps = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, 1704067200000)],
        "user_id long, date string, balance double, event_time long",
    )
    s = scan_source(
        spark,
        EntitySource(
            snapshot_table=snaps,
            query=Query(time_column="event_time", partition_column="date"),
        ),
    )
    assert {"ts", "ds"} <= set(s.columns)


def test_schema_only_resolution_runs_no_job(spark, events):
    """Validation resolves declarative sources SCHEMA-ONLY: a cumulative
    source over a frame that would error on execution must still validate
    (no latest-partition job, no scan)."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators.analyzer import validate_join

    booby = (
        events.withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn(
            "value",
            F.when(F.lit(True), F.raise_error("must not execute")).otherwise(F.col("value")),
        )
    )
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    j = Join(name="so", left_keys=["user_id"], join_parts=[JoinPart(group_by=gb)])
    left = events.select("user_id", "ts")
    src = EventSource(table=booby, query=Query(), is_cumulative=True)
    assert validate_join(left, {"g": src}, j, check_data=False) == []


def test_selection_part_with_cdc_source_structured_error(spark):
    """aggregations=None + mutation source is a config error, surfaced as a
    structured ValidationError (and a ValueError from the engine), never an
    AttributeError crash."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators.analyzer import validate_join
    from chronon_spark.operators.join import compute_join_part

    snaps = spark.createDataFrame(
        [(1, "2024-01-01", 10.0)], "user_id long, ds string, balance double"
    )
    muts = spark.createDataFrame(
        [(1, "2024-01-02", 10.0, 0, True)],
        "user_id long, ds string, balance double, mutation_ts long, is_before boolean",
    )
    sel = GroupBy(name="users", keys=["user_id"], aggregations=None)
    j = Join(name="bad", left_keys=["user_id"], join_parts=[JoinPart(group_by=sel)])
    left = spark.createDataFrame([(1, 1704240000000)], "user_id long, ts long")
    errs = validate_join(left, {"users": (snaps, muts)}, j)
    assert any(e.code == "selection_with_mutations" for e in errs)
    with pytest.raises(ValueError, match="selection part"):
        compute_join_part(left, (snaps, muts), JoinPart(group_by=sel))
