"""Derivation projection semantics: wildcard passthrough, rename/replace
detection, and derived-only output (reference derivationProjection,
api/.../Extensions.scala:1069-1120)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.groupby import temporal_events


def _run(events, derivations):
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation(Op.COUNT, "value"),
        ],
        derivations=derivations,
    )
    left = events.where(F.col("event_type") == "purchase").select("user_id", "ts").limit(50)
    return temporal_events(left, events, gb, tiebreak="event_id")


def test_wildcard_passthrough_plus_derived(spark, events):
    out = _run(events, {"*": "*", "ratio": "CAST(value_count_7d AS DOUBLE) / nullif(value_count, 0)"})
    assert set(out.columns) == {"user_id", "ts", "value_count_7d", "value_count", "ratio"}


def test_no_wildcard_keeps_only_identity_and_derived(spark, events):
    out = _run(events, {"weekly": "value_count_7d"})
    assert set(out.columns) == {"user_id", "ts", "weekly"}


def test_setups_register_udf_for_derivations(spark, events):
    """`setups` DDL runs before planning so a SQL-defined UDF is available
    to derivation expressions (reference Query.setups executed through
    tableUtils.sql)."""
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
        derivations={"*": "*", "c2": "chronon_double_it(value_count_7d)"},
        setups=[
            "CREATE OR REPLACE TEMPORARY FUNCTION chronon_double_it(x BIGINT) "
            "RETURNS BIGINT RETURN x * 2"
        ],
    )
    left = events.where(F.col("event_type") == "purchase").select("user_id", "ts").limit(20)
    out = temporal_events(left, events, gb, tiebreak="event_id")
    row = out.where(F.col("value_count_7d") > 0).first()
    assert row["c2"] == row["value_count_7d"] * 2


def test_setups_run_once_per_session(spark, events):
    """Non-re-runnable DDL (CREATE TEMPORARY FUNCTION without OR REPLACE)
    must execute once per SparkSession even when planning re-enters
    run_setups (multi-part joins, multi-chunk backfills); the executed-set
    lives on the session object, not a module-global keyed by id()."""
    from chronon_spark.operators.groupby import run_setups

    ddl = (
        "CREATE TEMPORARY FUNCTION chronon_runonce_probe(x BIGINT) "
        "RETURNS BIGINT RETURN x + 1"
    )
    run_setups(events, [ddl])
    # second call must be a silent no-op, not FUNCTION_ALREADY_EXISTS
    run_setups(events, [ddl])
    assert ddl in spark._chronon_executed_setups


def test_rename_replaces_in_place(spark, events):
    out = _run(events, {"*": "*", "value_count": "value_count * 10"})
    assert set(out.columns) == {"user_id", "ts", "value_count_7d", "value_count"}
    row = out.where(F.col("value_count").isNotNull()).first()
    # replaced column is the derived expression (a multiple of 10)
    assert row["value_count"] % 10 == 0
