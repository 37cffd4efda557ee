"""Window-aware backfill scan narrowing (reference getIntersectedRange,
GroupBy.scala:565-606): a [lo, hi] chunk only reads events inside
[epoch(lo) - max_window - 1d, epoch(hi) + 1d), lifetime aggregations
disable the cut, and no-aggregation selection parts read exactly the served
snapshot days. Value-parity of the narrowed backfill is covered by
test_materialized_join (windowed parts over a 20-day range)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.join import narrow_events

DAY = 86_400_000


def _ms(d: str) -> int:
    return (dt.date.fromisoformat(d) - dt.date(1970, 1, 1)).days * DAY


def _gb(windows):
    return GroupBy(
        name="g",
        keys=["k"],
        aggregations=[Aggregation(Op.COUNT, "v", windows=windows)],
    )


def test_narrow_windowed_cuts_both_ends(spark):
    rows = [
        ("a", _ms("2024-01-01"), 1),          # far past: dropped (> 7d+1d before lo)
        ("a", _ms("2024-02-01") - 8 * DAY, 1),  # exactly at lower bound: kept
        ("a", _ms("2024-02-03"), 1),          # inside: kept
        ("a", _ms("2024-02-06") - 1, 1),      # last ms before hi+1d: kept
        ("a", _ms("2024-02-06"), 1),          # at hi+1d: dropped
        ("a", _ms("2024-03-01"), 1),          # future: dropped
    ]
    ev = spark.createDataFrame(rows, "k string, ts long, v int")
    out = narrow_events(ev, _gb((Window(7, TimeUnit.DAYS),)), "2024-02-01", "2024-02-05")
    got = sorted(r["ts"] for r in out.collect())
    assert got == [_ms("2024-02-01") - 8 * DAY, _ms("2024-02-03"), _ms("2024-02-06") - 1]


def test_narrow_prunes_ds_partitions_too(spark):
    rows = [
        ("a", _ms("2024-01-01"), 1, "2024-01-01"),
        ("a", _ms("2024-02-03"), 1, "2024-02-03"),
    ]
    ev = spark.createDataFrame(rows, "k string, ts long, v int, ds string")
    out = narrow_events(ev, _gb((Window(1, TimeUnit.DAYS),)), "2024-02-03", "2024-02-04")
    # the ds predicate must appear in the plan (reaches partition pruning on
    # a partitioned source), and the far-past partition is gone
    assert [r["ds"] for r in out.collect()] == ["2024-02-03"]
    assert "ds" in out._jdf.queryExecution().optimizedPlan().toString()


def test_narrow_lifetime_is_identity(spark):
    ev = spark.createDataFrame(
        [("a", _ms("2020-01-01"), 1)], "k string, ts long, v int"
    )
    out = narrow_events(ev, _gb(None), "2024-02-01", "2024-02-05")
    assert out is ev  # unbounded lookback: no cut at all


def test_narrow_no_agg_selection_reads_served_snapshots(spark):
    gb = GroupBy(name="u", keys=["k"], aggregations=None)
    ev = spark.createDataFrame(
        [("a", "2024-01-30", 1), ("a", "2024-01-31", 2), ("a", "2024-02-04", 3),
         ("a", "2024-02-05", 4)],
        "k string, ds string, f int",
    )
    out = narrow_events(ev, gb, "2024-02-01", "2024-02-05")
    # serve day d reads snapshot d-1: [lo-1, hi-1]
    assert sorted(r["ds"] for r in out.collect()) == ["2024-01-31", "2024-02-04"]
