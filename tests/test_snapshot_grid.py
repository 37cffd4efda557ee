"""snapshot_events coverage-grid semantics: rows track window observability,
not the full key x day grid (the scale fix for 10^6-key x 365-day runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Accuracy, Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.groupby import snapshot_events

DAY10 = 1704844800000  # 2024-01-10 00:00:00 UTC
H = 3_600_000


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v double, ms long").select(
        "k", "v", F.timestamp_millis("ms").alias("ts")
    )


def test_windowed_grid_covers_extension_only(spark):
    ev = _mk(spark, [("a", 1.0, DAY10 + 3 * H), ("b", 2.0, DAY10 + 10 * 86_400_000)])
    gb = GroupBy(
        name="s",
        keys=["k"],
        aggregations=[Aggregation(Op.SUM, "v", windows=(Window(3, TimeUnit.DAYS),))],
        accuracy=Accuracy.SNAPSHOT,
    )
    out = snapshot_events(ev, gb, start_ds="2024-01-10", end_ds="2024-01-25")
    got = {(r["k"], r["ds"]): r["v_sum_3d"] for r in out.collect()}
    # a: event on Jan 10, 3d window -> covered Jan 10..12 only
    assert got[("a", "2024-01-10")] == 1.0
    assert got[("a", "2024-01-12")] == 1.0
    assert ("a", "2024-01-13") not in got
    # b: event on Jan 20 -> Jan 20..22; nothing before
    assert ("b", "2024-01-15") not in got
    assert got[("b", "2024-01-20")] == 2.0
    assert got[("b", "2024-01-22")] == 2.0
    assert ("b", "2024-01-23") not in got


def test_lifetime_grid_extends_to_range_end(spark):
    ev = _mk(spark, [("a", 1.0, DAY10 + 3 * H)])
    gb = GroupBy(
        name="s",
        keys=["k"],
        aggregations=[Aggregation(Op.COUNT, "v")],
        accuracy=Accuracy.SNAPSHOT,
    )
    out = snapshot_events(ev, gb, start_ds="2024-01-08", end_ds="2024-01-15")
    got = {(r["k"], r["ds"]): r["v_count"] for r in out.collect()}
    assert ("a", "2024-01-09") not in got  # before first event day
    for d in range(10, 16):
        assert got[("a", f"2024-01-{d:02d}")] == 1


def test_snapshot_events_empty_source_returns_empty(spark):
    """An empty source with no explicit range yields an empty frame with the
    right schema, not a TypeError on the min/max probe."""
    from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
    from chronon_spark.operators.groupby import snapshot_events

    ev = spark.createDataFrame([], "user string, v double, ts long")
    gb = GroupBy(
        name="g",
        keys=["user"],
        aggregations=[Aggregation(Op.SUM, "v", windows=(Window(7, TimeUnit.DAYS),))],
    )
    out = snapshot_events(ev, gb)
    assert out.count() == 0
    assert set(out.columns) == {"user", "v_sum_7d", "ds"}


@pytest.mark.parametrize("seed", [17, 51])
def test_random_config_snapshot_equals_temporal_at_midnight(spark, seed):
    """Cross-engine differential: for every (key, ds) row the snapshot
    engine emits, the TEMPORAL engine queried at the next midnight (features
    as of end-of-ds, strict <) must produce identical values — the two
    engines implement one contract (reference GroupByTest.scala:57-121
    snapshot oracle) through different plans."""
    import random

    from test_random_differential import (
        _assert_rows_close,
        _freeze,
        _random_events,
        _random_gb,
    )

    from chronon_spark.operators.groupby import snapshot_events, temporal_events

    rng = random.Random(seed)
    ev = _random_events(spark, rng).cache()
    gb = _random_gb(rng)

    snap = snapshot_events(ev, gb, tiebreak="event_id").cache()
    assert snap.count() > 0
    # query each emitted (key, ds) at the NEXT midnight: end-of-ds state
    q = snap.select(
        "k",
        F.to_timestamp(F.date_add(F.to_date("ds"), 1)).alias("ts"),
        "ds",
    )
    want_df = temporal_events(
        q.select("k", "ts").distinct(), ev, gb, tiebreak="event_id", strategy="exact"
    ).join(q, ["k", "ts"]).drop("ts")

    cols = ["k", "ds", *gb.output_columns()]
    key = lambda r: (str(r[0]), str(r[1]))  # noqa: E731
    got = sorted(
        (tuple(_freeze(v) for v in r) for r in snap.select(*cols).collect()), key=key
    )
    want = sorted(
        (tuple(_freeze(v) for v in r) for r in want_df.select(*cols).collect()), key=key
    )
    _assert_rows_close(got, want, f"seed={seed}: snapshot vs temporal@midnight")
    snap.unpersist()
    ev.unpersist()
