"""SNAPSHOT-accuracy join parts via the materialized daily-snapshot table:
value parity with the in-memory midnight-query path, the equi-join plan (no
per-run temporal pass), empty-cell fill semantics, and snapshot-table reuse
across parts and resumed runs (reference JoinBase.scala:70-130: SNAPSHOT
parts equi-join the GroupBy's snapshot output at ts_ds + 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Accuracy,
    Aggregation,
    GroupBy,
    Join,
    JoinPart,
    Op,
    TimeUnit,
    Window,
)
from chronon_spark.operators.join import compute_join, materialize_join
from tests.test_random_differential import _assert_rows_close, _freeze


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _snap_gb(name="usnap"):
    return GroupBy(
        name=name,
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation(Op.SUM, "value", windows=(Window(1, TimeUnit.DAYS),)),
            Aggregation(Op.LAST_K, "value", windows=(Window(7, TimeUnit.DAYS),), k=3),
        ],
        accuracy=Accuracy.SNAPSHOT,
    )


def _left_with_ghost(spark, events):
    """Purchase left rows PLUS a key absent from the events source and rows
    on the earliest event day (whose previous midnight precedes every event)
    — both hit coverage-grid holes and must render empty states, not nulls
    for count / *_k."""
    left = events.where(F.col("event_type") == "purchase").select("user_id", "ts")
    ghost = events.limit(1).select(
        F.lit("2024-01-15 12:00:00").cast("timestamp").alias("ts"),
        F.lit(-424242).cast("long").alias("user_id"),
    )
    early = events.select(F.min("ts").alias("ts")).crossJoin(
        events.select("user_id").distinct().limit(3)
    )
    return left.unionByName(ghost.select("user_id", "ts")).unionByName(
        early.select("user_id", "ts")
    )


def _rows(df, cols):
    return sorted(
        (tuple(_freeze(v) for v in r) for r in df.select(*cols).collect()), key=repr
    )


def test_snapshot_part_materialized_matches_inmemory(spark, events, tmp_path):
    """materialize_join's snapshot-table equi-join renders exactly the
    in-memory midnight-query values, including empty states on grid holes."""
    gb = _snap_gb()
    j = Join(name="sj", left_keys=["user_id"], join_parts=[JoinPart(group_by=gb)])
    left = _left_with_ghost(spark, events)
    lo, hi = "2024-01-01", "2024-01-20"

    final, _parts = materialize_join(
        spark, left, {"usnap": events}, j, str(tmp_path / "sj"), lo, hi,
        tiebreak="event_id",
    )
    got_df = final.read(spark)
    want_df = compute_join(left, {"usnap": events}, j, tiebreak="event_id").where(
        F.date_format("ts", "yyyy-MM-dd").between(lo, hi)
    )
    cols = [
        "user_id",
        "ts",
        "usnap_value_count_7d",
        "usnap_value_sum_1d",
        "usnap_value_last3_7d",
    ]
    got, want = _rows(got_df, cols), _rows(want_df, cols)
    _assert_rows_close(got, want, "materialized vs in-memory snapshot part")
    # grid-hole rows exist and carry EMPTY states, not nulls across the board
    holes = [r for r in got if r[0] == -424242]
    assert holes, "ghost_user rows missing from the materialized join"
    for r in holes:
        assert r[2] == 0, "COUNT over an uncovered cell must be 0"
        assert r[3] is None, "SUM over an uncovered cell must be NULL"
        assert r[4] == (), "LAST_K over an uncovered cell must be an empty array"


def test_snapshot_table_shared_and_resumed(spark, events, tmp_path):
    """ONE snapshot table serves two parts over the same GroupBy definition,
    and a re-run (and a range extension) reuses its partitions instead of
    re-aggregating."""
    import os

    gb = _snap_gb()
    gb_derived = GroupBy(
        name=gb.name,
        keys=gb.keys,
        aggregations=gb.aggregations,
        accuracy=Accuracy.SNAPSHOT,
        derivations={"*": "*", "cnt_x2": "value_count_7d * 2"},
    )
    j = Join(
        name="sj2",
        left_keys=["user_id"],
        join_parts=[
            JoinPart(group_by=gb),
            # differs ONLY in derivations — must share the same base table
            JoinPart(group_by=gb_derived, prefix="again"),
        ],
    )
    left = events.where(F.col("event_type") == "purchase").select("user_id", "ts")
    root = str(tmp_path / "sj2")
    lo, hi = "2024-01-05", "2024-01-12"
    final, _ = materialize_join(
        spark, left, {"usnap": events}, j, root, lo, hi, tiebreak="event_id"
    )

    snap_dirs = [d for d in os.listdir(root) if d.startswith("snapshot__usnap__")]
    assert len(snap_dirs) == 1, f"expected ONE shared snapshot table, got {snap_dirs}"

    # the derivation still applies at join time off the shared base table
    out = final.read(spark)
    bad = out.where(
        F.col("again_usnap_cnt_x2") != F.col("again_usnap_value_count_7d") * 2
    ).count()
    assert bad == 0, "derived column must track the shared base aggregate"

    from chronon_spark.sources.tableio import resolve_table

    snap = resolve_table(spark, root, snap_dirs[0])
    parts0 = snap.partitions()
    # serve days are shifted -1 from the left range
    assert min(parts0) == "2024-01-04" and max(parts0) == "2024-01-11"
    stamps0 = {d: (snap.lineage(d) or {}).get("written_at") for d in parts0}

    # resume: identical re-run must not rewrite any snapshot partition
    materialize_join(spark, left, {"usnap": events}, j, root, lo, hi, tiebreak="event_id")
    for d in parts0:
        assert (snap.lineage(d) or {}).get("written_at") == stamps0[d], d

    # range extension: old serve days untouched, new ones appended
    materialize_join(
        spark, left, {"usnap": events}, j, root, lo, "2024-01-15", tiebreak="event_id"
    )
    for d in parts0:
        assert (snap.lineage(d) or {}).get("written_at") == stamps0[d], d
    assert max(snap.partitions()) == "2024-01-14"


def test_snapshot_frame_join_plan_is_pure_equijoin(spark, events, tmp_path):
    """With a materialized snapshot frame (parquet-backed, as materialize_join
    serves it), the part plan is an equi-join + projection: NO temporal engine
    pass (no query/event millis columns, no range-join aggregation over the
    events source)."""
    from chronon_spark.operators.groupby import snapshot_events
    from chronon_spark.operators.join import compute_join_part

    gb = _snap_gb()
    base = GroupBy(
        name=gb.name, keys=gb.keys, aggregations=gb.aggregations,
        accuracy=Accuracy.SNAPSHOT, time_column=gb.time_column,
    )
    snap_path = str(tmp_path / "snap.parquet")
    snapshot_events(
        events, base, start_ds="2024-01-01", end_ds="2024-01-20", tiebreak="event_id"
    ).write.parquet(snap_path)
    snap = spark.read.parquet(snap_path)
    left = events.where(F.col("event_type") == "purchase").select("user_id", "ts")
    out = compute_join_part(
        left, events, JoinPart(group_by=gb), snapshot_frame=snap
    )
    plan = _plan(out)
    assert "__q_ts_ms" not in plan and "__e_ts_ms" not in plan, (
        "snapshot-frame path must not run the temporal engine"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and it is value-identical to the midnight-query path for left rows
    # whose serve day the snapshot range covers (ts on 2024-01-02..20)
    covered = left.where(
        F.date_format("ts", "yyyy-MM-dd").between("2024-01-02", "2024-01-20")
    )
    out_c = compute_join_part(
        covered, events, JoinPart(group_by=gb), snapshot_frame=snap
    )
    want = compute_join_part(
        covered, events, JoinPart(group_by=gb), tiebreak="event_id"
    )
    cols = ["user_id", "ts", "usnap_value_count_7d", "usnap_value_sum_1d",
            "usnap_value_last3_7d"]
    _assert_rows_close(
        _rows(out_c, cols), _rows(want, cols), "snapshot frame vs midnight query"
    )


@pytest.mark.parametrize("seed", [11, 29])
def test_snapshot_frame_random_differential(spark, seed):
    """Randomized sweep: equi-join over a materialized snapshot frame ==
    midnight temporal queries, over bursty skewed events with nulls and
    random windows (incl. lifetime) and random op mixes."""
    import datetime as dt
    import random

    from chronon_spark.operators.groupby import snapshot_events
    from chronon_spark.operators.join import compute_join_part
    from tests.test_random_differential import _random_events, _random_gb

    rng = random.Random(seed)
    ev = _random_events(spark, rng).cache()
    try:
        gb = _random_gb(rng)
        gb.accuracy = Accuracy.SNAPSHOT
        left = ev.sample(0.15, seed=seed).select("k", "ts")
        lo_ts, hi_ts = ev.agg(F.min("ts"), F.max("ts")).first()
        # serve range: [first event day - 1, last event day] in UTC
        lo_ds = (lo_ts.date() - dt.timedelta(days=1)).isoformat()
        hi_ds = hi_ts.date().isoformat()
        base = GroupBy(
            name=gb.name, keys=gb.keys, aggregations=gb.aggregations,
            accuracy=Accuracy.SNAPSHOT, time_column=gb.time_column,
        )
        snap = snapshot_events(
            ev, base, start_ds=lo_ds, end_ds=hi_ds, tiebreak="event_id"
        )
        part = JoinPart(group_by=gb)
        got = compute_join_part(left, ev, part, tiebreak="event_id", snapshot_frame=snap)
        want = compute_join_part(left, ev, part, tiebreak="event_id")
        cols = ["k", "ts", *[f"{gb.name}_{c}" for c in gb.output_columns()]]
        _assert_rows_close(
            _rows(got, cols), _rows(want, cols), f"seed={seed}: snapshot frame sweep"
        )
    finally:
        ev.unpersist()
