"""Materialized join backfill: per-part intermediate tables, value parity
with the in-memory orchestrator, and partition-checkpoint resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
from chronon_spark.operators.join import compute_join, materialize_join


def _join_def():
    gb_user = GroupBy(
        name="user_stats",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    gb_type = GroupBy(
        name="type_stats",
        keys=["event_type"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(Window(1, TimeUnit.DAYS),))],
    )
    return Join(
        name="mj",
        left_keys=["user_id", "etype"],
        join_parts=[
            JoinPart(group_by=gb_user),
            JoinPart(group_by=gb_type, key_mapping={"etype": "event_type"}, prefix="ctx"),
        ],
    )


def test_join_semantic_hash_stability_and_invalidation():
    from chronon_spark.operators.join import join_semantic_hash

    j1, j2 = _join_def(), _join_def()
    assert join_semantic_hash(j1) == join_semantic_hash(j2)  # definition-stable
    j2.join_parts[0].group_by.aggregations = [
        Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))
    ]
    assert join_semantic_hash(j1) != join_semantic_hash(j2)  # window change invalidates
    j3 = _join_def()
    j3.derivations["extra"] = "user_stats_value_count_7d * 2"
    assert join_semantic_hash(j1) != join_semantic_hash(j3)  # derivation invalidates


def test_materialize_join_matches_compute_join(spark, events, tmp_path):
    j = _join_def()
    left = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .withColumn("etype", F.lit("click"))
    )
    sources = {"user_stats": events, "type_stats": events}
    lo, hi = "2024-01-01", "2024-01-20"
    final, parts = materialize_join(
        spark, left, sources, j, str(tmp_path / "mj"), lo, hi, tiebreak="event_id"
    )
    assert set(parts) == {"user_stats", "ctx_type_stats"}
    got_df = final.read(spark)

    want_df = compute_join(left, sources, j, tiebreak="event_id").where(
        F.date_format("ts", "yyyy-MM-dd").between(lo, hi)
    )
    cols = [
        "user_id",
        "ts",
        "user_stats_value_count_7d",
        "ctx_type_stats_value_sum_1d",
    ]

    def keyed(df):
        return sorted(
            (
                (r[0], r[1], r[2], None if r[3] is None else round(r[3], 6))
                for r in df.select(*cols).collect()
            ),
            key=repr,
        )

    assert keyed(got_df) == keyed(want_df)
    assert len(keyed(got_df)) > 0


def test_materialize_join_resumes_from_partitions(spark, events, tmp_path):
    j = _join_def()
    left = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .withColumn("etype", F.lit("click"))
    )
    sources = {"user_stats": events, "type_stats": events}
    root = str(tmp_path / "mj2")
    materialize_join(spark, left, sources, j, root, "2024-01-01", "2024-01-10", tiebreak="event_id")
    final, parts = materialize_join(
        spark, left, sources, j, root, "2024-01-01", "2024-01-10", tiebreak="event_id"
    )
    # second run: every partition already present with a matching semantic
    # hash -> zero recompute (lineage written_at timestamps unchanged)
    for t in [final, *parts.values()]:
        assert t.partitions()  # populated
    # changing the definition invalidates: a new window -> new semantic hash
    j2 = _join_def()
    j2.join_parts[0].group_by.aggregations = [
        Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))
    ]
    final2, parts2 = materialize_join(
        spark, left, sources, j2, root, "2024-01-01", "2024-01-10", tiebreak="event_id"
    )
    sample = parts2["user_stats"].read(spark)
    assert "user_stats_value_count_1d" in sample.columns


def test_part_checkpoint_invalidates_on_skew_key_change(spark, events, tmp_path):
    """Changing Join.skew_keys must recompute part tables: rows computed
    under a different exclusion are stale even though the GroupBy itself is
    unchanged (the part checkpoint hash carries the mapped exclusion)."""
    from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
    from chronon_spark.operators.join import materialize_join

    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    left = events.where("event_type = 'purchase'").select("user_id", "ts").distinct()
    hot = left.select("user_id").first()["user_id"]
    root = str(tmp_path / "mj")

    def run(skew):
        j = Join(name="skj", left_keys=["user_id"],
                 join_parts=[JoinPart(group_by=gb)], skew_keys=skew)
        final, _ = materialize_join(
            spark, left, {"g": events}, j, root, "2024-01-02", "2024-01-20",
            tiebreak="event_id", step_days=30,
        )
        return final

    run({"user_id": [hot]})
    # with the exclusion, the hot user contributes no rows at all
    final = run({})  # exclusion removed -> everything must recompute
    out = final.read(spark)
    hot_rows = out.where(F.col("user_id") == hot)
    assert hot_rows.count() > 0
    assert hot_rows.where(F.col("g_value_count_7d").isNotNull()).count() > 0


def test_join_left_long_millis_time_column(spark, events, tmp_path):
    """materialize_join_left must honor the long-epoch-millis ts contract:
    a bigint fed straight to date_format is cast as SECONDS (year-57000 day
    strings) and every partition would come out empty."""
    from chronon_spark.operators.join import materialize_join_left

    gb = GroupBy(
        name="ml_gb",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))],
    )
    join = Join(name="mlj", left_keys=["user_id"], join_parts=[JoinPart(group_by=gb)])
    left_ms = events.select(
        "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts")
    )
    lo = events.select(F.date_format(F.min("ts"), "yyyy-MM-dd")).first()[0]
    hi = events.select(
        F.date_format(F.date_add(F.min("ts"), 2), "yyyy-MM-dd")
    ).first()[0]
    table = materialize_join_left(
        spark, left_ms, join, str(tmp_path / "ml"), lo, hi
    )
    parts = table.partitions()
    assert parts and parts[0] == lo, f"bad partitions {parts}"
    got = table.read_range(spark, lo, hi)
    want = left_ms.where(
        F.date_format(F.timestamp_millis("ts"), "yyyy-MM-dd").between(lo, hi)
    )
    assert got.count() == want.count() > 0


@pytest.mark.parametrize("seed,step_days", [(13, 1), (29, 3)])
def test_random_config_chunked_backfill_matches_compute_join(
    spark, tmp_path, seed, step_days
):
    """Randomized chunked-backfill sweep: materialize_join at small step_days
    (many chunk boundaries; each chunk narrows its events scan to
    [lo - max_window, hi)) must equal the in-memory compute_join for random
    window sets — including lifetime aggregations, where narrowing must be
    disabled (max_window_millis None) or history would be silently lost."""
    import random

    from test_random_differential import (
        _assert_rows_close,
        _freeze,
        _random_events,
        _random_gb,
    )

    rng = random.Random(seed)
    ev = _random_events(spark, rng).cache()
    parts, sources = [], {}
    for i in range(2):
        gb = _random_gb(rng)
        gb.name = f"cb{i}"
        parts.append(JoinPart(group_by=gb, key_mapping={"uid": "k"}))
        sources[gb.name] = ev
    j = Join(name=f"cbj{seed}", left_keys=["uid"], join_parts=parts, time_column="ts")
    left = ev.sample(0.1, seed=seed).select(F.col("k").alias("uid"), "ts").distinct()

    days = [
        r["d"]
        for r in ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .distinct().orderBy("d").collect()
    ]
    lo, hi = days[2], days[-2]  # start mid-history: windows reach back before lo

    from chronon_spark.operators.join import materialize_join

    final, _pt = materialize_join(
        spark, left, sources, j, str(tmp_path / "cb"), lo, hi,
        tiebreak="event_id", step_days=step_days,
    )
    got_df = final.read(spark).drop("ds")
    want_df = compute_join(left, sources, j, tiebreak="event_id").where(
        F.date_format("ts", "yyyy-MM-dd").between(lo, hi)
    )
    cols = sorted(want_df.columns)
    key = lambda r: (str(r[cols.index("uid")]), str(r[cols.index("ts")]))  # noqa: E731
    got = sorted(
        (tuple(_freeze(v) for v in r) for r in got_df.select(*cols).collect()), key=key
    )
    want = sorted(
        (tuple(_freeze(v) for v in r) for r in want_df.select(*cols).collect()), key=key
    )
    assert len(want) > 0
    _assert_rows_close(got, want, f"seed={seed} step={step_days}: chunked vs memory")
    ev.unpersist()
