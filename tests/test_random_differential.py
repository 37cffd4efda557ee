"""Seeded randomized differential sweep over aggregation configurations.

The hand-picked configs in test_temporal_groupby.py cover each operator
once; this sweep samples random (op, window-set, k) combinations plus a
random synthetic event distribution (bursty keys, duplicate timestamps,
nulls) and asserts all three estimators (exact, hops, sliding) agree
bit-for-bit. Seeds are FIXED so failures reproduce; the generator varies
shape, not determinism.

Reference analog: the property sweep in
aggregator/src/test/scala/ai/chronon/aggregator/test/SawtoothAggregatorTest
(random event streams vs NaiveAggregator).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from chronon_spark import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.groupby import temporal_events

# ops the tile estimators support; (op, needs_k, input_col)
SWEEP_OPS = [
    (Op.COUNT, False, "value"),
    (Op.SUM, False, "value"),
    (Op.MIN, False, "value"),
    (Op.MAX, False, "value"),
    (Op.UNIQUE_COUNT, False, "etype"),
    (Op.LAST, False, "etype"),
    (Op.FIRST, False, "etype"),
    (Op.LAST_K, True, "etype"),
    (Op.TOP_K, True, "value"),
]

# hop-aligned window pool (whole multiples of their sawtooth tail hop)
WINDOW_POOL = [
    Window(30, TimeUnit.MINUTES),  # 5min hop
    Window(2, TimeUnit.HOURS),     # 5min hop
    Window(6, TimeUnit.HOURS),     # 5min hop
    Window(1, TimeUnit.DAYS),      # 1h hop
    Window(3, TimeUnit.DAYS),      # 1h hop
    Window(15, TimeUnit.DAYS),     # 1d hop
    None,                          # lifetime
]


def _random_gb(rng: random.Random) -> GroupBy:
    aggs = []
    for op, needs_k, col in rng.sample(SWEEP_OPS, k=rng.randint(3, 6)):
        wins = rng.sample([w for w in WINDOW_POOL if w is not None], k=rng.randint(1, 3))
        if rng.random() < 0.3:
            wins = None  # lifetime aggregation
        aggs.append(
            Aggregation(
                op,
                col,
                windows=tuple(wins) if wins else None,
                k=rng.randint(2, 5) if needs_k else None,
            )
        )
    return GroupBy(name=f"g{rng.randint(0, 9999)}", keys=["k"], aggregations=aggs)


def _random_events(spark, rng: random.Random):
    """Bursty synthetic stream: few hot keys, duplicate timestamps, nulls,
    events clustered at hop boundaries."""
    base_ms = 1_700_000_000_000  # fixed epoch anchor (determinism)
    rows = []
    eid = 0
    for _ in range(1200):
        k = rng.choice(["a", "a", "a", "b", "c", "d"])  # skew on 'a'
        day = rng.randint(0, 20)
        # half the events land exactly on 5-minute hop boundaries
        if rng.random() < 0.5:
            ms = base_ms + day * 86_400_000 + rng.randint(0, 287) * 300_000
        else:
            ms = base_ms + day * 86_400_000 + rng.randint(0, 86_399_999)
        if rng.random() < 0.1:
            ms = base_ms + day * 86_400_000  # duplicate-ts cluster at midnight
        val = None if rng.random() < 0.05 else round(rng.uniform(-50, 50), 2)
        et = None if rng.random() < 0.05 else rng.choice(["x", "y", "z"])
        rows.append((k, ms, val, et, eid))
        eid += 1
    df = spark.createDataFrame(rows, "k string, ts_ms long, value double, etype string, event_id long")
    return df.withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")


def _freeze(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((kk, _freeze(x)) for kk, x in v.items()))
    return v


@pytest.mark.parametrize("seed", [11, 42, 1337])
def test_random_config_estimators_agree(spark, seed):
    rng = random.Random(seed)
    ev = _random_events(spark, rng).cache()
    gb = _random_gb(rng)
    # queries: random event times (strict-< edges) + hop boundaries + times
    # with no prior events at all
    q = (
        ev.sample(0.15, seed=seed).select("k", "ts")
        .unionByName(
            ev.sample(0.05, seed=seed + 1).select(
                "k", F.to_timestamp(F.date_trunc("hour", "ts")).alias("ts")
            )
        )
        .distinct()
    )
    frames = {
        s: temporal_events(q, ev, gb, tiebreak="event_id", strategy=s)
        for s in ("exact", "hops", "sliding")
    }
    cols = sorted(frames["exact"].columns)
    rows = {
        s: sorted(
            (tuple(_freeze(v) for v in r) for r in df.select(*cols).collect()),
            key=str,
        )
        for s, df in frames.items()
    }
    assert rows["exact"] == rows["hops"], f"seed={seed}: hops != exact"
    assert rows["exact"] == rows["sliding"], f"seed={seed}: sliding != exact"
    ev.unpersist()


# ---------------------------------------------------------------------------
# join-orchestration sweep: a multi-part join routes same-(source, keys)
# TEMPORAL parts through ONE merged estimator pass (operators/join.py
# _merge_groups / _compute_merged_parts — agg slot dedup + prefixed fan-out);
# a single-part join takes the solo compute_join_part path. The two paths
# must agree column-for-column on every random configuration, and the join
# must preserve left duplicates.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [7, 23])
def test_random_join_orchestration_matches_solo_parts(spark, seed):
    from chronon_spark.api import Accuracy, Join, JoinPart
    from chronon_spark.operators.join import compute_join

    rng = random.Random(seed)
    ev = _random_events(spark, rng).cache()
    left = ev.sample(0.08, seed=seed).select(F.col("k").alias("uid"), "ts")
    dup = left.limit(5)
    left = left.unionByName(dup)  # duplicate left rows must be preserved

    parts, sources = [], {}
    for i in range(rng.randint(2, 4)):
        gb = _random_gb(rng)
        gb.name = f"gb{i}"
        if rng.random() < 0.25:
            gb.accuracy = Accuracy.SNAPSHOT  # not mergeable: solo branch
        parts.append(
            JoinPart(
                group_by=gb,
                key_mapping={"uid": "k"},
                prefix=rng.choice([None, f"p{i}"]),
            )
        )
        sources[gb.name] = ev
    j = Join(name="rj", left_keys=["uid"], join_parts=parts, time_column="ts")
    out = compute_join(left, sources, j, tiebreak="event_id").cache()

    assert out.count() == left.count(), f"seed={seed}: left rows not preserved"

    for part in parts:
        solo = compute_join(
            left.distinct(),
            {part.group_by.name: ev},
            Join(name="solo", left_keys=["uid"], join_parts=[part], time_column="ts"),
            tiebreak="event_id",
        )
        pcols = [
            f"{part.full_prefix()}_{c}" for c in part.group_by.output_columns()
        ]
        got = sorted(
            (tuple(_freeze(v) for v in r)
             for r in out.select("uid", "ts", *pcols).distinct().collect()),
            key=str,
        )
        want = sorted(
            (tuple(_freeze(v) for v in r)
             for r in solo.select("uid", "ts", *pcols).collect()),
            key=str,
        )
        assert got == want, f"seed={seed}: part {part.full_prefix()} != solo"
    out.unpersist()
    ev.unpersist()
