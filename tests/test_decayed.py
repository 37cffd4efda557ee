"""TIME_DECAYED_SUM / TIME_DECAYED_COUNT — recency-weighted aggregation.

Semantics: an event aged ``a`` whole halflives at query time contributes
weight 2^-min(a, decay_cap), a = floor(q/H) - floor(t/H) (bucket-quantized
age). Integer-exact on integral inputs: the engine sums value << (cap-age)
as int64 and divides by 2^cap once at finalize, so every estimator (exact
range join, hop-cascade tiles) and a naive python oracle agree bit-for-bit.

This op goes beyond the reference's 19 operations (api/thrift/api.thrift:
136-165) — it is the classic recency-feature primitive (decayed counts for
ranking) built on the same sawtooth/tile machinery.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import chronon_spark.operators.groupby as G
from chronon_spark.api import Accuracy, Aggregation, GroupBy, Op, TimeUnit, Window

DAY = 86_400_000
HOUR = 3_600_000
CAP = 20


def _data(n_users=6, n_events=150, seed=11, span_days=40):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for uid in range(n_users):
        for _ in range(n_events):
            ts = rng.randrange(0, span_days * DAY)
            rows.append((eid, uid, ts, rng.randrange(0, 1000)))
            eid += 1
    return rows


def _naive(rows, uid, qts, window_ms, halflife_ms, cap=CAP):
    """(decayed_count, decayed_sum) with the sawtooth tail of the window."""
    if window_ms is None:
        tail = None
    else:
        hop = HOUR if window_ms < 12 * DAY else DAY
        x = qts - window_ms
        tail = x - x % hop
    c = s = None
    for _eid, u, ts, v in rows:
        if u != uid or ts >= qts:
            continue
        if tail is not None and ts < tail:
            continue
        age = qts // halflife_ms - ts // halflife_ms
        w = 1 << (cap - min(age, cap))
        c = (c or 0) + w
        s = (s or 0) + v * w
    f = 1 << cap
    return (None if c is None else c / f, None if s is None else s / f)


@pytest.fixture(scope="module")
def frames(spark):
    rows = _data()
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts long, v long").cache()
    # every 3rd event time is a query point (deterministic — no limit())
    q = (
        ev.where(F.col("event_id") % 3 == 0)
        .select("user_id", "ts")
        .distinct()
        .cache()
    )
    return rows, ev, q


GB = GroupBy(
    name="dk",
    keys=["user_id"],
    aggregations=[
        Aggregation(
            Op.TIME_DECAYED_COUNT,
            "v",
            windows=(Window(7, TimeUnit.DAYS),),
            halflife=Window(1, TimeUnit.DAYS),
        ),
        Aggregation(
            Op.TIME_DECAYED_SUM,
            "v",
            windows=(Window(7, TimeUnit.DAYS), Window(30, TimeUnit.DAYS)),
            halflife=Window(1, TimeUnit.DAYS),
        ),
        # lifetime + a coarser halflife (2d divides every cascade resolution)
        Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=Window(2, TimeUnit.DAYS)),
        # mixed with a plain op to exercise shared passes
        Aggregation(Op.SUM, "v", windows=(Window(7, TimeUnit.DAYS),)),
    ],
)


def _collect(df):
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def test_estimators_agree_and_match_naive(frames):
    rows, ev, q = frames
    outs = {
        s: G.temporal_events(q, ev, GB, tiebreak="event_id", strategy=s)
        for s in ("exact", "hops", "auto")
    }
    collected = {s: _collect(df) for s, df in outs.items()}
    assert collected["exact"] == collected["hops"] == collected["auto"]
    # bit-exact vs the python oracle on every row (integer-scaled weights)
    cols = sorted(outs["exact"].columns)
    i = {c: cols.index(c) for c in cols}
    for row in collected["exact"]:
        uid, qts = row[i["user_id"]], row[i["ts"]]
        c7, s7 = _naive(rows, uid, qts, 7 * DAY, DAY)
        _, s30 = _naive(rows, uid, qts, 30 * DAY, DAY)
        _, slife = _naive(rows, uid, qts, None, 2 * DAY)
        assert row[i["v_time_decayed_count_hl1d_7d"]] == c7
        assert row[i["v_time_decayed_sum_hl1d_7d"]] == s7
        assert row[i["v_time_decayed_sum_hl1d_30d"]] == s30
        assert row[i["v_time_decayed_sum_hl2d"]] == slife


def test_unaligned_halflife_falls_back_to_exact(frames):
    rows, ev, q = frames
    # 7h halflife: 7h % 1h != 0, so the cascade cannot tile it for a 7d
    # window (levels 1h+5m) — 'auto'/'hops' must transparently fall back to
    # the exact estimator and still produce identical results
    gb = GroupBy(
        name="dk7h",
        keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM,
                "v",
                windows=(Window(7, TimeUnit.DAYS),),
                halflife=Window(7, TimeUnit.HOURS),
            )
        ],
    )
    a = _collect(G.temporal_events(q, ev, gb, strategy="exact"))
    b = _collect(G.temporal_events(q, ev, gb, strategy="auto"))
    assert a == b
    for row, (uid, qts) in zip(
        a, [(r[1], r[0]) for r in a]
    ):  # cols sorted: ts, user_id, v_...
        _, s = _naive(rows, uid, qts, 7 * DAY, 7 * HOUR)
        assert row[2] == s


def test_aligned_12h_halflife_rides_tiles(frames):
    rows, ev, q = frames
    # 12h % 1h == 0 and a 7d window uses 1h+5m levels only -> tiled OK
    gb = GroupBy(
        name="dk12h",
        keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_COUNT,
                "v",
                windows=(Window(7, TimeUnit.DAYS),),
                halflife=Window(12, TimeUnit.HOURS),
            )
        ],
    )
    a = _collect(G.temporal_events(q, ev, gb, strategy="exact"))
    b = _collect(G.temporal_events(q, ev, gb, strategy="hops"))
    assert a == b
    for row in a:
        c, _ = _naive(rows, row[1], row[0], 7 * DAY, 12 * HOUR)
        assert row[2] == c


def test_leakage_and_empty(spark):
    ev = spark.createDataFrame(
        [(1, 10, 1000, 5), (2, 20, 2000, 7)], "event_id long, user_id long, ts long, v long"
    )
    q = spark.createDataFrame([(10, 1000), (30, 5000)], "user_id long, ts long")
    gb = GroupBy(
        name="dkl",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=Window(1, TimeUnit.DAYS))
        ],
    )
    for s in ("exact", "hops"):
        got = {
            r["user_id"]: r["v_time_decayed_sum_hl1d"]
            for r in G.temporal_events(q, ev, gb, strategy=s).collect()
        }
        # user 10's only event is AT the query ts: strict < excludes it
        assert got[10] is None
        # user 30 has no events at all
        assert got[30] is None


def test_decayed_average_via_derivation(frames):
    rows, ev, q = frames
    gb = GroupBy(
        name="dkavg",
        keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM,
                "v",
                windows=(Window(7, TimeUnit.DAYS),),
                halflife=Window(1, TimeUnit.DAYS),
            ),
            Aggregation(
                Op.TIME_DECAYED_COUNT,
                "v",
                windows=(Window(7, TimeUnit.DAYS),),
                halflife=Window(1, TimeUnit.DAYS),
            ),
        ],
        derivations={
            "*": "*",  # keep the base features alongside the derived EWMA
            "v_ewma_7d": "v_time_decayed_sum_hl1d_7d / v_time_decayed_count_hl1d_7d"
        },
    )
    out = G.temporal_events(q, ev, gb, strategy="auto")
    for r in out.collect():
        c, s = (
            r["v_time_decayed_count_hl1d_7d"],
            r["v_time_decayed_sum_hl1d_7d"],
        )
        if c is None:
            assert r["v_ewma_7d"] is None
        else:
            assert r["v_ewma_7d"] == pytest.approx(s / c)


def test_snapshot_events_decayed(spark):
    # EOD semantics: snapshot at ds == temporal query at next midnight
    ev = spark.createDataFrame(
        [(1, 5, 100, 10), (2, 5, DAY + 100, 20)],
        "event_id long, user_id long, ts long, v long",
    )
    gb = GroupBy(
        name="dks",
        keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM,
                "v",
                windows=(Window(14, TimeUnit.DAYS),),
                halflife=Window(1, TimeUnit.DAYS),
            )
        ],
        accuracy=Accuracy.SNAPSHOT,
    )
    out = {
        (r["user_id"], r["ds"]): r["v_time_decayed_sum_hl1d_14d"]
        for r in G.snapshot_events(ev, gb).collect()
    }
    # day 0 EOD (q = 1*DAY): event day0 age floor(1d/1d)-0 = 1 -> w = 1/2
    assert out[(5, "1970-01-01")] == 10 / 2
    # day 1 EOD (q = 2*DAY): ages 2 and 1 -> 10/4 + 20/2
    assert out[(5, "1970-01-02")] == 10 / 4 + 20 / 2


def test_validation_errors(spark):
    ev = spark.createDataFrame([(1, 1, 100, 1)], "event_id long, user_id long, ts long, v long")
    q = spark.createDataFrame([(1, 200)], "user_id long, ts long")
    no_hl = GroupBy(
        name="bad1",
        keys=["user_id"],
        aggregations=[Aggregation(Op.TIME_DECAYED_SUM, "v")],
    )
    with pytest.raises(ValueError, match="requires halflife"):
        G.temporal_events(q, ev, no_hl, strategy="exact").collect()
    bad_cap = GroupBy(
        name="bad2",
        keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM,
                "v",
                halflife=Window(1, TimeUnit.DAYS),
                decay_cap=63,
            )
        ],
    )
    with pytest.raises(ValueError, match="decay_cap"):
        G.temporal_events(q, ev, bad_cap, strategy="exact").collect()


def test_serving_decayed_halflife_misaligned_rejected(spark):
    """Serving requires the halflife to be a whole multiple of each
    window's tail hop (tail tiles must sit inside one halflife bucket);
    90min vs a 7d window's 1h hop is not."""
    from chronon_spark.operators.upload import upload_batch_irs

    ev = spark.createDataFrame([(1, 1, 100, 1)], "event_id long, user_id long, ts long, v long")
    gb = GroupBy(
        name="dkserve",
        keys=["user_id"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM,
                "v",
                windows=(Window(7, TimeUnit.DAYS),),
                halflife=Window(90, TimeUnit.MINUTES),
            )
        ],
    )
    with pytest.raises(ValueError, match="whole multiple"):
        upload_batch_irs(ev, gb, batch_end_ds="1970-01-05")


def test_weight_cap_and_exact_pow(spark):
    # pow(2, k) cast long must be exactly 1 << k for the whole cap range,
    # and ages past the cap must clamp (weight floor, no further decay)
    from chronon_spark.functions.ops import decayed_weight

    agg = Aggregation(
        Op.TIME_DECAYED_COUNT, "v", halflife=Window(1, TimeUnit.DAYS), decay_cap=40
    )
    df = spark.range(0, 64).select(
        (F.lit(50 * DAY) + F.lit(10)).alias("q"),
        (F.lit(50 * DAY) - F.col("id") * DAY).alias("t"),
        F.col("id").alias("age"),
    )
    got = {
        r["age"]: r["w"]
        for r in df.select(
            "age", decayed_weight(agg, F.col("q"), F.col("t")).alias("w")
        ).collect()
    }
    for age in range(64):
        assert got[age] == 1 << (40 - min(age, 40))


DAY10 = 1704844800000  # 2024-01-10 00:00:00 UTC
DAY11 = DAY10 + DAY


def test_cdc_decayed(spark):
    """TIME_DECAYED over a mutation (CDC) source: signed weighted sums — a
    reversal cancels its insert at the insert's OWN age weight exactly."""
    from chronon_spark.operators.mutations import temporal_entities

    snap = spark.createDataFrame(
        [
            ("a", 10.0, DAY10 + 8 * HOUR, "2024-01-10"),
            ("a", 20.0, DAY10 + 9 * HOUR, "2024-01-10"),
        ],
        "k string, v double, ets long, ds string",
    ).select("k", "v", F.timestamp_millis("ets").alias("ts"), "ds")
    mut = spark.createDataFrame(
        [
            ("a", 30.0, DAY11 + 10 * HOUR, DAY11 + 10 * HOUR, False, "2024-01-11"),
            ("a", 20.0, DAY10 + 9 * HOUR, DAY11 + 11 * HOUR, True, "2024-01-11"),
        ],
        "k string, v double, ets long, mts long, is_before boolean, ds string",
    ).select(
        "k", "v",
        F.timestamp_millis("ets").alias("ts"),
        F.timestamp_millis("mts").alias("mutation_ts"),
        "is_before", "ds",
    )
    q = spark.createDataFrame(
        [("a", DAY11 + 10 * HOUR + 1800_000), ("a", DAY11 + 12 * HOUR)],
        "k string, qts long",
    ).select("k", F.timestamp_millis("qts").alias("ts"), "qts")
    gb = GroupBy(
        name="mdk",
        keys=["k"],
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM, "v",
                windows=(Window(7, TimeUnit.DAYS),), halflife=Window(1, TimeUnit.DAYS),
            ),
            Aggregation(
                Op.TIME_DECAYED_COUNT, "v",
                windows=(Window(7, TimeUnit.DAYS),), halflife=Window(1, TimeUnit.DAYS),
            ),
        ],
    )
    rows = {
        r["qts"]: r
        for r in temporal_entities(q, snap, mut, gb, left_time_column="ts").collect()
    }
    # 10:30 Jan11 (insert visible, reversal not yet): {10, 20}@age1, {30}@age0
    assert rows[DAY11 + 10 * HOUR + 1800_000]["v_time_decayed_sum_hl1d_7d"] == 45.0
    assert rows[DAY11 + 10 * HOUR + 1800_000]["v_time_decayed_count_hl1d_7d"] == 2.0
    # 12:00 Jan11 (reversal visible): 20 cancelled at ITS age-1 weight
    assert rows[DAY11 + 12 * HOUR]["v_time_decayed_sum_hl1d_7d"] == 35.0
    assert rows[DAY11 + 12 * HOUR]["v_time_decayed_count_hl1d_7d"] == 1.5


def test_cdc_decayed_lifetime_rejected(spark):
    from chronon_spark.operators.mutations import temporal_entities

    snap = spark.createDataFrame(
        [("a", 1.0, DAY10, "2024-01-10")], "k string, v double, ets long, ds string"
    ).select("k", "v", F.timestamp_millis("ets").alias("ts"), "ds")
    mut = spark.createDataFrame(
        [], "k string, v double, ts timestamp, mutation_ts timestamp, is_before boolean, ds string"
    )
    q = spark.createDataFrame([("a", DAY11)], "k string, qts long").select(
        "k", F.timestamp_millis("qts").alias("ts")
    )
    gb = GroupBy(
        name="mdkl",
        keys=["k"],
        aggregations=[
            Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=Window(1, TimeUnit.DAYS))
        ],
    )
    with pytest.raises(ValueError, match="requires a window"):
        temporal_entities(q, snap, mut, gb, left_time_column="ts").collect()


def test_analyzer_validates_decayed(spark):
    from chronon_spark.operators.analyzer import validate_group_by

    ev = spark.createDataFrame(
        [(1, 1, 100, 1.0, "x")], "event_id long, user_id long, ts long, v double, s string"
    )
    gb = GroupBy(
        name="an",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.TIME_DECAYED_SUM, "v"),  # missing halflife
            Aggregation(
                Op.TIME_DECAYED_SUM, "s", halflife=Window(1, TimeUnit.DAYS)
            ),  # non-numeric input
            Aggregation(
                Op.TIME_DECAYED_COUNT, "v",
                halflife=Window(1, TimeUnit.DAYS), decay_cap=99,
            ),  # bad cap
        ],
    )
    codes = {e.code for e in validate_group_by(ev, gb, check_data=False)}
    assert {"missing_halflife", "bad_input_type", "bad_decay_cap"} <= codes


def test_decayed_and_moments_through_compute_join(spark):
    """Join-level integration: two parts sharing one source, one carrying
    TIME_DECAYED + SKEW (struct/tile-merged IRs) — the shared-estimator
    merge-group path must produce exactly what per-part temporal_events
    produces, with prefixed columns."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators.join import compute_join

    rng = random.Random(23)
    rows = [
        (i, i % 4, rng.randrange(0, 20 * DAY), float(rng.randrange(0, 500)))
        for i in range(300)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts long, v double")
    left = ev.where(F.col("event_id") % 5 == 0).select("user_id", "ts").distinct()
    w7 = (Window(7, TimeUnit.DAYS),)
    gb_a = GroupBy(
        name="dkj_a",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "v", windows=w7),
            Aggregation(
                Op.TIME_DECAYED_SUM, "v", windows=w7, halflife=Window(1, TimeUnit.DAYS)
            ),
            Aggregation(Op.SKEW, "v", windows=w7),
        ],
    )
    gb_b = GroupBy(
        name="dkj_b",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "v", windows=w7)],
    )
    join = Join(
        name="dkj",
        left_keys=["user_id"],
        join_parts=[JoinPart(group_by=gb_a), JoinPart(group_by=gb_b)],
    )
    out = compute_join(left, {"dkj_a": ev, "dkj_b": ev}, join)
    solo_a = G.temporal_events(left, ev, gb_a, strategy="auto")
    got = {(r["user_id"], r["ts"]): r.asDict() for r in out.collect()}
    want = {(r["user_id"], r["ts"]): r.asDict() for r in solo_a.collect()}
    assert got.keys() == want.keys() and len(got) > 0
    for k in got:
        assert got[k]["dkj_a_v_count_7d"] == want[k]["v_count_7d"]
        assert got[k]["dkj_a_v_time_decayed_sum_hl1d_7d"] == want[k]["v_time_decayed_sum_hl1d_7d"]
        ga, wa = got[k]["dkj_a_v_skew_7d"], want[k]["v_skew_7d"]
        assert (ga is None and wa is None) or abs(ga - wa) <= 1e-9 * max(1, abs(wa))


DAY = 86_400_000
HOUR = 3_600_000


def _naive_forward_decayed(q_ms, evs, h_ms, cap, horizon, shift):
    """Python oracle for decay-by-lead-time labels: events in the sawtooth
    horizon (strict head at q; far end rounded on the shifted negated axis
    exactly as the engine rounds it) weighted by 2^-min(age, cap) with
    FORWARD age = floor(t/H) - floor(q/H)."""
    hop = horizon.tail_hop_millis()
    far = shift - hop * ((shift - q_ms - horizon.millis) // hop)
    total = 0
    for t_ms, v in evs:
        if q_ms < t_ms <= far:
            age = min(t_ms // h_ms - q_ms // h_ms, cap)
            total += v * 2 ** (cap - age)
    return total / 2**cap


def test_label_join_forward_decayed_matches_naive(spark):
    """Decay-by-lead-time labels: engine == python oracle, including
    halflife-boundary-aligned events where the un-shifted reflected axis
    would bucket wrong."""
    from chronon_spark.operators.bootstrap import label_join

    h = Window(1, TimeUnit.DAYS)
    horizon = Window(3, TimeUnit.DAYS)
    evs = {
        1: [(1 * DAY, 10), (1 * DAY + HOUR, 5), (2 * DAY, 3), (3 * DAY + HOUR, 7),
            (5 * DAY, 100)],  # beyond horizon of the early queries
        2: [(2 * DAY, 4), (2 * DAY + 2 * HOUR, 6), (4 * DAY, 8)],
    }
    qs = {1: [HOUR, 1 * DAY], 2: [DAY + HOUR]}
    feats = spark.createDataFrame(
        [(u, q) for u, qq in qs.items() for q in qq], "user_id long, ts long"
    )
    lab = spark.createDataFrame(
        [(u, t, v) for u, ee in evs.items() for t, v in ee],
        "user_id long, ts long, v long",
    )
    gb = GroupBy(
        name="lbl",
        keys=["user_id"],
        aggregations=[Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=h)],
    )
    out = label_join(feats, lab, gb, horizon=horizon, tiebreak="v")
    col = f"label_{gb.aggregations[0].output_name(horizon, None)}"
    assert col in out.columns
    shift = h.millis - 1
    for r in out.collect():
        want = _naive_forward_decayed(
            r["ts"], evs[r["user_id"]], h.millis, 20, horizon, shift
        )
        got = r[col] or 0.0
        assert abs(got - want) <= 1e-9 * max(1.0, abs(want)), (
            r["user_id"], r["ts"], got, want,
        )


def test_label_decayed_boundary_is_forward_bucketed(spark):
    """q off-boundary, label event exactly ON a halflife boundary: forward
    age = floor(t/H) - floor(q/H) = 1 (weight 1/2). The mirrored reflected
    axis (ceil buckets) would give age 0 (weight 1) — this pins the shift
    fix."""
    from chronon_spark.operators.bootstrap import label_join

    feats = spark.createDataFrame([(1, HOUR)], "user_id long, ts long")
    lab = spark.createDataFrame([(1, DAY, 8)], "user_id long, ts long, v long")
    gb = GroupBy(
        name="lbl",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=Window(1, TimeUnit.DAYS))
        ],
    )
    out = label_join(feats, lab, gb, horizon=Window(3, TimeUnit.DAYS))
    col = f"label_{gb.aggregations[0].output_name(Window(3, TimeUnit.DAYS), None)}"
    (r,) = out.collect()
    assert r[col] == 4.0  # 8 * 2^-1, NOT 8.0


def test_label_decayed_mixed_plain_two_halflives_and_derivation(spark):
    """One label GroupBy mixing a plain COUNT, decayed aggs at TWO
    halflives (two engine passes), and an EWMA derivation across the
    1d-halflife pair — all land on one feature row."""
    from chronon_spark.operators.bootstrap import label_join

    h1, h2 = Window(1, TimeUnit.DAYS), Window(2, TimeUnit.DAYS)
    horizon = Window(3, TimeUnit.DAYS)
    evs = [(1 * DAY, 10), (2 * DAY + HOUR, 6), (3 * DAY, 2)]
    feats = spark.createDataFrame([(1, HOUR)], "user_id long, ts long")
    lab = spark.createDataFrame(
        [(1, t, v) for t, v in evs], "user_id long, ts long, v long"
    )
    gb = GroupBy(
        name="lbl",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "v"),
            Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=h1),
            Aggregation(Op.TIME_DECAYED_COUNT, "v", halflife=h1),
            Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=h2),
        ],
        derivations={
            "*": "*",
            "lead_ewma": "v_time_decayed_sum_hl1d_3d / v_time_decayed_count_hl1d_3d",
        },
    )
    out = label_join(feats, lab, gb, horizon=horizon)
    (r,) = out.collect()
    assert r["label_v_count_3d"] == 3
    s1 = _naive_forward_decayed(HOUR, evs, h1.millis, 20, horizon, h1.millis - 1)
    c1 = _naive_forward_decayed(
        HOUR, [(t, 1) for t, _ in evs], h1.millis, 20, horizon, h1.millis - 1
    )
    s2 = _naive_forward_decayed(HOUR, evs, h2.millis, 20, horizon, h2.millis - 1)
    assert abs(r["label_v_time_decayed_sum_hl1d_3d"] - s1) <= 1e-9
    assert abs(r["label_v_time_decayed_sum_hl2d_3d"] - s2) <= 1e-9
    assert abs(r["label_lead_ewma"] - s1 / c1) <= 1e-9


def test_label_decayed_requires_halflife(spark):
    from chronon_spark.operators.bootstrap import label_join

    feats = spark.createDataFrame([(1, 100)], "user_id long, ts long")
    lab = spark.createDataFrame([(1, 200, 1.0)], "user_id long, ts long, v double")
    gb = GroupBy(
        name="lbl",
        keys=["user_id"],
        aggregations=[Aggregation(Op.TIME_DECAYED_SUM, "v")],
    )
    with pytest.raises(ValueError, match="halflife"):
        label_join(feats, lab, gb, horizon=Window(3, TimeUnit.DAYS))
