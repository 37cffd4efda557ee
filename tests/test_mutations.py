"""Entity-mutation (CDC) temporal engine tests — the reference's
MutationsTest pattern (spark/src/test/scala/ai/chronon/spark/test/
MutationsTest.scala): hand-crafted snapshot + insert/reversal rows with
before/after assertions at exact boundaries, plus a differential check of
the snapshot/day-mutation decomposition against a full-log signed oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.mutations import temporal_entities

H = 3_600_000
DAY10 = 1704844800000  # 2024-01-10 00:00:00 UTC
DAY11 = DAY10 + 24 * H


def _ts(ms):
    return F.timestamp_millis(F.lit(ms))


@pytest.fixture(scope="module")
def cdc(spark):
    # snapshot partition 2024-01-10: entity state at END of Jan 10
    snap = spark.createDataFrame(
        [
            ("a", 10.0, DAY10 + 8 * H, "2024-01-10"),
            ("a", 20.0, DAY10 + 9 * H, "2024-01-10"),
            ("b", 5.0, DAY10 - 1 * H, "2024-01-10"),
        ],
        "k string, v double, ets long, ds string",
    ).select("k", "v", F.timestamp_millis("ets").alias("ts"), "ds")
    # day-11 mutations: one insert, one reversal of a snapshot row, one
    # insert on the other key
    mut = spark.createDataFrame(
        [
            ("a", 30.0, DAY11 + 10 * H, DAY11 + 10 * H, False, "2024-01-11"),
            ("a", 20.0, DAY10 + 9 * H, DAY11 + 11 * H, True, "2024-01-11"),
            ("b", 7.0, DAY11 + 12 * H, DAY11 + 12 * H, False, "2024-01-11"),
        ],
        "k string, v double, ets long, mts long, is_before boolean, ds string",
    ).select(
        "k",
        "v",
        F.timestamp_millis("ets").alias("ts"),
        F.timestamp_millis("mts").alias("mutation_ts"),
        "is_before",
        "ds",
    )
    return snap, mut


def _run(spark, cdc, queries_ms, aggs):
    snap, mut = cdc
    q = spark.createDataFrame(queries_ms, "k string, qts long").select(
        "k", F.timestamp_millis("qts").alias("ts"), F.col("qts")
    )
    gb = GroupBy(name="m", keys=["k"], aggregations=aggs)
    out = temporal_entities(q, snap, mut, gb, left_time_column="ts")
    return {(r["k"], r["qts"]): r for r in out.collect()}


def test_mutation_visibility_boundaries(spark, cdc):
    aggs = [Aggregation(Op.COUNT, "v"), Aggregation(Op.SUM, "v")]
    rows = _run(
        spark,
        cdc,
        [
            ("a", DAY11 + 9 * H),  # before any day-11 mutation
            ("a", DAY11 + 10 * H),  # AT the insert instant: not yet visible
            ("a", DAY11 + 10 * H + 1),  # just after: visible
            ("a", DAY11 + 11 * H + 1),  # after the reversal: 20 deleted
            ("b", DAY11 + 13 * H),
        ],
        aggs,
    )
    assert rows[("a", DAY11 + 9 * H)]["v_count"] == 2
    assert rows[("a", DAY11 + 9 * H)]["v_sum"] == 30.0
    # strict <: mutation at exactly query ts is unseen
    assert rows[("a", DAY11 + 10 * H)]["v_count"] == 2
    assert rows[("a", DAY11 + 10 * H + 1)]["v_count"] == 3
    assert rows[("a", DAY11 + 10 * H + 1)]["v_sum"] == 60.0
    # reversal deletes the snapshot row's contribution
    assert rows[("a", DAY11 + 11 * H + 1)]["v_count"] == 2
    assert rows[("a", DAY11 + 11 * H + 1)]["v_sum"] == 40.0
    assert rows[("b", DAY11 + 13 * H)]["v_count"] == 2
    assert rows[("b", DAY11 + 13 * H)]["v_sum"] == 12.0


def test_windowed_mutation_mask(spark, cdc):
    """Windowed aggs mask contributions by the ROW's event time with the
    sawtooth tail (1d window -> 1h hop), independent of mutation time."""
    w1d = (Window(1, TimeUnit.DAYS),)
    rows = _run(
        spark,
        cdc,
        [("a", DAY11 + 9 * H), ("a", DAY11 + 11 * H + 30 * 60000)],
        [Aggregation(Op.COUNT, "v", windows=w1d), Aggregation(Op.SUM, "v", windows=w1d)],
    )
    # q = Jan11 09:00, tail = Jan10 09:00: row@08:00 out, row@09:00 in
    assert rows[("a", DAY11 + 9 * H)]["v_count_1d"] == 1
    assert rows[("a", DAY11 + 9 * H)]["v_sum_1d"] == 20.0
    # q = Jan11 11:30, tail = Jan10 11:00: both snapshot rows out of window;
    # the reversal of row@09:00 is also masked out (no double-delete);
    # insert@Jan11 10:00 in window
    k = ("a", DAY11 + 11 * H + 30 * 60000)
    assert rows[k]["v_count_1d"] == 1
    assert rows[k]["v_sum_1d"] == 30.0


def test_average_variance_and_empty(spark, cdc):
    rows = _run(
        spark,
        cdc,
        [("a", DAY11 + 12 * H), ("c", DAY11 + 12 * H)],
        [
            Aggregation(Op.AVERAGE, "v"),
            Aggregation(Op.VARIANCE, "v"),
            Aggregation(Op.COUNT, "v"),
        ],
    )
    # a @12:00: rows {10, 30} -> avg 20, var_pop 100
    assert rows[("a", DAY11 + 12 * H)]["v_average"] == pytest.approx(20.0)
    assert rows[("a", DAY11 + 12 * H)]["v_variance"] == pytest.approx(100.0)
    # unseen key: count 0, avg null
    assert rows[("c", DAY11 + 12 * H)]["v_count"] == 0
    assert rows[("c", DAY11 + 12 * H)]["v_average"] is None


def test_non_deletable_op_rejected(spark, cdc):
    snap, mut = cdc
    q = spark.createDataFrame([("a", DAY11)], "k string, qts long").select(
        "k", F.timestamp_millis("qts").alias("ts")
    )
    gb = GroupBy(name="m", keys=["k"], aggregations=[Aggregation(Op.LAST, "v")])
    with pytest.raises(ValueError, match="not deletable"):
        temporal_entities(q, snap, mut, gb, left_time_column="ts")


def test_mutation_plan_shape(spark, cdc):
    """No cartesian product / nested-loop join anywhere in the CDC plan:
    both contribution branches are (key, day) equi-joins."""
    snap, mut = cdc
    q = spark.createDataFrame([("a", DAY11 + 9 * H)], "k string, qts long").select(
        "k", F.timestamp_millis("qts").alias("ts")
    )
    gb = GroupBy(name="m", keys=["k"], aggregations=[Aggregation(Op.SUM, "v")])
    out = temporal_entities(q, snap, mut, gb, left_time_column="ts")
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_equals_unsalted(spark, cdc):
    """Salting the (key, day) join cells must not change any value."""
    aggs = [Aggregation(Op.COUNT, "v"), Aggregation(Op.SUM, "v")]
    qs = [("a", DAY11 + 9 * H), ("a", DAY11 + 10 * H + 1), ("a", DAY11 + 11 * H + 1), ("b", DAY11 + 13 * H)]
    snap, mut = cdc
    q = spark.createDataFrame(qs, "k string, qts long").select(
        "k", F.timestamp_millis("qts").alias("ts"), F.col("qts")
    )
    gb = GroupBy(name="m", keys=["k"], aggregations=aggs)
    plain = temporal_entities(q, snap, mut, gb, left_time_column="ts")
    salted = temporal_entities(q, snap, mut, gb, left_time_column="ts", n_salts=4)
    key = lambda df: sorted(map(tuple, df.collect()), key=repr)  # noqa: E731
    assert key(plain) == key(salted)


def test_decomposition_matches_full_log_oracle(spark, events):
    """Differential: snapshot + day-mutation decomposition over a CDC log
    synthesized from the events table must equal the full-log signed scan
    (every insert with mts < q minus every reversal with mts < q)."""
    h2 = 7_200_000
    ems = F.unix_millis(F.col("ts"))
    base = events.select("user_id", "value", ems.alias("ets"))
    # every event inserts its value at its ts; values >= 5 are corrected 2h
    # later (reversal of the original + insert of value*2, same row ts)
    births = base.select(
        "user_id", "value", "ets", F.col("ets").alias("mts"), F.lit(False).alias("is_before")
    ).unionByName(
        base.where(F.col("value") >= 5).select(
            "user_id",
            (F.col("value") * 2).alias("value"),
            "ets",
            (F.col("ets") + h2).alias("mts"),
            F.lit(False).alias("is_before"),
        )
    )
    deaths = base.where(F.col("value") >= 5).select(
        "user_id", "value", "ets", (F.col("ets") + h2).alias("mts"), F.lit(True).alias("is_before")
    )
    log = births.unionByName(deaths)
    mutations = log.select(
        "user_id",
        "value",
        F.timestamp_millis("ets").alias("ts"),
        F.timestamp_millis("mts").alias("mutation_ts"),
        "is_before",
        F.date_format(F.timestamp_millis("mts"), "yyyy-MM-dd").alias("ds"),
    )
    # snapshot partitions: for each day D present in the log, the rows live
    # at END of D = births with mts <= end(D) not reversed by then
    days = (
        mutations.select(
            F.unix_millis(F.to_timestamp(F.date_trunc("day", F.col("mutation_ts")))).alias("d0")
        )
        .distinct()
    )
    versions = (
        births.alias("b")
        .join(
            deaths.select("user_id", "value", "ets", F.col("mts").alias("dmts")).alias("d"),
            ["user_id", "value", "ets"],
            "left",
        )
        .select("user_id", "value", "ets", "mts", "dmts")
    )
    snapshots = (
        versions.crossJoin(F.broadcast(days))
        .where(
            (F.col("mts") < F.col("d0") + 86_400_000)
            & (F.col("dmts").isNull() | (F.col("dmts") >= F.col("d0") + 86_400_000))
        )
        .select(
            "user_id",
            "value",
            F.timestamp_millis("ets").alias("ts"),
            F.date_format(F.timestamp_millis("d0"), "yyyy-MM-dd").alias("ds"),
        )
    )
    queries = (
        events.where(F.col("event_type") == "purchase").select("user_id", "ts").distinct()
    )
    gb = GroupBy(
        name="m",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation(Op.COUNT, "value"),
        ],
    )
    got = temporal_entities(queries, snapshots, mutations, gb, left_time_column="ts")

    # oracle: single signed scan of the whole log (no snapshot split)
    from chronon_spark.plans.windows import sawtooth_tail

    qts = F.unix_millis(F.col("q.ts"))
    signed_log = log.withColumn("sign", F.when(F.col("is_before"), -1).otherwise(1))
    o = queries.alias("q").join(
        signed_log.alias("m"),
        (F.col("m.user_id") == F.col("q.user_id")) & (F.col("m.mts") < qts),
        "left",
    )
    w7 = Window(7, TimeUnit.DAYS)
    in7 = (F.col("ets") < qts) & (F.col("ets") >= sawtooth_tail(qts, w7))
    oracle = o.groupBy(F.col("q.user_id").alias("user_id"), F.col("q.ts").alias("ts")).agg(
        F.coalesce(F.sum(F.when(in7, F.col("sign"))), F.lit(0)).cast("long").alias("value_count_7d"),
        F.sum(F.when(in7, F.col("value") * F.col("sign"))).alias("value_sum_7d"),
        F.coalesce(F.sum("sign"), F.lit(0)).cast("long").alias("value_count"),
    )
    cols = ["user_id", "ts", "value_count_7d", "value_sum_7d", "value_count"]
    a = {
        (r[0], r[1], r[2], None if r[3] is None else round(r[3], 6), r[4])
        for r in got.select(*cols).collect()
    }
    b = {
        (r[0], r[1], r[2], None if r[3] is None else round(r[3], 6), r[4])
        for r in oracle.select(*cols).collect()
    }
    assert a == b


def test_cdc_part_in_compute_join(spark, cdc):
    """A Join can carry an entity-CDC part: sources[name] = (snapshots,
    mutations) routes through temporal_entities, with key mapping, prefix,
    and left-row preservation identical to a direct engine call."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators.join import compute_join

    snap, mut = cdc
    left = spark.createDataFrame(
        [
            ("a", DAY11 + 9 * H),
            ("a", DAY11 + 10 * H + 1),
            ("a", DAY11 + 11 * H + 1),
            ("b", DAY11 + 13 * H),
            ("b", DAY11 + 13 * H),  # duplicate left row must be preserved
        ],
        "ent string, qts long",
    ).select("ent", F.timestamp_millis("qts").alias("ts"))
    gb = GroupBy(
        name="dim",
        keys=["k"],
        aggregations=[Aggregation(Op.COUNT, "v"), Aggregation(Op.SUM, "v")],
    )
    j = Join(
        name="with_cdc",
        left_keys=["ent"],
        join_parts=[JoinPart(group_by=gb, key_mapping={"ent": "k"}, prefix="d")],
    )
    out = compute_join(left, {"dim": (snap, mut)}, j)
    assert out.count() == 5  # dup left row fans out
    rows = {
        (r["ent"], r["ts"]): (r["d_dim_v_count"], r["d_dim_v_sum"])
        for r in out.collect()
    }
    # direct engine call for comparison
    q = left.withColumnRenamed("ent", "k").dropDuplicates()
    want = {
        (r["k"], r["ts"]): (r["v_count"], r["v_sum"])
        for r in temporal_entities(q, snap, mut, gb, left_time_column="ts").collect()
    }
    for (ent, ts), v in rows.items():
        assert v == want[(ent, ts)], (ent, ts, v, want[(ent, ts)])


# ---------------------------------------------------------------------------
# seeded random CDC sweep: random insert/update/delete lifecycles vs a pure-
# Python naive oracle (recompute over the rows alive at each query ts) —
# independent of both the engine's snapshot/day decomposition AND the signed
# Spark-SQL oracle above. Reference analog: MutationsTest randomized runs.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [5, 17, 99])
def test_random_cdc_lifecycles_match_naive_oracle(spark, seed):
    import random as _random

    rng = _random.Random(seed)
    base = 1_700_006_400_000  # mid-day anchor, fixed
    day = 86_400_000

    # version rows: (key, value, ets, birth_mts, death_mts|None)
    versions = []
    for k in ("a", "b", "c", "d"):
        for _ in range(rng.randint(8, 20)):
            ets = base + rng.randint(0, 12 * day)
            cur_birth = ets  # insert lands at the row's event time
            cur_val = round(rng.uniform(-10, 10), 2)
            while rng.random() < 0.4:  # update chain: reversal + new version
                upd = cur_birth + rng.randint(1, 3 * day)
                versions.append((k, cur_val, ets, cur_birth, upd))
                cur_val = round(rng.uniform(-10, 10), 2)
                cur_birth = upd
            death = (
                cur_birth + rng.randint(1, 3 * day) if rng.random() < 0.25 else None
            )
            versions.append((k, cur_val, ets, cur_birth, death))

    births = [(k, v, e, b, False) for k, v, e, b, d in versions]
    deaths = [(k, v, e, d, True) for k, v, e, b, d in versions if d is not None]
    mut_rows = [
        (k, v, e, m, rev, _day_str(m)) for k, v, e, m, rev in births + deaths
    ]
    mutations = spark.createDataFrame(
        mut_rows,
        "user_id string, value double, ts long, mutation_ts long, "
        "is_before boolean, ds string",
    )
    # snapshots: for EVERY day in range, the rows alive at end of day
    lo_day = min(m for *_rest, m, _rev in [(r[0], r[1], r[2], r[3], r[4]) for r in births]) // day
    hi_day = max(r[3] for r in mut_rows_keyed(versions)) // day + 1
    snap_rows = []
    for d0 in range(lo_day, hi_day + 1):
        eod = (d0 + 1) * day
        for k, v, e, b, dth in versions:
            if b < eod and (dth is None or dth >= eod):
                snap_rows.append((k, v, e, _day_str(d0 * day)))
    snapshots = spark.createDataFrame(
        snap_rows, "user_id string, value double, ts long, ds string"
    )

    # queries: random times + exact mutation-ts boundaries (strict <)
    q_rows = set()
    for _ in range(30):
        k = rng.choice(("a", "b", "c", "d"))
        q_rows.add((k, base + rng.randint(1, 13 * day)))
    for k, v, e, b, dth in rng.sample(versions, min(8, len(versions))):
        q_rows.add((k, b))  # boundary: birth NOT visible at its own mts
        if dth is not None:
            q_rows.add((k, dth))
    queries = spark.createDataFrame(sorted(q_rows), "user_id string, ts long")

    w7, w1, w6h = Window(7, TimeUnit.DAYS), Window(1, TimeUnit.DAYS), Window(6, TimeUnit.HOURS)
    gb = GroupBy(
        name="rmut",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(w7, w6h)),
            Aggregation(Op.SUM, "value", windows=(w1,)),
            Aggregation(Op.AVERAGE, "value", windows=(w7,)),
            Aggregation(Op.VARIANCE, "value"),  # lifetime
        ],
    )
    got = temporal_entities(queries, snapshots, mutations, gb, left_time_column="ts")

    def tail(qts, w):
        hop = w.tail_hop_millis()
        return ((qts - w.millis) // hop) * hop

    def naive(k, qts):
        alive = [
            (v, e)
            for kk, v, e, b, dth in versions
            if kk == k and b < qts and (dth is None or dth >= qts)
        ]
        def med(w):
            if w is None:
                return [v for v, e in alive]
            return [v for v, e in alive if tail(qts, w) <= e < qts]
        c7, c6h = len(med(w7)), len(med(w6h))
        s1 = med(w1)
        a7 = med(w7)
        life = med(None)
        mean = sum(life) / len(life) if life else None
        return (
            c7,
            c6h,
            round(sum(s1), 6) if s1 else None,
            round(sum(a7) / len(a7), 6) if a7 else None,
            round(sum((x - mean) ** 2 for x in life) / len(life), 6)
            if life
            else None,
        )

    out = {
        (r["user_id"], r["ts"]): (
            r["value_count_7d"],
            r["value_count_6h"],
            None if r["value_sum_1d"] is None else round(r["value_sum_1d"], 6),
            None if r["value_average_7d"] is None else round(r["value_average_7d"], 6),
            None if r["value_variance"] is None else round(r["value_variance"], 6),
        )
        for r in got.collect()
    }
    assert set(out) == q_rows
    for (k, qts), got_vals in sorted(out.items()):
        want = naive(k, qts)
        for g, w_, name in zip(
            got_vals, want, ("count7", "count6h", "sum1", "avg7", "var_life")
        ):
            if name == "sum1":
                # signed-IR semantics (reference delete() too): an insert
                # reversed inside the window leaves SUM = 0.0, which the
                # set-based oracle can't distinguish from absence -> compare
                # with None == 0.0
                g2 = 0.0 if g is None else g
                w2 = 0.0 if w_ is None else w_
                assert abs(g2 - w2) < 1e-5, f"seed={seed} ({k},{qts}) {name}: {g} != {w_}"
            elif g is None or w_ is None:
                assert g == w_, f"seed={seed} ({k},{qts}) {name}: {g} != {w_}"
            else:
                assert abs(g - w_) < 1e-5, f"seed={seed} ({k},{qts}) {name}: {g} != {w_}"


def _day_str(ms):
    import datetime as _dt

    return _dt.datetime.fromtimestamp(ms / 1000, _dt.timezone.utc).strftime("%Y-%m-%d")


def mut_rows_keyed(versions):
    out = []
    for k, v, e, b, d in versions:
        out.append((k, v, e, b))
        if d is not None:
            out.append((k, v, e, d))
    return out


# ---------------------------------------------------------------------------
# bucketed (map-output) aggregations through the CDC engine: hand-crafted
# boundary cases + a seeded random lifecycle sweep vs an alive-set oracle.
# Reference: BucketedColumnAggregator over the deletable IRs.
# ---------------------------------------------------------------------------


def test_bucketed_cdc_basics(spark):
    day = 86_400_000
    d10 = 1704844800000  # 2024-01-10 UTC midnight
    d11 = d10 + day
    # end-of-Jan-10 state: key 'a' holds cart rows in two buckets
    snap = spark.createDataFrame(
        [
            ("a", 10.0, "web", d10 + 3_600_000, "2024-01-10"),
            ("a", 20.0, "app", d10 + 7_200_000, "2024-01-10"),
            ("a", 5.0, "app", d10 + 7_200_000, "2024-01-10"),
        ],
        "k string, v double, ch string, ets long, ds string",
    ).select("k", "v", "ch", F.timestamp_millis("ets").alias("ts"), "ds")
    # Jan-11: reverse BOTH app rows (bucket must vanish), insert a null-bucket
    # row (must never appear as a map key)
    mut = spark.createDataFrame(
        [
            ("a", 20.0, "app", d10 + 7_200_000, d11 + 3_600_000, True, "2024-01-11"),
            ("a", 5.0, "app", d10 + 7_200_000, d11 + 3_600_000, True, "2024-01-11"),
            ("a", 9.0, None, d11 + 1_800_000, d11 + 1_800_000, False, "2024-01-11"),
        ],
        "k string, v double, ch string, ets long, mts long, is_before boolean, ds string",
    ).select(
        "k", "v", "ch",
        F.timestamp_millis("ets").alias("ts"),
        F.timestamp_millis("mts").alias("mutation_ts"),
        "is_before", "ds",
    )
    gb = GroupBy(
        name="bm",
        keys=["k"],
        aggregations=[
            Aggregation(Op.SUM, "v", windows=(Window(7, TimeUnit.DAYS),), buckets=("ch",)),
            Aggregation(Op.COUNT, "v", windows=(Window(7, TimeUnit.DAYS),)),
        ],
    )
    q = spark.createDataFrame(
        [("a", d11 + 3_600_000), ("a", d11 + 3_600_001)], "k string, qts long"
    ).select("k", F.timestamp_millis("qts").alias("ts"), "qts")
    out = {r["qts"]: r.asDict() for r in
           temporal_entities(q, snap, mut, gb, left_time_column="ts").collect()}
    # at exactly the reversal mts: mutation unseen (strict <) -> both buckets
    before = out[d11 + 3_600_000]
    assert before["v_sum_7d_by_ch"] == {"app": 25.0, "web": 10.0}
    assert before["v_count_7d"] == 4  # null-bucket insert still counts directly
    # 1ms later: app fully reversed -> entry gone; null bucket never a key
    after = out[d11 + 3_600_001]
    assert after["v_sum_7d_by_ch"] == {"web": 10.0}
    assert after["v_count_7d"] == 2


@pytest.mark.parametrize("seed", [13, 47, 101])
def test_random_bucketed_cdc_matches_naive_oracle(spark, seed):
    """Random insert/update/delete lifecycles with a bucket attribute (some
    null): bucketed map outputs from the signed CDC engine == a pure-Python
    alive-set oracle. Covers presence-window entry retention (windowed-only
    GroupBys) AND lifetime presence (seed-dependent), mixed with direct
    aggregations."""
    import random as _random

    rng = _random.Random(seed)
    base = 1_700_006_400_000
    day = 86_400_000
    buckets = ["p", "q", "r", None]

    # (key, value, bucket, ets, birth_mts, death_mts|None)
    versions = []
    for k in ("a", "b", "c"):
        for _ in range(rng.randint(8, 16)):
            ets = base + rng.randint(0, 10 * day)
            bkt = rng.choice(buckets)
            cur_birth, cur_val = ets, round(rng.uniform(-10, 10), 2)
            while rng.random() < 0.4:
                upd = cur_birth + rng.randint(1, 3 * day)
                versions.append((k, cur_val, bkt, ets, cur_birth, upd))
                cur_val, cur_birth = round(rng.uniform(-10, 10), 2), upd
            death = cur_birth + rng.randint(1, 3 * day) if rng.random() < 0.3 else None
            versions.append((k, cur_val, bkt, ets, cur_birth, death))

    births = [(k, v, bk, e, b, False) for k, v, bk, e, b, d in versions]
    deaths = [(k, v, bk, e, d, True) for k, v, bk, e, b, d in versions if d is not None]
    mutations = spark.createDataFrame(
        [(k, v, bk, e, m, rev, _day_str(m)) for k, v, bk, e, m, rev in births + deaths],
        "user_id string, value double, bkt string, ts long, mutation_ts long, "
        "is_before boolean, ds string",
    )
    lo_day = min(b for *_x, b, _d in versions) // day
    hi_day = max(m for *_x, m, _rev in births + deaths) // day + 1
    snap_rows = []
    for d0 in range(lo_day, hi_day + 1):
        eod = (d0 + 1) * day
        for k, v, bk, e, b, dth in versions:
            if b < eod and (dth is None or dth >= eod):
                snap_rows.append((k, v, bk, e, _day_str(d0 * day)))
    snapshots = spark.createDataFrame(
        snap_rows, "user_id string, value double, bkt string, ts long, ds string"
    )

    q_rows = set()
    for _ in range(25):
        q_rows.add((rng.choice(("a", "b", "c")), base + rng.randint(1, 11 * day)))
    for k, v, bk, e, b, dth in rng.sample(versions, min(6, len(versions))):
        q_rows.add((k, b))
        if dth is not None:
            q_rows.add((k, dth + 1))
    queries = spark.createDataFrame(sorted(q_rows), "user_id string, ts long")

    w7, w2 = Window(7, TimeUnit.DAYS), Window(2, TimeUnit.DAYS)
    lifetime = seed % 2 == 1  # odd seeds exercise the lifetime presence rule
    aggs = [
        Aggregation(Op.COUNT, "value", windows=(w7,), buckets=("bkt",)),
        Aggregation(Op.SUM, "value", windows=(w2,), buckets=("bkt",)),
        Aggregation(Op.AVERAGE, "value",
                    windows=None if lifetime else (w2,), buckets=("bkt",)),
        Aggregation(Op.SUM, "value", windows=(w7,)),  # mixed-in direct agg
    ]
    gb = GroupBy(name="rbm", keys=["user_id"], aggregations=aggs)
    got = temporal_entities(queries, snapshots, mutations, gb, left_time_column="ts")

    def tail(qts, w):
        hop = w.tail_hop_millis()
        return ((qts - w.millis) // hop) * hop

    w_pres = None if lifetime else w7  # largest window across the GroupBy

    def naive_maps(k, qts):
        alive = [
            (v, bk, e)
            for kk, v, bk, e, b, dth in versions
            if kk == k and b < qts and (dth is None or dth >= qts)
        ]
        present = {
            bk for v, bk, e in alive
            if bk is not None and (w_pres is None or tail(qts, w_pres) <= e < qts)
        }
        def vals(bk, w):
            return [
                v for v, b2, e in alive
                if b2 == bk and (w is None or tail(qts, w) <= e < qts)
            ]
        cnt7 = {bk: len(vals(bk, w7)) for bk in present}
        sum2 = {bk: (sum(v2) if (v2 := vals(bk, w2)) else None) for bk in present}
        avg_w = None if lifetime else w2
        avg = {
            bk: (sum(v2) / len(v2) if (v2 := vals(bk, avg_w)) else None)
            for bk in present
        }
        direct = [v for v, bk, e in alive if tail(qts, w7) <= e < qts]
        return (cnt7 or None, sum2 or None, avg or None,
                sum(direct) if direct else None)

    avg_col = "value_average_by_bkt" if lifetime else "value_average_2d_by_bkt"
    out = {
        (r["user_id"], r["ts"]): (
            r["value_count_7d_by_bkt"], r["value_sum_2d_by_bkt"],
            r[avg_col], r["value_sum_7d"],
        )
        for r in got.collect()
    }
    assert set(out) == q_rows

    def close(a, b):
        if a is None or b is None:
            # signed-IR SUM over a fully-reversed window is 0.0 where the
            # alive-set oracle says absent — same caveat as the direct sweep
            return (a or 0.0) == 0.0 and (b or 0.0) == 0.0
        return abs(a - b) < 1e-5

    for (k, qts), (g_cnt, g_sum, g_avg, g_dir) in sorted(out.items()):
        w_cnt, w_sum, w_avg, w_dir = naive_maps(k, qts)
        assert (g_cnt or {}) == (w_cnt or {}), f"seed={seed} ({k},{qts}) count map"
        gs, ws = g_sum or {}, w_sum or {}
        assert set(gs) == set(ws), f"seed={seed} ({k},{qts}) sum keys"
        for bk in gs:
            assert close(gs[bk], ws[bk]), f"seed={seed} ({k},{qts}) sum[{bk}]: {gs[bk]} != {ws[bk]}"
        ga, wa = g_avg or {}, w_avg or {}
        assert set(ga) == set(wa), f"seed={seed} ({k},{qts}) avg keys"
        for bk in ga:
            assert close(ga[bk], wa[bk]), f"seed={seed} ({k},{qts}) avg[{bk}]: {ga[bk]} != {wa[bk]}"
        assert close(g_dir, w_dir), f"seed={seed} ({k},{qts}) direct sum"
