"""Reference-pattern semantics tests: entity snapshots vs SQL oracle,
JoinSource chaining, step-days invariance, semantic-hash wiring.

Patterns: GroupByTest.scala:40-73 (entities oracle), GroupByTest.scala:603
(chaining), GroupByTest.scala:268-285 (step-days invariance).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark import Accuracy, Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
from chronon_spark.operators.groupby import snapshot_entities, temporal_events
from chronon_spark.operators.join import compute_join
from chronon_spark.sources.tableio import PartitionedTable, backfill, ds_range


def test_snapshot_entities_vs_sql_oracle(spark, events):
    """Entity daily snapshots: AVG over [10d, lifetime] windows per (key, ds)
    with update `ts < epoch(ds)+1d` — oracle is plain Spark SQL."""
    snap = events.withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
    gb = GroupBy(
        name="ent",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.AVERAGE, "value", windows=(Window(10, TimeUnit.DAYS),)),
            Aggregation(Op.COUNT, "value"),
        ],
        accuracy=Accuracy.SNAPSHOT,
    )
    out = snapshot_entities(snap, gb)
    snap.createOrReplaceTempView("snap_v")
    oracle = spark.sql(
        """
        SELECT user_id, ds,
               avg(CASE WHEN unix_millis(ts) >= unix_millis(to_timestamp(ds)) + 86400000 - 10*86400000
                         AND unix_millis(ts) <  unix_millis(to_timestamp(ds)) + 86400000
                        THEN value END) AS value_average_10d,
               count(CASE WHEN unix_millis(ts) < unix_millis(to_timestamp(ds)) + 86400000
                          THEN value END) AS value_count
        FROM snap_v GROUP BY user_id, ds
        """
    )
    got = {(r["user_id"], r["ds"]): (r["value_average_10d"], r["value_count"]) for r in out.collect()}
    want = {(r["user_id"], r["ds"]): (r["value_average_10d"], r["value_count"]) for r in oracle.collect()}
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g[1] == w[1], k
        assert (g[0] is None and w[0] is None) or abs(g[0] - w[0]) < 1e-9, k


def test_join_source_chaining(spark, events):
    """JoinSource: the output of one join feeds a downstream GroupBy
    (reference replaceJoinSource, GroupBy.scala:404-455)."""
    gb1 = GroupBy(
        name="u",
        keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    left = events.where(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    enriched = compute_join(
        left, {"u": events}, Join(name="j1", left_keys=["user_id"], join_parts=[JoinPart(group_by=gb1)]),
        tiebreak="event_id",
    )
    # downstream GroupBy over the join output (chained source)
    gb2 = GroupBy(
        name="chain",
        keys=["user_id"],
        aggregations=[Aggregation(Op.MAX, "u_value_count_7d")],
    )
    q2 = enriched.select("user_id", "ts").limit(20)
    out = temporal_events(q2, enriched, gb2, tiebreak="event_id")
    assert out.count() == q2.count()
    assert "u_value_count_7d_max" in out.columns


def test_step_days_invariance(spark, events, tmp_path):
    """Backfilling in one chunk vs many daily chunks writes identical data
    (reference GroupByTest.scala:268-285)."""

    def compute(s, lo, hi):
        ev = events.withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
        return (
            ev.where((F.col("ds") >= lo) & (F.col("ds") <= hi))
            .groupBy("user_id", "ds")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        )

    t_one = PartitionedTable(str(tmp_path / "one"))
    t_many = PartitionedTable(str(tmp_path / "many"))
    backfill(spark, t_one, compute, "2024-01-01", "2024-01-10", "h", step_days=30)
    backfill(spark, t_many, compute, "2024-01-01", "2024-01-10", "h", step_days=2)
    a = sorted([tuple(r) for r in t_one.read(spark).collect()], key=str)
    b = sorted([tuple(r) for r in t_many.read(spark).collect()], key=str)
    assert a == b and len(a) > 0


def test_semantic_hash_stability():
    gb = GroupBy(
        name="g",
        keys=["k"],
        aggregations=[Aggregation(Op.SUM, "v", windows=(Window(7, TimeUnit.DAYS),))],
    )
    h1 = gb.semantic_hash()
    assert h1 == gb.semantic_hash()  # stable
    gb2 = GroupBy(
        name="g",
        keys=["k"],
        aggregations=[Aggregation(Op.SUM, "v", windows=(Window(8, TimeUnit.DAYS),))],
    )
    assert h1 != gb2.semantic_hash()  # definition change detected


def test_analyzer_schema_inference_and_hot_keys(spark, events):
    """Dry-run analysis: exact output schema without a data pass + hot-key
    detection (reference Analyzer.analyzeJoin / heavyHitters)."""
    from chronon_spark.operators.analyzer import analyze_group_by

    gb = GroupBy(
        name="g",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation(Op.LAST_K, "event_type", k=3),
        ],
    )
    a = analyze_group_by(events, gb, hot_key_threshold=10_000)
    names = [n for n, _ in a.output_schema]
    assert "value_sum_7d" in names and "event_type_last3" in names
    types = dict(a.output_schema)
    assert types["value_sum_7d"] == "double"
    assert types["event_type_last3"].startswith("array")
    assert a.hot_keys == []  # nothing at 10k threshold on 1k events
    low = analyze_group_by(events, gb, hot_key_threshold=1)
    assert low.hot_keys and all(col == "user_id" for col, _, _ in low.hot_keys)


def test_compare_assert_equal_detects_diffs(spark):
    from chronon_spark.operators.compare import assert_equal, side_by_side

    a = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    b = spark.createDataFrame([(1, 10.0), (2, 21.0)], "k int, v double")
    assert side_by_side(a, a, ["k"]).count() == 0
    d = side_by_side(a, b, ["k"])
    assert d.count() == 1 and d.first()["k"] == 2
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        assert_equal(a, b, ["k"])
