"""Analyzer validation gate: every seeded misconfiguration must surface as
a structured error BEFORE any backfill job runs (reference
Analyzer.scala:190-520, 593-640)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op, TimeUnit, Window
from chronon_spark.operators.analyzer import analyze_group_by, validate_group_by


def _codes(errs):
    return {e.code for e in errs}


def _gb(**kw):
    base = dict(
        name="g",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    base.update(kw)
    return GroupBy(**base)


def test_clean_config_passes(spark, events):
    assert validate_group_by(events, _gb()) == []


def test_missing_columns(spark, events):
    gb = _gb(keys=["nope_key"], aggregations=[Aggregation(Op.SUM, "nope_val")])
    codes = _codes(validate_group_by(events, gb))
    assert {"missing_key_column", "missing_input_column"} <= codes


def test_missing_and_bad_time_column(spark, events):
    assert "missing_time_column" in _codes(
        validate_group_by(events, _gb(time_column="nope_ts"))
    )
    bad = events.withColumn("ts", F.col("event_type"))  # string ts
    assert "bad_time_type" in _codes(validate_group_by(bad, _gb()))


def test_bad_input_and_bucket_types(spark, events):
    gb = _gb(aggregations=[Aggregation(Op.SUM, "event_type")])  # SUM on string
    assert "bad_input_type" in _codes(validate_group_by(events, gb))
    gb2 = _gb(
        aggregations=[Aggregation(Op.COUNT, "value", buckets=("user_id",))]
    )  # long bucket
    assert "bucket_not_string" in _codes(validate_group_by(events, gb2))


def test_ts_seconds_not_millis(spark, events):
    secs = events.withColumn("ts", (F.unix_millis("ts") / 1000).cast("long"))
    assert "ts_not_millis" in _codes(validate_group_by(secs, _gb()))


def test_null_timestamps(spark, events):
    holey = events.withColumn(
        "ts", F.when(F.col("user_id") % 10 == 0, F.col("ts"))
    )
    assert "null_timestamps" in _codes(validate_group_by(holey, _gb()))


def test_insufficient_history(spark, events):
    # source starts ~2024-01-01; a 7d-window backfill from 2024-01-03 needs
    # events from 2023-12-27
    errs = validate_group_by(events, _gb(), start_ds="2024-01-03")
    assert "insufficient_history" in _codes(errs)
    # far enough in: fine
    assert validate_group_by(events, _gb(), start_ds="2024-03-01") == []


def test_mutation_source_checks(spark, events):
    muts = events.select("user_id", "value", "ts")  # lacks mutation_ts/is_before
    gb = _gb(aggregations=[Aggregation(Op.LAST, "value")])
    codes = _codes(validate_group_by(events, gb, mutations=muts, check_data=False))
    assert {"missing_mutation_column", "non_deletable_op"} <= codes


def test_long_millis_time_column_contract(spark, events):
    """The reference's ts contract is LONG epoch millis; a numeric time
    column must be taken verbatim, not run through a seconds-interpreting
    timestamp cast."""
    from chronon_spark.operators.groupby import temporal_events

    gb = _gb()
    left_t = events.where(F.col("event_type") == "purchase").select("user_id", "ts").distinct()
    out_t = temporal_events(left_t, events, gb, tiebreak="event_id")
    ev_ms = events.withColumn("ts", F.unix_millis("ts"))
    left_ms = ev_ms.where(F.col("event_type") == "purchase").select("user_id", "ts").distinct()
    out_ms = temporal_events(left_ms, ev_ms, gb, tiebreak="event_id")
    a = {
        (r["user_id"], r["qts"], round(r["value_sum_7d"], 9) if r["value_sum_7d"] is not None else None)
        for r in out_t.select("user_id", F.unix_millis("ts").alias("qts"), "value_sum_7d").collect()
    }
    b = {
        (r["user_id"], r["qts"], round(r["value_sum_7d"], 9) if r["value_sum_7d"] is not None else None)
        for r in out_ms.select("user_id", F.col("ts").alias("qts"), "value_sum_7d").collect()
    }
    assert a == b


def test_analyze_group_by_carries_errors(spark, events):
    res = analyze_group_by(events, _gb(keys=["nope"]))
    assert res.errors and res.output_schema == []
    ok = analyze_group_by(events, _gb(), hot_key_threshold=1)
    assert ok.errors == [] and len(ok.output_schema) > 0


# ---------------------------------------------------------------------------
# join-level analyzer (reference Analyzer.analyzeJoin, Analyzer.scala:279-483)
# ---------------------------------------------------------------------------


def _join(parts):
    from chronon_spark.api import Join

    return Join(name="j", left_keys=["user_id"], join_parts=parts)


def _part(gb=None, **kw):
    from chronon_spark.api import JoinPart

    return JoinPart(group_by=gb or _gb(), **kw)


def _left(events):
    return events.where(F.col("event_type") == "purchase").select("user_id", "ts")


def test_join_clean_config_passes(spark, events):
    from chronon_spark.operators.analyzer import validate_join

    assert validate_join(_left(events), {"g": events}, _join([_part()])) == []


def test_join_missing_source_and_left_key(spark, events):
    from chronon_spark.operators.analyzer import validate_join

    j = _join([_part(), _part(_gb(name="g2", keys=["etype_missing"]), prefix="p")])
    codes = _codes(validate_join(_left(events), {"g": events}, j))
    assert "missing_source" in codes  # g2 has no source
    j2 = _join([_part(_gb(name="g", keys=["other_key"]))])
    codes2 = _codes(validate_join(_left(events), {"g": events}, j2))
    assert "missing_left_key" in codes2  # left lacks other_key

def test_join_bad_key_mapping(spark, events):
    from chronon_spark.operators.analyzer import validate_join

    j = _join([_part(key_mapping={"user_id": "not_a_key"})])
    assert "bad_key_mapping" in _codes(validate_join(_left(events), {"g": events}, j))


def test_join_part_groupby_errors_carry_part_label(spark, events):
    from chronon_spark.operators.analyzer import validate_join

    bad = _gb(aggregations=[Aggregation(Op.SUM, "no_col")])
    errs = validate_join(_left(events), {"g": events}, _join([_part(bad, prefix="px")]))
    assert any(e.code == "missing_input_column" and "px_g" in e.message for e in errs)


def test_join_duplicate_output_columns(spark, events):
    from chronon_spark.operators.analyzer import validate_join

    j = _join([_part(), _part()])  # same GroupBy twice, no prefix
    assert "duplicate_output_column" in _codes(
        validate_join(_left(events), {"g": events}, j)
    )


def test_join_missing_left_time_column(spark, events):
    from chronon_spark.operators.analyzer import validate_join

    left = events.select("user_id", F.col("ts").alias("event_time"))
    assert "missing_time_column" in _codes(validate_join(left, {"g": events}, _join([_part()])))


def _snapshots(spark):
    return spark.createDataFrame(
        [(1, "2024-01-01", "gold", 10.0, 1704067200000),
         (2, "2024-01-01", "free", 3.0, 1704067200000)],
        "user_id long, ds string, tier string, balance double, ts long",
    )


def _mutations(spark):
    return spark.createDataFrame(
        [(1, "2024-01-02", "gold", 10.0, 1704153600000, 1704153600000, True)],
        "user_id long, ds string, tier string, balance double, ts long, "
        "mutation_ts long, is_before boolean",
    )


def test_selection_groupby_validates_and_analyzes(spark, events):
    """aggregations=None selection parts must pass the gate (no crash on the
    agg loop) and require only keys + the 'ds' snapshot partition column."""
    sel = GroupBy(name="users", keys=["user_id"], aggregations=None)
    snaps = _snapshots(spark)
    assert validate_group_by(snaps, sel) == []
    # missing 'ds' is the one selection-specific requirement
    codes = _codes(validate_group_by(snaps.drop("ds"), sel))
    assert "missing_partition_column" in codes
    res = analyze_group_by(snaps, sel, hot_key_threshold=1)
    assert res.errors == []
    names = [n for n, _ in res.output_schema]
    assert "tier" in names and "balance" in names and "ds" not in names


def test_cdc_tuple_source_validates_and_analyzes(spark):
    """Entity-CDC (snapshots, mutations) sources route through the gate:
    snapshot schema checks + mutation-column + deletable-op checks, and
    analyze_group_by plans the mutation engine without a data pass."""
    from chronon_spark.api import Accuracy

    gb = GroupBy(
        name="acct",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "balance", windows=(Window(7, TimeUnit.DAYS),))],
        accuracy=Accuracy.TEMPORAL,
    )
    src = (_snapshots(spark), _mutations(spark))
    assert validate_group_by(src, gb, check_data=False) == []
    # mutation frame missing CDC columns -> structured error
    bad = (_snapshots(spark), _mutations(spark).drop("is_before", "mutation_ts"))
    assert "missing_mutation_column" in _codes(validate_group_by(bad, gb, check_data=False))
    # non-deletable op over a CDC source -> structured error
    gb_bad = GroupBy(
        name="acct", keys=["user_id"],
        aggregations=[Aggregation(Op.LAST, "balance")],
    )
    assert "non_deletable_op" in _codes(validate_group_by(src, gb_bad, check_data=False))
    res = analyze_group_by(src, gb, hot_key_threshold=1)
    assert res.errors == []
    assert ("balance_sum_7d", "double") in res.output_schema


def test_join_with_selection_and_cdc_parts(spark, events):
    """analyze_join over a mixed join (temporal events part + selection part
    + CDC part) — the reference's analyzeJoin covers every part kind."""
    from chronon_spark.api import Accuracy, Join, JoinPart
    from chronon_spark.operators.analyzer import analyze_join, validate_join

    sel = GroupBy(name="users", keys=["user_id"], aggregations=None)
    cdc = GroupBy(
        name="acct", keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "balance", windows=(Window(7, TimeUnit.DAYS),))],
        accuracy=Accuracy.TEMPORAL,
    )
    j = Join(
        name="mixed", left_keys=["user_id"],
        join_parts=[_part(), JoinPart(group_by=sel), JoinPart(group_by=cdc)],
    )
    sources = {
        "g": events,
        "users": _snapshots(spark),
        "acct": (_snapshots(spark), _mutations(spark)),
    }
    assert validate_join(_left(events), sources, j) == []
    res = analyze_join(_left(events), sources, j, hot_key_threshold=1)
    assert res.errors == []
    names = [n for n, _ in res.output_schema]
    assert "g_value_sum_7d" in names
    assert "users_tier" in names  # selection fields under the part prefix
    assert "acct_balance_sum_7d" in names
    origins = {h[0] for h in res.hot_keys}
    assert {"left", "g", "users", "acct"} <= origins


def test_analyze_join_schema_and_hot_keys(spark, events):
    from chronon_spark.operators.analyzer import analyze_join

    j = _join([_part(), _part(_gb(name="g2", aggregations=[
        Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))]), prefix="p")])
    res = analyze_join(_left(events), {"g": events, "g2": events}, j, hot_key_threshold=1)
    assert res.errors == []
    names = [n for n, _ in res.output_schema]
    assert "g_value_sum_7d" in names and "p_g2_value_count_1d" in names
    assert res.part_schemas["g"] == [("g_value_sum_7d", "double")]
    # threshold=1: every key is "hot"; left + both parts contribute rows
    origins = {h[0] for h in res.hot_keys}
    assert {"left", "g", "p_g2"} <= origins


def test_analyzer_accepts_declarative_sources(spark, events):
    from chronon_spark.api import EntitySource, EventSource
    from chronon_spark.api import Query as Q
    from chronon_spark.operators.analyzer import analyze_join, validate_join

    src_ev = EventSource(
        table=events,
        query=Q(selects={"user_id": "user_id", "value": "value", "ts": "ts"}),
    )
    src_cdc = EntitySource(
        snapshot_table=_snapshots(spark), mutation_table=_mutations(spark), query=Q()
    )
    from chronon_spark.api import Accuracy, Join, JoinPart

    cdc = GroupBy(
        name="acct", keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "balance", windows=(Window(7, TimeUnit.DAYS),))],
        accuracy=Accuracy.TEMPORAL,
    )
    j = Join(
        name="decl", left_keys=["user_id"],
        join_parts=[_part(), JoinPart(group_by=cdc)],
    )
    sources = {"g": src_ev, "acct": src_cdc}
    assert validate_join(_left(events), sources, j) == []
    res = analyze_join(_left(events), sources, j, hot_key_threshold=1)
    assert res.errors == []
    names = [n for n, _ in res.output_schema]
    assert "g_value_sum_7d" in names and "acct_balance_sum_7d" in names


def test_groupby_duplicate_output_columns(spark, events):
    """Two aggs identical except for a non-name-bearing knob collide within
    one GroupBy and must fail the gate (not silently overwrite)."""
    gb = _gb(
        aggregations=[
            Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),)),
            Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),)),
        ]
    )
    assert "duplicate_output_column" in _codes(
        validate_group_by(events, gb, check_data=False)
    )


def test_decay_cap_distinguishes_output_names(spark, events):
    """decay_cap != default feeds the output name, so two TIME_DECAYED aggs
    differing only in cap neither collide nor fail the gate."""
    hl = Window(1, TimeUnit.DAYS)
    a20 = Aggregation(Op.TIME_DECAYED_SUM, "value", windows=(Window(7, TimeUnit.DAYS),), halflife=hl)
    a10 = Aggregation(
        Op.TIME_DECAYED_SUM, "value", windows=(Window(7, TimeUnit.DAYS),), halflife=hl, decay_cap=10
    )
    names = {a.output_name(a.unpacked()[0][0], None) for a in (a20, a10)}
    assert len(names) == 2 and any("_cap10" in n for n in names)
    gb = _gb(aggregations=[a20, a10])
    assert validate_group_by(events, gb, check_data=False) == []


def test_decayed_sum_overflow_warns_on_wide_integrals(spark, events):
    """LongType input + default cap can overflow the int64 scaled sum; the
    gate warns (schema passes — data-dependent risk, not a hard error)."""
    import warnings

    gb = _gb(
        aggregations=[
            Aggregation(
                Op.TIME_DECAYED_SUM, "value",
                windows=(Window(7, TimeUnit.DAYS),), halflife=Window(1, TimeUnit.DAYS),
            )
        ]
    )
    long_events = events.withColumn("value", F.col("value").cast("long"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert validate_group_by(long_events, gb, check_data=False) == []
    assert any("overflow the int64 scaled sum" in str(x.message) for x in w)
    # double input carries no integer-overflow risk: silent
    dbl_events = events.withColumn("value", F.col("value").cast("double"))
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        assert validate_group_by(dbl_events, gb, check_data=False) == []
    assert not [x for x in w2 if "scaled sum" in str(x.message)]
