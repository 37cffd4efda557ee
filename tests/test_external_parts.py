"""External parts on a Join (reference Join.onlineExternalParts,
api.thrift:304-336; offline realization Join.scala:76-123 padExternalFields):
online-only feature slots padded with typed nulls in a backfill, filled from
bootstrap-logged rows when present, with contextual request-column
passthrough (Constants.scala:57-59)."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import (
    Aggregation,
    ExternalPart,
    ExternalSource,
    GroupBy,
    Join,
    JoinPart,
    Op,
    Window,
)
from chronon_spark.operators.bootstrap import bootstrap_join, pad_external_parts
from chronon_spark.operators.join import compute_join, join_semantic_hash


@pytest.fixture()
def left(spark):
    return spark.createDataFrame(
        [("u1", "2026-01-05 10:00:00", "web"), ("u2", "2026-01-05 11:00:00", None)],
        "user_id string, ts string, channel string",
    ).withColumn("ts", F.to_timestamp("ts"))


RISK = ExternalSource(
    name="payment_service",
    key_schema=(("user_id", "string"),),
    value_schema=(("risk_score", "double"), ("fraud_flags", "array<string>")),
)
CONTEXT = ExternalSource(
    name="contextual",
    key_schema=(("channel", "string"),),
    value_schema=(("channel", "string"),),
)


def test_naming_matches_reference_convention():
    part = ExternalPart(RISK)
    assert part.full_name() == "ext_payment_service"
    assert part.value_schema_full() == [
        ("ext_payment_service_risk_score", "double"),
        ("ext_payment_service_fraud_flags", "array<string>"),
    ]
    assert ExternalPart(RISK, prefix="p1").full_name() == "ext_p1_payment_service"
    # key fields surface under their LEFT names (Extensions.scala:729-730)
    mapped = ExternalPart(RISK, key_mapping={"uid": "user_id"})
    assert mapped.key_schema_full() == [("uid", "string")]


def test_unbootstrapped_external_fields_pad_typed_nulls(spark, left):
    out = pad_external_parts(left, [ExternalPart(RISK)])
    assert "ext_payment_service_risk_score" in out.columns
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["ext_payment_service_risk_score"] == "double"
    assert schema["ext_payment_service_fraud_flags"] == "array<string>"
    assert out.where("ext_payment_service_risk_score is not null").count() == 0
    assert out.count() == left.count()


def test_contextual_two_way_coalesce(spark, left):
    # only the bare left column exists -> prefixed twin is created and mirrored
    out = pad_external_parts(left, [ExternalPart(CONTEXT)])
    rows = {r.user_id: r for r in out.collect()}
    assert rows["u1"].ext_contextual_channel == "web"
    assert rows["u1"].channel == "web"
    assert rows["u2"].ext_contextual_channel is None
    # only the prefixed column bootstrapped -> bare column backfilled from it
    pre = left.drop("channel").withColumn(
        "ext_contextual_channel", F.lit("app")
    )
    out2 = pad_external_parts(pre, [ExternalPart(CONTEXT)])
    assert out2.select("channel").distinct().collect()[0][0] == "app"


def test_bootstrap_fills_external_slots_and_join_pads_rest(spark, left):
    events = spark.createDataFrame(
        [("u1", "2026-01-05 09:00:00", 5.0), ("u2", "2026-01-05 09:30:00", 7.0)],
        "user_id string, ts string, amount double",
    ).withColumn("ts", F.to_timestamp("ts"))
    gb = GroupBy(
        name="purchases",
        keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "amount", windows=(Window(7),))],
    )
    join = Join(
        name="j",
        left_keys=["user_id"],
        join_parts=[JoinPart(gb)],
        external_parts=[ExternalPart(RISK), ExternalPart(CONTEXT)],
        derivations={"*": "*", "risk_x2": "ext_payment_service_risk_score * 2"},
    )
    # bootstrap logs cover u1's external value only
    logged = spark.createDataFrame(
        [("u1", "2026-01-05 10:00:00", 0.25)],
        "user_id string, ts string, ext_payment_service_risk_score double",
    ).withColumn("ts", F.to_timestamp("ts"))
    booted = bootstrap_join(left, [("logs", logged)], ["user_id", "ts"])
    out = compute_join(booted, {"purchases": events}, join)
    rows = {r.user_id: r for r in out.collect()}
    assert rows["u1"].ext_payment_service_risk_score == 0.25
    assert rows["u1"].risk_x2 == 0.5  # derivation over an external slot compiles
    assert rows["u2"].ext_payment_service_risk_score is None
    assert rows["u2"].risk_x2 is None
    assert rows["u1"].ext_contextual_channel == "web"
    assert rows["u1"].purchases_amount_sum_7d == 5.0


def test_external_parts_invalidate_semantic_hash():
    gb = GroupBy(name="g", keys=["user_id"],
                 aggregations=[Aggregation(Op.COUNT, "amount", windows=(Window(7),))])
    base = Join(name="j", left_keys=["user_id"], join_parts=[JoinPart(gb)])
    with_ext = Join(name="j", left_keys=["user_id"], join_parts=[JoinPart(gb)],
                    external_parts=[ExternalPart(RISK)])
    assert join_semantic_hash(base) != join_semantic_hash(with_ext)
