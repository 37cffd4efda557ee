"""Fetch-time external source registry (reference
ExternalSourceRegistry.scala): handler registration, contextual pass-through,
table-backed handlers, schema validation (the reference's TODO list —
missing/extra fields, type integrity — implemented and tested here), and
null padding for unmatched keys matching the offline bootstrap contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import ExternalPart, ExternalSource
from chronon_spark.online import (
    Context,
    ExternalSourceHandler,
    ExternalSourceRegistry,
)

RISK = ExternalSource(
    name="risk_svc",
    key_schema=(("user_id", "bigint"),),
    value_schema=(("score", "double"), ("tier", "string")),
)


class TableHandler(ExternalSourceHandler):
    """Handler backed by a lookup frame — the dim-join adapter shape."""

    def __init__(self, table):
        self.table = table
        self.calls = 0

    def fetch(self, spark, keys):
        self.calls += 1
        return keys.join(self.table, "user_id", "left")


def _requests(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (99, "z")], "uid long, ctx string"
    )


def _lookup(spark):
    return spark.createDataFrame(
        [(1, 0.9, "gold"), (2, 0.5, "silver"), (3, 0.1, "bronze")],
        "user_id long, score double, tier string",
    )


def test_registration_rules():
    reg = ExternalSourceRegistry()
    reg.add("risk_svc", TableHandler(None))
    with pytest.raises(ValueError, match="already exists"):
        reg.add("risk_svc", TableHandler(None))
    with pytest.raises(ValueError, match="not registered among handlers"):
        reg.handler("nope")
    # the contextual handler is built in (reference ContextualHandler)
    assert reg.handler("contextual") is not None


def test_table_backed_enrich_with_key_mapping_and_null_padding(spark):
    reg = ExternalSourceRegistry()
    h = TableHandler(_lookup(spark))
    reg.add("risk_svc", h)
    part = ExternalPart(source=RISK, key_mapping={"uid": "user_id"}, prefix="p")
    out = reg.enrich(_requests(spark), [part]).collect()
    got = {r["uid"]: (r["ext_p_risk_svc_score"], r["ext_p_risk_svc_tier"]) for r in out}
    assert got == {
        1: (0.9, "gold"),
        2: (0.5, "silver"),
        3: (0.1, "bronze"),
        99: (None, None),  # unmatched key -> typed nulls (offline contract)
    }
    assert len(out) == 4  # no fan-out
    assert h.calls == 1  # one batched call per source
    ctx = Context("external.fetching", extra=(("external_source", part.full_name()),))
    assert reg.metrics.counter(ctx, "response.successes") == 1


def test_missing_declared_field_raises(spark):
    reg = ExternalSourceRegistry()

    class Partial(ExternalSourceHandler):
        def fetch(self, _spark, keys):
            return keys.withColumn("score", F.lit(1.0))  # no 'tier'

    reg.add("risk_svc", Partial())
    part = ExternalPart(source=RISK, key_mapping={"uid": "user_id"})
    with pytest.raises(ValueError, match=r"missing declared fields \['tier'\]"):
        reg.enrich(_requests(spark), [part]).collect()


def test_extra_columns_dropped_and_types_cast(spark):
    reg = ExternalSourceRegistry()

    class Noisy(ExternalSourceHandler):
        def fetch(self, _spark, keys):
            return (
                keys.withColumn("score", F.lit(2))  # int, declared double
                .withColumn("tier", F.lit("t"))
                .withColumn("debug_blob", F.lit("x" * 100))
            )

    reg.add("risk_svc", Noisy())
    part = ExternalPart(source=RISK, key_mapping={"uid": "user_id"})
    out = reg.enrich(_requests(spark), [part])
    assert "debug_blob" not in out.columns
    assert dict(out.dtypes)["ext_risk_svc_score"] == "double"
    assert out.where(F.col("ext_risk_svc_score") == 2.0).count() == 4


def test_duplicate_handler_rows_do_not_fan_out(spark):
    reg = ExternalSourceRegistry()

    class Dupey(ExternalSourceHandler):
        def fetch(self, _spark, keys):
            one = keys.withColumn("score", F.lit(1.0)).withColumn("tier", F.lit("t"))
            return one.unionAll(one)

    reg.add("risk_svc", Dupey())
    part = ExternalPart(source=RISK, key_mapping={"uid": "user_id"})
    assert reg.enrich(_requests(spark), [part]).count() == 4


def test_contextual_part_passthrough(spark):
    reg = ExternalSourceRegistry()
    ctx_src = ExternalSource(name="contextual", key_schema=(("ctx", "string"),))
    part = ExternalPart(source=ctx_src)
    out = reg.enrich(_requests(spark), [part]).collect()
    assert all(r["ext_contextual_ctx"] == r["ctx"] for r in out)


def test_missing_request_key_column_raises(spark):
    reg = ExternalSourceRegistry()
    reg.add("risk_svc", TableHandler(_lookup(spark)))
    part = ExternalPart(source=RISK)  # no mapping: expects a user_id column
    with pytest.raises(ValueError, match="lacks key columns"):
        reg.enrich(_requests(spark), [part])


def test_graceful_failure_yields_exception_column(spark):
    """Reference ExternalSourcesTest: an always-failing source surfaces as
    ext_{name}_exception while other parts still enrich; strict mode
    raises."""
    reg = ExternalSourceRegistry()

    class Boom(ExternalSourceHandler):
        def fetch(self, _spark, keys):
            raise RuntimeError("svc down")

    reg.add("risk_svc", Boom())
    ctx_src = ExternalSource(name="contextual", key_schema=(("ctx", "string"),))
    parts = [
        ExternalPart(source=RISK, key_mapping={"uid": "user_id"}),
        ExternalPart(source=ctx_src),
    ]
    out = reg.enrich(_requests(spark), parts, graceful=True)
    assert "ext_risk_svc_exception" in out.columns
    rows = out.collect()
    assert all("svc down" in r["ext_risk_svc_exception"] for r in rows)
    assert all(r["ext_contextual_ctx"] == r["ctx"] for r in rows)
    ctx = Context(
        "external.fetching",
        extra=(("external_source", parts[0].full_name()),),
    )
    assert reg.metrics.counter(ctx, "response.failures") == 1
    with pytest.raises(RuntimeError, match="svc down"):
        reg.enrich(_requests(spark), parts)  # graceful=False default


def test_same_source_attached_twice_with_prefixes(spark):
    """Reference ExternalSourcesTest attaches plus_one as p1 AND p2: both
    prefixed column sets materialize with identical values — from ONE
    batched handler call (the registry groups requests by source)."""
    reg = ExternalSourceRegistry()
    h = TableHandler(_lookup(spark))
    reg.add("risk_svc", h)
    parts = [
        ExternalPart(source=RISK, key_mapping={"uid": "user_id"}, prefix="p1"),
        ExternalPart(source=RISK, key_mapping={"uid": "user_id"}, prefix="p2"),
    ]
    out = reg.enrich(_requests(spark), parts)
    for r in out.collect():
        assert r["ext_p1_risk_svc_score"] == r["ext_p2_risk_svc_score"]
        assert r["ext_p1_risk_svc_tier"] == r["ext_p2_risk_svc_tier"]
    assert h.calls == 1  # shared fetch, fanned out to both prefixes


def test_colliding_part_names_raise(spark):
    """Two parts with the same full_name() would emit duplicate output
    columns (AMBIGUOUS_REFERENCE downstream) — rejected up front."""
    reg = ExternalSourceRegistry()
    reg.add("risk_svc", TableHandler(_lookup(spark)))
    parts = [
        ExternalPart(source=RISK, key_mapping={"uid": "user_id"}),
        ExternalPart(source=RISK, key_mapping={"uid": "user_id"}),
    ]
    with pytest.raises(ValueError, match="colliding column namespaces"):
        reg.enrich(_requests(spark), parts, graceful=True)


def test_graceful_catches_execution_time_handler_failure(spark):
    """An RPC-adapter handler returns a VALID lazy frame and only dies when
    Spark executes it. graceful=True must still degrade that part to its
    exception column (the reference fetchJoin contract) instead of blowing
    up the caller's final action and losing every other part."""
    from pyspark.sql.types import DoubleType

    def _boom(_v):
        raise RuntimeError("rpc down at action time")

    boom_udf = F.udf(_boom, DoubleType())

    class LazyBoom(ExternalSourceHandler):
        def fetch(self, _spark, keys):
            # plan construction succeeds; execution raises inside the UDF
            return keys.withColumn("score", boom_udf("user_id")).withColumn(
                "tier", F.lit("t")
            )

    reg = ExternalSourceRegistry()
    reg.add("risk_svc", LazyBoom())
    ctx_src = ExternalSource(name="contextual", key_schema=(("ctx", "string"),))
    parts = [
        ExternalPart(source=RISK, key_mapping={"uid": "user_id"}),
        ExternalPart(source=ctx_src),
    ]
    out = reg.enrich(_requests(spark), parts, graceful=True)
    assert "ext_risk_svc_exception" in out.columns
    rows = out.collect()  # the final action must NOT raise
    assert all(r["ext_risk_svc_exception"] for r in rows)
    assert all(r["ext_contextual_ctx"] == r["ctx"] for r in rows)
