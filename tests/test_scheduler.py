"""Scheduler: Flow/Node DAG, join-backfill flow shape, the LocalAdapter
running a real split-phase backfill via subprocesses, and Airflow DAG-file
emission (reference api/py/ai/chronon/scheduler/ + repo/join_backfill.py)."""

from __future__ import annotations

import ast
import json
import os

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
from chronon_spark.scheduler import (
    AirflowAdapter,
    Flow,
    LocalAdapter,
    Node,
    join_backfill_flow,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

SCHED_JOIN_CONF = f"""
from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window
from pyspark.sql import functions as F

_a = GroupBy(
    name="sched_a", keys=["user_id"],
    aggregations=[Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),))],
)
_b = GroupBy(
    name="sched_b", keys=["user_id"],
    aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))],
)
join = Join(name="sched_join", left_keys=["user_id"],
            join_parts=[JoinPart(group_by=_a), JoinPart(group_by=_b)])
tiebreak = "event_id"

def left(spark):
    ev = spark.read.parquet("{SF_DIR}/events.parquet")
    return ev.where(F.col("event_type") == "purchase").select("user_id", "ts")

def sources(spark):
    ev = spark.read.parquet("{SF_DIR}/events.parquet")
    return {{"sched_a": ev, "sched_b": ev}}
"""


def _join_def():
    a = GroupBy(
        name="sched_a", keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),))],
    )
    b = GroupBy(
        name="sched_b", keys=["user_id"],
        aggregations=[Aggregation(Op.COUNT, "value", windows=(Window(1, TimeUnit.DAYS),))],
    )
    return Join(name="sched_join", left_keys=["user_id"],
                join_parts=[JoinPart(group_by=a), JoinPart(group_by=b)])


def test_flow_topo_order_and_cycle_detection():
    f = Flow("t")
    a, b, c = Node("a", ["true"]), Node("b", ["true"]), Node("c", ["true"])
    b.add_dependency(a)
    c.add_dependency(b)
    for n in (c, a, b):
        f.add_node(n)
    assert [n.name for n in f.topo_order()] == ["a", "b", "c"]
    assert f.find_node("b") is b and f.find_node("zzz") is None
    viz = f.visualize()
    assert viz.splitlines()[0] == "- c" and "        - a" in viz
    # nodes dedup by name (reference Node.__eq__/__hash__)
    f.add_node(Node("a", ["false"]))
    assert len(f.nodes) == 3
    a.add_dependency(c)  # now a cycle
    with pytest.raises(ValueError, match="cycle"):
        f.topo_order()


def test_join_backfill_flow_shape():
    flow = join_backfill_flow(
        _join_def(), "/conf/j.py", "/out", "2024-01-01", "2024-01-03"
    )
    names = {n.name for n in flow.nodes}
    assert names == {
        "compute_join__sched_join__left_table",
        "compute_join__sched_join__sched_a",
        "compute_join__sched_join__sched_b",
        "compute_join__sched_join",
    }
    left = flow.find_node("compute_join__sched_join__left_table")
    final = flow.find_node("compute_join__sched_join")
    for prefix in ("sched_a", "sched_b"):
        part = flow.find_node(f"compute_join__sched_join__{prefix}")
        assert part.dependencies == {left}
        assert part in final.dependencies
        assert "--selected-parts" in part.command and prefix in part.command
    assert "--selected-parts" not in final.command
    # topological order: left first, final last
    order = [n.name for n in flow.topo_order()]
    assert order[0].endswith("left_table") and order[-1] == "compute_join__sched_join"


def test_airflow_dag_file_emission(tmp_path):
    flow = join_backfill_flow(
        _join_def(), "/conf/j.py", "/out", "2024-01-01", "2024-01-03"
    )
    ad = AirflowAdapter("sched_join_backfill", "2024-01-05")
    p = ad.emit_dag_file(flow, str(tmp_path / "dag_sched_join.py"))
    src = open(p).read()
    ast.parse(src)  # valid python module
    assert "DAG(" in src and src.count("BashOperator(") == 4
    assert "task_id='compute_join__sched_join__sched_a'" in src
    assert "--selected-parts sched_a" in src
    # dependency edges: final upstreams both parts, parts upstream left
    assert src.count(".set_upstream(") == 4
    # airflow itself is absent in the sandbox: setup() must say so clearly
    with pytest.raises(ImportError):
        ad.setup()


def test_local_adapter_runs_split_backfill(spark, tmp_path):
    """End-to-end: the LocalAdapter executes the emitted flow — join-left,
    two parallel-safe --selected-parts nodes, final assembly — as real
    subprocesses, and the final table equals a direct in-process
    materialize_join."""
    conf = tmp_path / "sched_conf.py"
    conf.write_text(SCHED_JOIN_CONF)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    days = sorted(
        r["d"] for r in
        ev.select(F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().collect()
    )
    lo, hi = days[0], days[2]
    out_root = str(tmp_path / "out")
    flow = join_backfill_flow(_join_def(), str(conf), out_root, lo, hi)
    la = LocalAdapter()
    la.build_dag_from_flow(flow)
    results = la.trigger_run()
    assert [r["returncode"] for r in results] == [0, 0, 0, 0]
    # part nodes materialized only their own tables (no final assembly)
    part_res = json.loads(results[1]["stdout"].strip().splitlines()[-1])
    assert part_res["command"] == "join-final" and "output_table" not in part_res
    assert len(part_res["part_tables"]) == 1
    # final node assembled; its output equals the direct library run
    final_res = json.loads(results[-1]["stdout"].strip().splitlines()[-1])
    assert final_res["partitions"] == sorted(final_res["partitions"])

    from chronon_spark.operators.join import materialize_join

    direct_root = str(tmp_path / "direct")
    left = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    final_t, _parts = materialize_join(
        spark, left, {"sched_a": ev, "sched_b": ev}, _join_def(),
        direct_root, lo, hi, tiebreak="event_id",
    )
    got = spark.read.option("basePath", os.path.join(out_root, "sched_join")).parquet(
        os.path.join(out_root, "sched_join")
    )
    want = final_t.read(spark)
    assert sorted(map(repr, got.collect())) == sorted(map(repr, want.collect()))


def test_join_final_rejects_unknown_selected_part(spark, tmp_path):
    from chronon_spark.operators.join import materialize_join

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    left = ev.select("user_id", "ts").limit(10)
    with pytest.raises(ValueError, match="unknown join part prefixes"):
        materialize_join(
            spark, left, {"sched_a": ev, "sched_b": ev}, _join_def(),
            str(tmp_path / "x"), "2024-01-01", "2024-01-02",
            selected_parts=["typo"],
        )
