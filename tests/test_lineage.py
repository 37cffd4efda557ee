"""Column-level lineage (reference api/py/ai/chronon/lineage/
lineage_parser.py:1-798 + lineage_metadata.py ColumnTransform): every edge
below is a known, hand-derived fact about a seeded definition. The parse is
Catalyst's own (sessionState().sqlParser()), so lineage and execution share
one grammar."""

from __future__ import annotations

import json

from chronon_spark.api import (
    Aggregation,
    ExternalPart,
    ExternalSource,
    GroupBy,
    Join,
    JoinPart,
    Op,
    Query,
    TimeUnit,
    Window,
)
from chronon_spark.lineage import (
    ColumnLineage,
    LineageMetaData,
    expression_inputs,
    group_by_lineage,
    join_lineage,
    query_lineage,
)

W7D = Window(7, TimeUnit.DAYS)


def test_expression_inputs_transform_chains(spark):
    got = expression_inputs(spark, "sum(IF(status = 'refund', -amount, amount))")
    assert set(got) == {"status", "amount"}
    assert ("sum", "if", "equalto") in got["status"]
    chains = set(got["amount"])
    assert ("sum", "if", "unaryminus") in chains  # the negated branch
    assert ("sum", "if") in chains  # the passthrough branch


def test_expression_inputs_star_cast_qualified(spark):
    # Catalyst normalizes count(*) to count(1): correctly NO column inputs
    assert expression_inputs(spark, "count(*)") == {}
    assert "*" in expression_inputs(spark, "*")
    got = expression_inputs(spark, "cast(t.amount as double)")
    assert got == {"amount": [("cast",)]}
    got = expression_inputs(spark, "amount")  # bare reference: empty chain
    assert got == {"amount": [()]}


def test_query_lineage_selects_and_passthrough(spark):
    q = Query(selects={"v": "price * (1 - discount)", "uid": "user_id"})
    edges = set(query_lineage(spark, q, "raw.events", "scanned"))
    assert ColumnLineage("scanned", "v", "raw.events", "price", ("multiply",)) in edges
    assert (
        ColumnLineage("scanned", "v", "raw.events", "discount", ("multiply", "subtract")) in edges
    )
    assert ColumnLineage("scanned", "uid", "raw.events", "user_id") in edges
    # selects=None: identity over the provided namespace
    edges = query_lineage(spark, Query(), "raw.events", "scanned", input_columns=["a", "b"])
    assert set(edges) == {
        ColumnLineage("scanned", "a", "raw.events", "a"),
        ColumnLineage("scanned", "b", "raw.events", "b"),
    }


GB = GroupBy(
    name="gb_lin",
    keys=["user_id"],
    aggregations=[
        Aggregation(Op.SUM, "value", windows=(W7D,)),
        Aggregation(Op.COUNT, "value", buckets=("event_type",)),
        Aggregation(
            Op.TIME_DECAYED_SUM, "value", windows=(W7D,), halflife=Window(1, TimeUnit.DAYS)
        ),
    ],
)


def test_group_by_lineage_agg_edges(spark):
    edges = set(group_by_lineage(spark, GB, "src"))
    assert ColumnLineage("gb_lin", "user_id", "src", "user_id") in edges
    assert ColumnLineage("gb_lin", "value_sum_7d", "src", "value", ("sum", "window_7d")) in edges
    # windowed aggs observe event time
    assert (
        ColumnLineage("gb_lin", "value_sum_7d", "src", "ts", ("sum", "event_time")) in edges
    )
    # bucketed: bucket column is an input
    assert ColumnLineage("gb_lin", "value_count_by_event_type", "src", "event_type",
                         ("count", "bucket")) in edges
    assert ColumnLineage("gb_lin", "value_count_by_event_type", "src", "value",
                         ("count",)) in edges
    decayed = [e for e in edges if "time_decayed_sum" in e.output_column]
    assert any(e.input_column == "ts" for e in decayed)


def test_group_by_lineage_derivations(spark):
    gb = GroupBy(
        name="gb_d",
        keys=["user_id"],
        aggregations=[
            Aggregation(Op.SUM, "value", windows=(W7D,)),
            Aggregation(Op.COUNT, "value", windows=(W7D,)),
        ],
        derivations={"*": "*", "avg_7d": "value_sum_7d / value_count_7d"},
    )
    edges = set(group_by_lineage(spark, gb, "src"))
    # derived column composes its chain ON TOP of the aggregation chain
    assert ColumnLineage("gb_d", "avg_7d", "src", "value", ("divide", "sum", "window_7d")) in edges
    # '*' keeps the base aggregates
    assert ColumnLineage("gb_d", "value_sum_7d", "src", "value", ("sum", "window_7d")) in edges

    # without '*': only keys + derived survive (apply_derivations contract)
    gb2 = GroupBy(
        name="gb_d2", keys=["user_id"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(W7D,))],
        derivations={"doubled": "value_sum_7d * 2"},
    )
    outs = {e.output_column for e in group_by_lineage(spark, gb2, "src")}
    assert outs == {"user_id", "doubled"}


def test_join_lineage_prefix_keymap_external(spark):
    gb = GroupBy(
        name="purchases", keys=["customer_id"],
        aggregations=[Aggregation(Op.SUM, "value", windows=(W7D,))],
    )
    ext = ExternalSource(
        name="risk score",
        key_schema=(("customer_id", "long"),),
        value_schema=(("score", "double"),),
    )
    join = Join(
        name="j_lin",
        left_keys=["user_id"],
        join_parts=[JoinPart(group_by=gb, key_mapping={"user_id": "customer_id"}, prefix="p")],
        external_parts=[
            ExternalPart(source=ext, key_mapping={"user_id": "customer_id"}),
            ExternalPart(
                source=ExternalSource(
                    name="contextual",
                    key_schema=(("user_id", "long"),),
                    value_schema=(("user_id", "long"),),
                )
            ),
        ],
    )
    edges = set(join_lineage(spark, join, "left_t", left_columns=["user_id", "ts"],
                             sources={"purchases": "src.purchases"}))
    # part feature column: prefixed, traced to the part source
    assert ColumnLineage("j_lin", "p_purchases_value_sum_7d", "src.purchases", "value",
                         ("sum", "window_7d")) in edges
    # key flip: left user_id (not customer_id) passes through from the left
    assert ColumnLineage("j_lin", "user_id", "left_t", "user_id") in edges
    assert not any(e.output_column == "customer_id" for e in edges)
    # external part: value column from the serving source + lookup key
    assert ColumnLineage("j_lin", "ext_risk_score_score", "external:risk score", "score") in edges
    assert ColumnLineage("j_lin", "ext_risk_score_score", "left_t", "user_id",
                         ("lookup_key",)) in edges
    # contextual part: left column echo
    assert ColumnLineage("j_lin", "ext_contextual_user_id", "left_t", "user_id") in edges


def test_lineage_metadata_container(spark):
    md = LineageMetaData()
    md.store(group_by_lineage(spark, GB, "src"))
    md.store(group_by_lineage(spark, GB, "src"))  # idempotent
    n = len(md.edges)
    assert n == len(set(md.edges))
    assert "gb_lin" in md.tables() and "src" in md.tables()
    ups = md.inputs_of("gb_lin", "value_sum_7d")
    assert {e.input_column for e in ups} == {"value", "ts"}
    # round-trips through JSON
    assert json.loads(json.dumps(md.as_dict()))["tables"]["gb_lin"]


def test_metadata_export_carries_lineage(spark, tmp_path, capsys):
    from chronon_spark.__main__ import main

    conf = tmp_path / "conf.py"
    conf.write_text(
        """
from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart, Op, TimeUnit, Window

_gb = GroupBy(
    name="exp_gb", keys=["user_id"],
    aggregations=[Aggregation(Op.SUM, "value", windows=(Window(7, TimeUnit.DAYS),))],
)
group_by = _gb
join = Join(name="exp_join", left_keys=["user_id"], join_parts=[JoinPart(group_by=_gb)])
"""
    )
    rc = main(["metadata-export", "--conf", str(conf)], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    edges = res["lineage"]["edges"]
    assert {
        "output_table": "exp_gb", "output_column": "value_sum_7d",
        "input_table": "source:exp_gb", "input_column": "value",
        "transforms": ["sum", "window_7d"],
    } in edges
    assert any(
        e["output_table"] == "exp_join" and e["output_column"] == "exp_gb_value_sum_7d"
        for e in edges
    )
    assert "exp_join" in res["lineage"]["tables"]


def test_sql_lineage_cte_composition(spark):
    from chronon_spark.lineage import sql_lineage

    sql = """
    WITH x AS (SELECT user_id, value * 2 AS v2 FROM events WHERE ds = '2024-01-01')
    SELECT e.user_id, sum(x.v2) AS total, count(*) AS n
    FROM events e JOIN x ON e.user_id = x.user_id
    GROUP BY e.user_id
    """
    edges = set(sql_lineage(spark, sql, "stg"))
    assert ColumnLineage("stg", "user_id", "events", "user_id") in edges
    # composes THROUGH the CTE: total <- events.value with both chains
    assert ColumnLineage("stg", "total", "events", "value", ("sum", "multiply")) in edges
    # count(*) has no column inputs (Catalyst normalizes to count(1))
    assert not any(e.output_column == "n" for e in edges)


def test_sql_lineage_union_star_and_macros(spark):
    from chronon_spark.lineage import sql_lineage

    sql = """
    SELECT * FROM (
      SELECT user_id AS uid, upper(event_type) AS et FROM events
      WHERE ds BETWEEN {{ start_date }} AND {{ end_date }}
      UNION ALL
      SELECT customer_id AS uid, 'x' AS et FROM orders
    ) u
    """
    edges = set(sql_lineage(spark, sql, "stg"))
    # star over the subquery preserves ITS output names; union merges sides
    assert ColumnLineage("stg", "uid", "events", "user_id") in edges
    assert ColumnLineage("stg", "uid", "orders", "customer_id") in edges
    assert ColumnLineage("stg", "et", "events", "event_type", ("upper",)) in edges
    # the 'x' literal side of et contributes no edge
    assert not any(e.output_column == "et" and e.input_table == "orders" for e in edges)


def test_sql_lineage_ambiguity_and_schema_resolution(spark):
    from chronon_spark.lineage import sql_lineage

    sql = "SELECT value, o_totalprice FROM events e JOIN orders o ON e.user_id = o.o_custkey"
    amb = set(sql_lineage(spark, sql, "stg"))
    # without schemas an unqualified two-source reference is SURFACED, not guessed
    assert ColumnLineage("stg", "value", "<ambiguous>", "value") in amb
    res = set(
        sql_lineage(
            spark, sql, "stg",
            schemas={"events": ["value", "user_id"], "orders": ["o_totalprice", "o_custkey"]},
        )
    )
    assert ColumnLineage("stg", "value", "events", "value") in res
    assert ColumnLineage("stg", "o_totalprice", "orders", "o_totalprice") in res


def test_metadata_export_staging_query_lineage(spark, tmp_path, capsys):
    """metadata-export on a staging conf parses the FULL SQL for lineage
    (reference parse_staging_query), macros included."""
    from chronon_spark.__main__ import main

    conf = tmp_path / "stg_conf.py"
    conf.write_text(
        '''
name = "stg_q"
staging_sql = """
  SELECT user_id, count(*) AS n, max(value) AS top_v
  FROM events
  WHERE ds BETWEEN {{ start_date }} AND {{ end_date }}
  GROUP BY user_id
"""
'''
    )
    rc = main(["metadata-export", "--conf", str(conf)], spark=spark)
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["staging_query"]["name"] == "stg_q"
    edges = res["lineage"]["edges"]
    assert {
        "output_table": "stg_q", "output_column": "top_v",
        "input_table": "events", "input_column": "value", "transforms": ["max"],
    } in edges
    assert {
        "output_table": "stg_q", "output_column": "user_id",
        "input_table": "events", "input_column": "user_id", "transforms": [],
    } in edges
