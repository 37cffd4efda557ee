"""Job-orchestration CLI: ``python -m chronon_spark <command> ...``.

The reference ships its entry points as Driver.scala subcommands wrapped by
run.py in spark-submit (spark/src/main/scala/ai/chronon/spark/
Driver.scala:1016-1091; api/py/ai/chronon/repo/run.py:390-599). This CLI is
the same surface over the library: feature definitions live in a plain
Python conf file (our analog of the compiled thrift conf), loaded by path,
and each subcommand maps onto the corresponding library lifecycle.

Conf-module contract (only the names a given subcommand needs):

    join                  -> ``join`` (api.Join), ``left(spark)``,
                             ``sources(spark) -> {group_by_name: DataFrame}``
    group-by-backfill     -> ``group_by`` (api.GroupBy), ``source(spark)``
    staging-query-backfill-> ``staging_sql`` (str with {{ start_date }} /
                             {{ end_date }} / {{ latest_date }} /
                             {{ max_date(table=...) }} macros), optional
                             ``setup(spark)`` registering views it reads
    analyze               -> ``group_by``, ``source(spark)``

    optional everywhere: ``tiebreak`` (str), ``strategy`` (str)

Every backfill subcommand is incremental + resumable: written day
partitions with a matching semantic hash are skipped on re-run (the library
backfill contract, sources/tableio.py). Run under spark-submit or plain
python — the session comes from session.get_spark ($SPARK_MASTER /
$SPARK_GRAFT_CPUS govern master selection).
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import sys


def _load_conf(path: str):
    spec = importlib.util.spec_from_file_location("chronon_conf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _opt(conf, name, default=None):
    return getattr(conf, name, default)


def cmd_join(spark, conf, args) -> dict:
    from chronon_spark.operators.join import materialize_join

    final, parts = materialize_join(
        spark,
        conf.left(spark),
        conf.sources(spark),
        conf.join,
        args.out_root,
        args.start_ds,
        args.end_ds,
        tiebreak=_opt(conf, "tiebreak"),
        strategy=_opt(conf, "strategy", "auto"),
        step_days=args.step_days,
    )
    return {
        "command": "join",
        "output_table": final.path,
        "partitions": final.partitions(),
        "part_tables": {p: t.path for p, t in parts.items()},
    }


def cmd_group_by_backfill(spark, conf, args) -> dict:
    from chronon_spark.operators.groupby import snapshot_events
    from chronon_spark.sources.tableio import PartitionedTable, backfill

    gb = conf.group_by
    src = conf.source(spark)
    table = PartitionedTable(f"{args.out_root}/{gb.name}")

    def compute(s, lo, hi):
        from chronon_spark.operators.join import narrow_events

        ev = narrow_events(src, gb, lo, hi)
        return snapshot_events(ev, gb, lo, hi, tiebreak=_opt(conf, "tiebreak"))

    recs = backfill(
        spark, table, compute, args.start_ds, args.end_ds,
        semantic_hash=gb.semantic_hash(), step_days=args.step_days,
    )
    return {
        "command": "group-by-backfill",
        "output_table": table.path,
        "partitions": table.partitions(),
        "chunks": recs,
    }


def cmd_staging_query_backfill(spark, conf, args) -> dict:
    from chronon_spark.sources.tableio import PartitionedTable
    from chronon_spark.staging import backfill_staging_query

    if hasattr(conf, "setup"):
        conf.setup(spark)
    sql = conf.staging_sql
    name = _opt(conf, "name", "staging")
    table = PartitionedTable(f"{args.out_root}/{name}")
    recs = backfill_staging_query(
        spark, sql, table, args.start_ds, args.end_ds,
        semantic_hash=hashlib.sha256(sql.encode()).hexdigest()[:16],
        step_days=args.step_days,
    )
    return {
        "command": "staging-query-backfill",
        "output_table": table.path,
        "partitions": table.partitions(),
        "chunks": recs,
    }


def cmd_analyze(spark, conf, args) -> dict:
    from chronon_spark.operators.analyzer import analyze_group_by

    res = analyze_group_by(conf.source(spark), conf.group_by)
    return {
        "command": "analyze",
        "output_schema": res.output_schema,
        "key_columns": res.key_columns,
        "hot_keys": res.hot_keys,
        "errors": [
            {"code": e.code, "column": e.column, "message": e.message}
            for e in res.errors
        ],
    }


def cmd_analyze_join(spark, conf, args) -> dict:
    from chronon_spark.operators.analyzer import analyze_join

    res = analyze_join(conf.left(spark), conf.sources(spark), conf.join)
    return {
        "command": "analyze-join",
        "output_schema": res.output_schema,
        "part_schemas": res.part_schemas,
        "hot_keys": res.hot_keys,
        "errors": [
            {"code": e.code, "column": e.column, "message": e.message}
            for e in res.errors
        ],
    }


COMMANDS = {
    "join": (cmd_join, True),
    "group-by-backfill": (cmd_group_by_backfill, True),
    "staging-query-backfill": (cmd_staging_query_backfill, True),
    "analyze": (cmd_analyze, False),
    "analyze-join": (cmd_analyze_join, False),
}


def main(argv: list[str] | None = None, spark=None) -> int:
    p = argparse.ArgumentParser(prog="python -m chronon_spark")
    sub = p.add_subparsers(dest="command", required=True)
    for name, (_, needs_range) in COMMANDS.items():
        sp = sub.add_parser(name)
        sp.add_argument("--conf", required=True, help="path to a Python conf module")
        if needs_range:
            sp.add_argument("--out-root", required=True)
            sp.add_argument("--start-ds", required=True)
            sp.add_argument("--end-ds", required=True)
            sp.add_argument("--step-days", type=int, default=30)
    args = p.parse_args(argv)

    conf = _load_conf(args.conf)
    own_session = spark is None
    if own_session:
        from chronon_spark.session import get_spark

        spark = get_spark(f"chronon_spark-{args.command}")
    try:
        fn, _ = COMMANDS[args.command]
        result = fn(spark, conf, args)
    finally:
        if own_session:
            spark.stop()
    print(json.dumps(result, sort_keys=True))
    return 1 if result.get("errors") else 0


if __name__ == "__main__":
    sys.exit(main())
