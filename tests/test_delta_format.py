"""Executed Delta Lake format (sources/delta.py): a real _delta_log JSON
transaction log written/replayed purely from the public protocol spec
(delta-io PROTOCOL.md) — the second jar-free open table format next to
sources/iceberg.py, completing the reference's pluggable-provider story
(TableUtils.scala:104-282 detects hive/iceberg/delta per table).

Covers: log/commit spec shape, atomic put-if-absent commits, metadata-only
partition + stats pruning (with a randomized conservativeness differential),
time travel, dynamic partition overwrite, append-only schema evolution,
classic checkpoints (replay from checkpoint == full replay; log truncation
survivable), vacuum retention, and the PartitionedTable adapter running the
repo's incremental backfill unchanged over a ``delta:`` output root."""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from chronon_spark.sources.delta import (
    CHECKPOINT_INTERVAL,
    DeltaTable,
    append,
    create_table,
    overwrite_partitions,
    vacuum,
)


def _df(spark, n=100, shift=0):
    return spark.range(0, n).select(
        (F.col("id") % 4).cast("int").alias("bucket"),
        (F.col("id") + shift).alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("2024-03-0"), ((F.col("id") % 3) + 1).cast("string")).alias("ds"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    create_table(_df(spark), loc, partition_by=["ds"])
    return DeltaTable(loc)


# --- log spec shape -----------------------------------------------------------


def test_commit_zero_spec_shape(table):
    """Version 0 carries protocol + metaData + adds, one JSON action per
    line; metaData.schemaString is Spark schema JSON; add.partitionValues
    are strings; stats carry numRecords/min/max/nullCount."""
    p = os.path.join(table.location, "_delta_log", f"{0:020d}.json")
    assert os.path.exists(p)
    actions = [json.loads(l) for l in open(p) if l.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    md = next(a["metaData"] for a in actions if "metaData" in a)
    assert md["format"]["provider"] == "parquet"
    assert md["partitionColumns"] == ["ds"]
    schema = json.loads(md["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["bucket", "k", "v", "ds"]
    for a in actions:
        if "add" in a:
            add = a["add"]
            assert not os.path.isabs(add["path"])  # spec: relative to root
            assert set(add["partitionValues"]) == {"ds"}
            assert isinstance(add["partitionValues"]["ds"], str)
            st = json.loads(add["stats"])
            assert st["numRecords"] > 0
            assert "k" in st["minValues"] and "k" in st["maxValues"]


def test_scan_equals_source(spark, table):
    exp = sorted(_df(spark).collect())
    got = sorted(table.scan(spark).select("bucket", "k", "v", "ds").collect())
    assert got == exp


def test_partition_pruning_reads_fewer_files_same_answer(spark, table):
    audit_full, audit_one = {}, {}
    table.plan_scan(_audit=audit_full)
    got = table.scan(spark, filters=[("ds", "=", "2024-03-02")], _audit=audit_one)
    assert 0 < audit_one["files_kept"] < audit_full["files_kept"]
    exp = _df(spark).where(F.col("ds") == "2024-03-02")
    assert sorted(got.select(*exp.columns).collect()) == sorted(exp.collect())


def test_stats_bounds_pruning_non_partition_column(spark, tmp_path):
    """A value filter on a NON-partition column prunes via per-file stats:
    write many files with disjoint k ranges, then a tight k filter keeps
    few."""
    loc = str(tmp_path / "t2")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(10, "k")
    # repartition by k hashes, so ranges overlap — write sorted chunks instead
    create_table(
        spark.range(0, 1000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(10, "k"),
        loc,
    )
    t = DeltaTable(loc)
    audit = {}
    got = t.scan(spark, filters=[("k", ">=", 990)], _audit=audit)
    assert audit["files_kept"] < audit["files_total"]
    assert got.count() == 10
    assert df is not None  # silence lint


def test_append_time_travel_and_history(spark, table):
    append(_df(spark, n=50, shift=1000), table.location)
    assert table.scan(spark).count() == 150
    assert table.scan(spark, version=0).count() == 100  # time travel
    hist = table.history()
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["operation"] == "CREATE TABLE AS SELECT"
    assert hist[1]["operation"] == "WRITE"


def test_partitions_listed_from_log_not_filesystem(spark, table):
    parts = table.partitions()
    assert sorted(p["ds"] for p in parts) == ["2024-03-01", "2024-03-02", "2024-03-03"]
    # hide a data directory: log-based listing must NOT notice (a walk would)
    extra = os.path.join(table.location, "ds=2099-01-01")
    os.makedirs(extra, exist_ok=True)
    open(os.path.join(extra, "stray.parquet"), "wb").close()
    assert sorted(p["ds"] for p in table.partitions()) == [
        "2024-03-01", "2024-03-02", "2024-03-03",
    ]


def test_overwrite_partitions_replaces_only_those_days(spark, table):
    v0_rows = table.scan(spark).count()
    new = _df(spark, n=30).where(F.col("ds") == "2024-03-02").withColumn(
        "v", F.lit(-1.0)
    )
    overwrite_partitions(new, table.location)
    cur = table.scan(spark)
    assert cur.where(F.col("ds") == "2024-03-02").agg(F.max("v")).first()[0] == -1.0
    untouched = cur.where(F.col("ds") != "2024-03-02")
    exp = _df(spark).where(F.col("ds") != "2024-03-02")
    assert sorted(untouched.select(*exp.columns).collect()) == sorted(exp.collect())
    # the pre-overwrite version still reads everything (tombstones, not deletes)
    assert table.scan(spark, version=0).count() == v0_rows


def test_append_only_schema_evolution(spark, table):
    evolved = _df(spark, n=20, shift=500).withColumn("extra", F.lit("x"))
    append(evolved, table.location)
    out = table.scan(spark)
    assert "extra" in out.columns
    # old rows surface NULL for the new column; new rows carry it
    assert out.where(F.col("extra").isNull()).count() == 100
    assert out.where(F.col("extra") == "x").count() == 20
    # drops / retypes raise
    with pytest.raises(ValueError, match="append-only"):
        append(_df(spark).drop("v"), table.location)
    with pytest.raises(ValueError, match="append-only"):
        append(_df(spark).withColumn("k", F.col("k").cast("string")), table.location)


def test_atomic_commit_collision_retries(spark, table):
    """Losing the version race is survivable: pre-create the next commit
    file (a faster writer) — the commit lands at the version after it."""
    v = table.current_version()
    blocker = os.path.join(table.location, "_delta_log", f"{v + 1:020d}.json")
    with open(blocker, "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "NOOP", "timestamp": 0}}) + "\n")
    append(_df(spark, n=10, shift=9000), table.location)
    assert table.current_version() == v + 2
    assert table.scan(spark).count() == 110


def test_checkpoint_written_and_equivalent(spark, tmp_path):
    """After CHECKPOINT_INTERVAL commits a classic checkpoint exists;
    replay-from-checkpoint == full replay, and the table stays readable
    after the pre-checkpoint JSON commits are deleted (log truncation)."""
    loc = str(tmp_path / "cp")
    create_table(_df(spark, n=30), loc, partition_by=["ds"])
    for i in range(CHECKPOINT_INTERVAL):
        append(_df(spark, n=5, shift=100 * (i + 1)), loc)
    t = DeltaTable(loc)
    cp_version = t._best_checkpoint(t.current_version())
    assert cp_version is not None
    assert os.path.exists(
        os.path.join(loc, "_delta_log", f"{cp_version:020d}.checkpoint.parquet")
    )
    assert json.load(open(os.path.join(loc, "_delta_log", "_last_checkpoint")))[
        "version"
    ] == cp_version
    full = sorted(t.scan(spark).collect())
    # truncate the log below the checkpoint: reads must be unaffected
    for v in range(cp_version):
        os.unlink(os.path.join(loc, "_delta_log", f"{v:020d}.json"))
    assert sorted(DeltaTable(loc).scan(spark).collect()) == full


def test_vacuum_retention(spark, table):
    """Tombstoned files older than retention are physically deleted; live
    files and fresh tombstones survive."""
    overwrite_partitions(
        _df(spark).where(F.col("ds") == "2024-03-01"), table.location
    )
    n_before = len(
        [p for p in _walk_parquet(table.location)]
    )
    # retain_hours large: nothing deleted
    out = vacuum(table.location, retain_hours=1e6)
    assert out["deleted_files"] == 0
    # retention zero: the replaced files go away; current scan unaffected
    out = vacuum(table.location, retain_hours=0)
    assert out["deleted_files"] > 0
    assert len([p for p in _walk_parquet(table.location)]) < n_before
    cur = table.scan(spark)
    assert cur.count() == 100
    # time travel to v0 now fails at read (files gone) — vacuum's documented trade


def _walk_parquet(root):
    for dirpath, _d, names in os.walk(root):
        if "_delta_log" in dirpath:
            continue
        for n in names:
            if n.endswith(".parquet"):
                yield os.path.join(dirpath, n)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_filter_pruning_differential(spark, tmp_path, seed):
    """Conservativeness sweep: random filter sets over random tables —
    pruned scan must equal full scan + exact filter, every time."""
    rng = random.Random(seed)
    loc = str(tmp_path / f"rf{seed}")
    n = rng.randrange(50, 200)
    df = spark.range(0, n).select(
        (F.col("id") % rng.randrange(2, 5)).cast("int").alias("bucket"),
        F.col("id").alias("k"),
        F.concat(
            F.lit("2024-03-0"), ((F.col("id") % 3) + 1).cast("string")
        ).alias("ds"),
    )
    create_table(df.repartitionByRange(rng.randrange(2, 6), "k"), loc,
                 partition_by=["ds"])
    t = DeltaTable(loc)
    for _ in range(5):
        fs = []
        for col, lo_v, hi_v in (("ds", "2024-03-01", "2024-03-03"), ("k", 0, n)):
            if rng.random() < 0.7:
                op = rng.choice(["=", "<", "<=", ">", ">="])
                val = (
                    rng.choice(["2024-03-01", "2024-03-02", "2024-03-03"])
                    if col == "ds" else rng.randrange(0, n)
                )
                fs.append((col, op, val))
        got = sorted(t.scan(spark, filters=fs or None).collect())
        exp_df = df
        import operator as _o

        ops = {"=": _o.eq, "<": _o.lt, "<=": _o.le, ">": _o.gt, ">=": _o.ge}
        for col, op, val in fs:
            exp_df = exp_df.where(ops[op](F.col(col), F.lit(val)))
        assert got == sorted(exp_df.select("bucket", "k", "ds").collect()), fs


# --- engine wiring --------------------------------------------------------------


def test_scan_source_resolves_delta_with_partition_pushdown(spark, tmp_path):
    from chronon_spark.api import EventSource, Query
    from chronon_spark.sources.scan import scan_source

    loc = str(tmp_path / "ev")
    df = _df(spark, n=90).withColumn(
        "ts", F.timestamp_millis((F.col("k") * 1000).cast("long"))
    )
    create_table(df, loc, partition_by=["ds"])
    src = EventSource(
        table=f"delta:{loc}",
        query=Query(start_partition="2024-03-02", end_partition="2024-03-02"),
    )
    got = scan_source(spark, src)
    exp = df.where(F.col("ds") == "2024-03-02")
    assert sorted(got.select(*exp.columns).collect()) == sorted(exp.collect())
    t = DeltaTable(loc)
    a_full, a_rng = {}, {}
    t.plan_scan(_audit=a_full)
    t.plan_scan(filters=[("ds", ">=", "2024-03-02"), ("ds", "<=", "2024-03-02")],
                _audit=a_rng)
    assert 0 < a_rng["files_kept"] < a_full["files_kept"]


def test_backfill_machinery_over_delta_adapter(spark, tmp_path):
    """tableio.backfill runs unchanged over delta: output roots: resume
    skips, a semantic-hash change archives via tombstone commit (time
    travel keeps the data), recompute refills."""
    from chronon_spark.sources.tableio import backfill, resolve_table

    t = resolve_table(spark, f"delta:{tmp_path}", "feats")
    calls = []

    def compute(spark_, lo, hi):
        calls.append((lo, hi))
        days = spark.createDataFrame(
            [(d,) for d in ["2024-03-01", "2024-03-02", "2024-03-03"]], "ds string"
        ).where((F.col("ds") >= lo) & (F.col("ds") <= hi))
        return days.crossJoin(spark.range(0, 5).select(F.col("id").alias("k")))

    backfill(spark, t, compute, "2024-03-01", "2024-03-03", semantic_hash="h1")
    assert t.partitions() == ["2024-03-01", "2024-03-02", "2024-03-03"]
    assert t.read(spark).count() == 15
    n_calls = len(calls)
    backfill(spark, t, compute, "2024-03-01", "2024-03-03", semantic_hash="h1")
    assert len(calls) == n_calls  # resume: nothing recomputed
    v_before = t.table.current_version()
    backfill(spark, t, compute, "2024-03-01", "2024-03-03", semantic_hash="h2")
    assert len(calls) > n_calls
    assert t.partitions() == ["2024-03-01", "2024-03-02", "2024-03-03"]
    assert (t.lineage("2024-03-02") or {}).get("semantic_hash") == "h2"
    # archived state still reachable through the pre-archive version
    assert t.table.scan(spark, version=v_before).count() == 15
    assert t.read_range(spark, "2024-03-02", "2024-03-02").count() == 5


def test_asof_backfill_over_delta_equals_raw_frame(spark, tmp_path):
    """North-rule slice: the as-of join backfill over a delta: transcript
    table is row-identical to the raw-frame run, per-turn text included."""
    from chronon_spark.api import (
        Aggregation, EventSource, GroupBy, Join, JoinPart, Op, Query,
        TimeUnit, Window,
    )
    from chronon_spark.operators.join import compute_join
    from chronon_spark.sources.scan import scan_source
    from chronon_spark.sources.transcripts import generate_transcripts

    t = generate_transcripts(spark, n_conversations=20, avg_turns=8).withColumn(
        "ds", F.date_format("ts", "yyyy-MM-dd")
    )
    loc = str(tmp_path / "transcripts")
    create_table(t, loc, partition_by=["ds"])

    gb = GroupBy(
        name="conv_stats",
        keys=["conv_id"],
        aggregations=[
            Aggregation(Op.COUNT, "turn_idx", windows=(Window(1, TimeUnit.DAYS),)),
            Aggregation(Op.LAST, "text"),
        ],
    )
    join = Join(name="j", left_keys=["conv_id"], join_parts=[JoinPart(group_by=gb)])
    left = t.where(F.col("role") == "assistant").select("conv_id", "ts")
    ev = scan_source(spark, EventSource(table=f"delta:{loc}", query=Query()))
    out_delta = compute_join(left, {"conv_stats": ev.drop("ds")}, join)
    out_raw = compute_join(left, {"conv_stats": t.drop("ds")}, join)
    assert sorted(out_delta.collect()) == sorted(out_raw.collect())
