"""Streaming -> Iceberg: micro-batches commit as snapshots with an epoch
idempotence guard (streaming/iceberg_sink.py), driven through a REAL
Structured Streaming query (file source, availableNow drain)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.sources.iceberg import IcebergTable
from chronon_spark.streaming.iceberg_sink import (
    iceberg_sink,
    last_committed_epoch,
    write_stream_to_iceberg,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ds", T.StringType()),
    ]
)


def _src(tmp_path, rows):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "part-0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(src)


def test_streaming_commits_snapshots_matching_batch(spark, tmp_path):
    rows = [{"k": i, "ds": f"2024-03-0{1 + i % 3}"} for i in range(60)]
    src = _src(tmp_path, rows)
    loc = str(tmp_path / "ice")
    stream = spark.readStream.schema(SCHEMA).json(src)
    q = write_stream_to_iceberg(
        stream, loc, "tiles_q", str(tmp_path / "ckpt"), partition_by=["ds"]
    )
    q.awaitTermination(120)
    t = IcebergTable(loc)
    got = sorted((r["k"], r["ds"]) for r in t.scan(spark).collect())
    assert got == sorted((r["k"], r["ds"]) for r in rows)
    snap = t.snapshot()
    assert snap["summary"]["streaming-query"] == "tiles_q"
    assert last_committed_epoch(loc, "tiles_q") is not None
    # partitioned like a batch write: pruning works on streamed data
    audit: dict = {}
    t.scan(spark, filters=[("ds", "=", "2024-03-02")], _audit=audit)
    assert 0 < audit["files_kept"] < audit["files_total"]


def test_replayed_epoch_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: after a restart the last micro-batch
    replays with the SAME epoch id. The sink must commit it once."""
    loc = str(tmp_path / "ice")
    sink = iceberg_sink(loc, "q1", partition_by=["ds"])
    batch = spark.createDataFrame([(1, "2024-03-01"), (2, "2024-03-02")], "k long, ds string")
    sink(batch, 0)
    t = IcebergTable(loc)
    assert t.scan(spark).count() == 2
    sink(batch, 0)  # replay: skipped, no duplicate rows, no new snapshot
    assert t.scan(spark).count() == 2
    assert len(t.metadata()["snapshots"]) == 1
    sink(batch.withColumn("k", F.col("k") + 10), 1)  # next epoch commits
    assert t.scan(spark).count() == 4
    assert last_committed_epoch(loc, "q1") == 1
    # a DIFFERENT query's epochs don't collide with this one's
    sink2 = iceberg_sink(loc, "q2", partition_by=["ds"])
    sink2(batch.withColumn("k", F.col("k") + 100), 0)
    assert t.scan(spark).count() == 6
    assert last_committed_epoch(loc, "q2") == 0
    assert last_committed_epoch(loc, "q1") == 1
