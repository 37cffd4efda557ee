"""Streaming-ingest SOAK: 100+ real micro-batches with query restarts and
at-least-once redeliveries through the full Kafka-shaped pipeline —

    kafka-record decode -> watermarked offset dedup -> (parquet hand-off)
    -> tile maintenance / stateful sessionize / transcript quality

asserting end-state parity with the batch engines over the first-delivery
log AND bounded state across the whole run (reference streaming/GroupBy +
JoinSourceRunner semantics; the broker itself is env-blocked, every stage
downstream of format("kafka").load() runs for real here).

Marked slow: ~100 source micro-batches + three downstream stateful legs.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.streaming.ingest import (
    decode_kafka_records,
    dedupe_kafka_stream,
    read_event_stream,
)

pytestmark = pytest.mark.slow

EVENT_SCHEMA = "conv_id string, turn_idx long, role string, text string, ts timestamp"
RAW_SCHEMA = (
    "key string, value string, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)
N_FILES = 100
PHASES = (40, 80, N_FILES)  # query restart after files [0,40) and [40,80)
REDELIVER_TAIL = 3  # records of file k-1 redelivered (same offsets) in file k


@pytest.fixture(scope="module")
def soak_env(spark, tmp_path_factory):
    """Kafka-record-shaped source files (globally event-time ordered, with
    cross-file redeliveries) + the first-delivery truth log."""
    from chronon_spark.sources.transcripts import generate_transcripts

    root = tmp_path_factory.mktemp("soak")
    src = root / "src"
    src.mkdir()
    t = generate_transcripts(spark, n_conversations=60, avg_turns=25, n_days=3)
    rows = (
        t.select(
            "conv_id", "turn_idx", "role", "text",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias("ts"),
        )
        .orderBy("ts", "conv_id", "turn_idx")
        .collect()
    )
    assert len(rows) >= 1200
    per_file = len(rows) // N_FILES

    def record(i, r):
        return {
            "key": r["conv_id"],
            "value": json.dumps(r.asDict()),
            "topic": "transcripts",
            "partition": hash(r["conv_id"]) % 4,
            "offset": i,
            "timestamp": r["ts"],
            "timestampType": 0,
        }

    files: list[list[dict]] = []
    for k in range(N_FILES):
        lo = k * per_file
        hi = len(rows) if k == N_FILES - 1 else (k + 1) * per_file
        batch = [record(i, rows[i]) for i in range(lo, hi)]
        if k > 0:
            # at-least-once: the previous file's tail is delivered AGAIN
            # with identical (topic, partition, offset) identity
            batch = [record(i, rows[i]) for i in range(lo - REDELIVER_TAIL, lo)] + batch
        files.append(batch)
    n_delivered = sum(len(b) for b in files)
    assert n_delivered == len(rows) + (N_FILES - 1) * REDELIVER_TAIL
    truth = spark.createDataFrame(
        [tuple(r) for r in rows], "conv_id string, turn_idx long, role string, text string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    return root, src, files, truth, len(rows)


def _write_files(src, files, lo, hi):
    for k in range(lo, hi):
        path = src / f"part-{k:04d}.json"
        with open(path, "w") as f:
            for rec in files[k]:
                f.write(json.dumps(rec) + "\n")
        os.utime(path, (1_700_000_000 + k, 1_700_000_000 + k))


def _drain(stream_df, ckpt, sink):
    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_soak_offset_dedup_tiles_sessions_quality(spark, soak_env):
    root, src, files, truth, n_true = soak_env
    deduped_dir = str(root / "deduped")
    os.makedirs(deduped_dir, exist_ok=True)

    # ---- stage 1: decode + watermarked offset dedup; files land in three
    # phases and the query RESTARTS from its checkpoint between them (the
    # deploy-restart / failure-recovery shape), one file per micro-batch
    state_rows: list[int] = []

    def stage1():
        raw = read_event_stream(
            spark, str(src), schema=RAW_SCHEMA, source_format="json",
            options={"maxFilesPerTrigger": "1"},
        )
        decoded = decode_kafka_records(raw, EVENT_SCHEMA, keep_meta=True)
        return dedupe_kafka_stream(decoded, "ts", delay="2 hours")

    def write_clean(df, _bid):
        out = df.drop("_kafka_topic", "_kafka_partition", "_kafka_offset", "_kafka_timestamp")
        if out.isEmpty():
            return
        out.coalesce(1).write.mode("append").parquet(deduped_dir)

    visible = 0
    for phase_end in PHASES:
        _write_files(src, files, visible, phase_end)
        q = _drain(stage1(), str(root / "ckpt1"), write_clean)
        lp = q.lastProgress
        if lp and lp.get("stateOperators"):
            state_rows.append(lp["stateOperators"][0]["numRowsTotal"])
        visible = phase_end

    # every redelivery was dropped: the hand-off equals the truth log exactly
    clean = spark.read.schema(EVENT_SCHEMA).parquet(deduped_dir)
    assert clean.count() == n_true
    assert sorted(map(repr, clean.select(*truth.columns).collect())) == sorted(
        map(repr, truth.collect())
    )
    # dedup state is watermark-bounded: far below the total record count
    assert state_rows and max(state_rows) < n_true * 0.5

    # ---- stage 2: tile maintenance over the deduped hand-off (KV upserts)
    from chronon_spark.streaming.tiles import streaming_tiles, tile_aggregates

    gb = GroupBy(
        name="soak",
        keys=["conv_id"],
        aggregations=[Aggregation(Op.COUNT, "turn_idx"), Aggregation(Op.SUM, "turn_idx")],
    )
    kv: dict = {}

    def upsert(df, _bid):
        for r in df.collect():
            kv[(r["conv_id"], r["tile_start_ms"])] = (r["a0__n"], r["a1__s"])

    clean_stream = read_event_stream(
        spark, deduped_dir, schema=EVENT_SCHEMA, source_format="parquet",
        options={"maxFilesPerTrigger": "2"},
    )
    tiles = streaming_tiles(clean_stream, gb, hop="30 minutes", watermark="30 minutes")
    _drain(tiles, str(root / "ckpt2"), upsert)

    exprs = tile_aggregates(gb, None)
    want_tiles = {
        (r["conv_id"], r["tile_start_ms"]): (r["a0__n"], r["a1__s"])
        for r in (
            clean.groupBy(F.window(F.col("ts"), "30 minutes").alias("tile"), "conv_id")
            .agg(*[c.alias(n) for n, c in exprs.items()])
            .select("conv_id", F.unix_millis("tile.start").alias("tile_start_ms"), "a0__n", "a1__s")
        ).collect()
    }
    assert kv == want_tiles and len(kv) > 50

    # ---- stage 3: stateful sessionize over the hand-off, restarted midway
    from chronon_spark.operators.sessionize import session_stats
    from chronon_spark.streaming.sessions import streaming_sessionize_stateful

    final_sessions: dict = {}

    def sess_sink(df, _bid):
        for r in df.collect():
            final_sessions[(r["conv_id"], r["session_id"])] = (
                r["start_ms"], r["end_ms"], r["n_rows"],
            )

    sess_stream = read_event_stream(
        spark, deduped_dir, schema=EVENT_SCHEMA, source_format="parquet",
        options={"maxFilesPerTrigger": "3"},
    )
    sess = streaming_sessionize_stateful(sess_stream, ["conv_id"], "ts", "30 minutes")
    _drain(sess, str(root / "ckpt3"), sess_sink)

    want_sessions = {
        (r["conv_id"], r["session_id"]): (r["start_ms"], r["end_ms"], r["n_rows"])
        for r in session_stats(clean, ["conv_id"], "ts", "30 minutes").collect()
    }
    assert final_sessions == want_sessions

    # ---- stage 4: transcript quality converges to the batch row
    from chronon_spark.operators.sessionize import transcript_quality
    from chronon_spark.streaming.quality import streaming_transcript_quality

    latest_q: dict = {}

    def q_sink(df, _bid):
        for r in df.collect():
            latest_q[r["conv_id"]] = (
                r["n_turns"], r["n_assistant_turns"], r["conv_fingerprint"], r["tq_keep"],
            )

    q_stream = read_event_stream(
        spark, deduped_dir, schema=EVENT_SCHEMA, source_format="parquet",
        options={"maxFilesPerTrigger": "5"},
    )
    _drain(
        streaming_transcript_quality(q_stream), str(root / "ckpt4"), q_sink
    )
    want_q = {
        r["conv_id"]: (
            r["n_turns"], r["n_assistant_turns"], r["conv_fingerprint"], r["tq_keep"]
        )
        for r in transcript_quality(clean).collect()
    }
    assert latest_q == want_q
