"""Streaming transcript quality (streaming/quality.py): the stateful
conversation battery over micro-batches converges to the EXACT batch
engine row — fingerprint included — with at-least-once redelivery dropped
by first-wins turn identity."""

from __future__ import annotations

import json
import os

from chronon_spark.operators.sessionize import transcript_quality
from chronon_spark.streaming.quality import _round6, streaming_transcript_quality

SCHEMA = "conv_id string, turn_idx long, role string, text string"


def _write_batches(src, batches):
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"part-{i}.json")
        with open(p, "w") as f:
            for conv_id, turn_idx, role, text in rows:
                f.write(json.dumps(
                    {"conv_id": conv_id, "turn_idx": turn_idx,
                     "role": role, "text": text}) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


def _drain_last_per_conv(stream_df, ckpt):
    latest = {}
    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: latest.update(
                {r["conv_id"]: r.asDict() for r in df.collect()}
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return latest


def test_streaming_quality_converges_to_batch(spark, tmp_path):
    rows = [
        # clean conversation split across batches
        ("clean", 0, "user", "hello there"),
        ("clean", 1, "assistant", "hi, how can i help"),
        ("clean", 2, "user", "explain shuffles"),
        ("clean", 3, "assistant", "a shuffle moves data by key"),
        # refusals + an empty turn + a NULL text + copy-paste loop
        ("messy", 0, "user", "q1"),
        ("messy", 1, "assistant", "i cannot help with that"),
        ("messy", 2, "user", "   "),
        ("messy", 3, "assistant", None),
        ("messy", 4, "user", "Same  Turn"),
        ("messy", 5, "assistant", "same turn"),
        # assistant-start conversation
        ("astart", 0, "assistant", "welcome"),
        ("astart", 1, "user", "thanks"),
    ]
    batches = [rows[:4], rows[4:9], rows[9:]]
    # redeliver batch-2 rows verbatim in the final batch (at-least-once)
    batches[2] = batches[2] + rows[4:7]

    src = tmp_path / "src"
    src.mkdir()
    _write_batches(str(src), batches)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    got = _drain_last_per_conv(
        streaming_transcript_quality(stream), str(tmp_path / "ckpt")
    )

    batch_df = spark.createDataFrame(
        [r for r in rows], SCHEMA
    )
    want = {r["conv_id"]: r.asDict() for r in transcript_quality(batch_df).collect()}

    assert set(got) == set(want)
    for conv, w in want.items():
        g = dict(got[conv])
        dups = g.pop("n_dup_deliveries")
        assert g == w, (conv, g, w)
        if conv == "messy":
            assert dups == 3  # the three redelivered rows


def test_streaming_quality_state_continuity(spark, tmp_path):
    """A conversation's verdict FLIPS as later batches complete it — state
    carries forward, never recomputes from a partial view."""
    batches = [
        [("c", 0, "user", "hello")],                      # solo user: fail
        [("c", 1, "assistant", "hi, happy to help")],     # now keeps
    ]
    src = tmp_path / "src"
    src.mkdir()
    _write_batches(str(src), batches)

    per_batch = []
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_transcript_quality(stream)
        .writeStream.outputMode("update")
        .foreachBatch(
            lambda df, bid: per_batch.append(
                {r["conv_id"]: r.asDict() for r in df.collect()}
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = [b["c"] for b in per_batch if "c" in b]
    assert len(snaps) == 2
    assert snaps[0]["tq_keep"] is False and snaps[0]["n_turns"] == 1
    assert snaps[1]["tq_keep"] is True and snaps[1]["n_turns"] == 2


def test_round6_matches_spark_half_up(spark):
    """The tie case where Python's banker's rounding would diverge from
    Spark's HALF_UP: 1/128 at 6 decimals."""
    from pyspark.sql import functions as F

    assert round(0.0078125, 6) == 0.007812  # what banker's would emit
    assert _round6(0.0078125) == 0.007813
    (r,) = spark.range(1).select(F.round(F.lit(0.0078125), 6).alias("v")).collect()
    assert r["v"] == _round6(0.0078125)
