"""Streaming corpus dedup (streaming/ingest.dedup_stream_exact): first
arrival of any normalized content survives across micro-batches; the
watermark-bounded variant suppresses duplicates only inside the late
window."""

from __future__ import annotations

import json
import os

from chronon_spark.streaming.ingest import dedup_stream_exact, read_event_stream

SCHEMA = "doc_id long, text string, ts timestamp"


def _write(src, rows):
    # one file per micro-batch, mtime-ordered
    for i, batch in enumerate(rows):
        p = os.path.join(src, f"part-{i}.json")
        with open(p, "w") as f:
            for doc_id, text, ts in batch:
                f.write(json.dumps({"doc_id": doc_id, "text": text, "ts": ts}) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))


def _drain(stream_df, ckpt, mode="append"):
    batches = []
    q = (
        stream_df.writeStream.outputMode(mode)
        .foreachBatch(lambda df, bid: batches.append((bid, df.toPandas())))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [r for _, pdf in batches for r in pdf.itertuples()]


def test_dedup_stream_first_arrival_wins_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(str(src), [
        [(1, "alpha beta", "2024-01-01 00:00:00"), (2, "gamma delta", "2024-01-01 00:01:00")],
        [(3, "Alpha   BETA", "2024-01-01 00:02:00"),   # normalized dup of doc 1
         (4, "epsilon", "2024-01-01 00:03:00")],
        [(5, "gamma delta", "2024-01-01 00:04:00"),    # dup of doc 2
         (6, "zeta", "2024-01-01 00:05:00")],
    ])
    stream = read_event_stream(
        spark, str(src), schema=SCHEMA, source_format="json",
        options={"maxFilesPerTrigger": "1"},
    )
    out = _drain(dedup_stream_exact(stream), str(tmp_path / "ck"))
    survivors = sorted(r.doc_id for r in out)
    assert survivors == [1, 2, 4, 6]


def test_dedup_stream_within_watermark_bounds_state(spark, tmp_path):
    """With a 1-minute window, a duplicate arriving AFTER the watermark has
    passed its twin is admitted again — bounded-state semantics."""
    src = tmp_path / "src"
    src.mkdir()
    _write(str(src), [
        [(1, "alpha", "2024-01-01 00:00:00")],
        [(2, "alpha", "2024-01-01 00:00:30")],   # inside window: suppressed
        [(3, "filler", "2024-01-01 00:10:00")],  # advances the watermark
        [(5, "filler2", "2024-01-01 00:15:00")], # watermark commits lag one batch
        [(4, "alpha", "2024-01-01 00:20:00")],   # far past window: re-admitted
    ])
    stream = read_event_stream(
        spark, str(src), schema=SCHEMA, source_format="json",
        options={"maxFilesPerTrigger": "1"},
    )
    out = _drain(
        dedup_stream_exact(stream, event_time_col="ts", within="1 minute"),
        str(tmp_path / "ck2"),
    )
    survivors = sorted(r.doc_id for r in out)
    assert 1 in survivors and 2 not in survivors
    assert 4 in survivors  # state for 'alpha' was evicted by the watermark
