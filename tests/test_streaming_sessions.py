"""Streaming sessionization (file source, multi-micro-batch availableNow):

- the applyInPandasWithState sessionizer's reconciled output must equal the
  batch ``session_stats`` over the same rows (ordinals, bounds, counts);
- a session spanning micro-batch boundaries stays ONE session;
- cross-batch late rows are dropped and counted (0-lateness policy);
- the native ``F.session_window`` path closes the same sessions once the
  watermark passes them.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from chronon_spark.operators.sessionize import session_stats
from chronon_spark.streaming.ingest import read_event_stream
from chronon_spark.streaming.sessions import (
    streaming_session_stats,
    streaming_sessionize_stateful,
)

SCHEMA = "conv_id string, turn_idx int, ts timestamp"
BASE = "2024-01-01 00:"
GAP_MS = 60_000  # 1 minute


def _rows():
    """(conv_id, minute:second) turns; 1-minute gap => strictly-greater breaks.

    c1: sessions [00:00..01:00] (60s deltas stay joined), [03:30..03:40],
        [09:00] — first session spans the file-1/file-2 boundary.
    c2: one session [00:30..06:30] with every delta exactly == gap (all joined),
        also spanning every file boundary.
    c3: single-turn sessions far apart: [00:00], [05:00], [11:00].
    """
    return [
        ("c1", "00:00.000"), ("c1", "01:00.000"),          # file 1
        ("c2", "00:30.000"), ("c2", "01:30.000"), ("c2", "02:30.000"),
        ("c3", "00:00.000"),
        ("c1", "02:00.000"),                                # file 2 (<=gap: joins)
        ("c1", "03:30.000"), ("c1", "03:40.000"),
        ("c2", "03:30.000"), ("c2", "04:30.000"),
        ("c3", "05:00.000"),
        ("c1", "09:00.000"),                                # file 3
        ("c2", "05:30.000"), ("c2", "06:30.000"),
        ("c3", "11:00.000"),
    ]


FILE_SPLITS = (6, 12)  # rows 0..5 -> file 1, 6..11 -> file 2, rest -> file 3


def _write_files(src_dir, rows, splits=FILE_SPLITS):
    bounds = [0, *splits, len(rows)]
    for i in range(len(bounds) - 1):
        path = os.path.join(src_dir, f"part-{i}.json")
        with open(path, "w") as f:
            for j, (conv, mmss) in enumerate(rows[bounds[i] : bounds[i + 1]]):
                f.write(
                    json.dumps(
                        {"conv_id": conv, "turn_idx": bounds[i] + j, "ts": BASE + mmss}
                    )
                    + "\n"
                )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))  # enforce order


def _drain(stream_df, ckpt):
    """availableNow drain, one file per micro-batch, collecting every batch."""
    batches = []
    q = (
        stream_df.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: batches.append((bid, df.toPandas())))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches


def _open_stream(spark, src, max_files=1):
    return read_event_stream(
        spark,
        str(src),
        schema=SCHEMA,
        source_format="json",
        options={"maxFilesPerTrigger": str(max_files)},
    )


def _batch_sessions(spark, src):
    df = spark.read.schema(SCHEMA).json(str(src))
    out = session_stats(df, ["conv_id"], "ts", GAP_MS)
    return {
        (r["conv_id"], r["session_id"]): (r["start_ms"], r["end_ms"], r["n_rows"])
        for r in out.collect()
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_files(str(src), _rows())

    stream = _open_stream(spark, src)
    sess = streaming_sessionize_stateful(stream, ["conv_id"], "ts", GAP_MS)
    batches = _drain(sess, str(tmp_path / "ckpt"))
    assert len(batches) >= 3, "expected one micro-batch per file"

    # update semantics: last emission per (conv_id, session_id) wins
    final = {}
    for _bid, pdf in batches:
        for r in pdf.itertuples():
            final[(r.conv_id, r.session_id)] = (r.start_ms, r.end_ms, r.n_rows)
    assert final == _batch_sessions(spark, src)

    # every session but each key's last was emitted closed exactly once
    closed = [
        (r.conv_id, r.session_id)
        for _bid, pdf in batches
        for r in pdf.itertuples()
        if r.closed
    ]
    assert len(closed) == len(set(closed))
    per_key_last = {}
    for conv, sid in final:
        per_key_last[conv] = max(per_key_last.get(conv, -1), sid)
    assert sorted(set(closed)) == sorted(
        k for k in final if k[1] < per_key_last[k[0]]
    )


def test_cross_batch_late_rows_dropped(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = _rows()
    _write_files(str(src), rows)
    # file 4: a late row for c1 BEFORE its already-seen 09:00 turn
    late = os.path.join(str(src), "part-9.json")
    with open(late, "w") as f:
        f.write(json.dumps({"conv_id": "c1", "turn_idx": 99, "ts": BASE + "08:00.000"}) + "\n")
    os.utime(late, (1_700_000_009, 1_700_000_009))

    stream = _open_stream(spark, src)
    sess = streaming_sessionize_stateful(stream, ["conv_id"], "ts", GAP_MS)
    batches = _drain(sess, str(tmp_path / "ckpt"))

    last_batch = batches[-1][1]
    assert len(last_batch) == 1
    r = last_batch.iloc[0]
    assert (r.conv_id, r.late_dropped) == ("c1", 1)
    # session untouched by the late row
    final = {}
    for _bid, pdf in batches:
        for rr in pdf.itertuples():
            final[(rr.conv_id, rr.session_id)] = (rr.start_ms, rr.end_ms, rr.n_rows)
    clean = tmp_path / "clean"
    clean.mkdir()
    _write_files(str(clean), rows)
    assert final == _batch_sessions(spark, clean)


def test_native_session_window_matches_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = _rows()
    # flush event per key far past everything so the watermark closes all
    # real sessions on the final batch
    flush = [(c, "59:00.000") for c in ("c1", "c2", "c3")]
    _write_files(str(src), rows + flush, splits=(*FILE_SPLITS, len(rows)))

    stream = _open_stream(spark, src)
    sw = streaming_session_stats(
        stream,
        ["conv_id"],
        "ts",
        gap="1 minute",
        watermark="0 seconds",
        agg_exprs={"max_turn": F.max("turn_idx")},
    )
    # session_window emits on APPEND once closed by the watermark. Watermark
    # eviction lags one micro-batch, so drain, append a second flush file,
    # and drain again on the SAME checkpoint (state store persists) to force
    # the final eviction batch regardless of no-data-batch behavior.
    batches = []

    def _drain_sw():
        q = (
            sw.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: batches.append(df.toPandas()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _drain_sw()
    flush2 = os.path.join(str(src), "part-99.json")
    with open(flush2, "w") as f:
        for c in ("c1", "c2", "c3"):
            f.write(json.dumps({"conv_id": c, "turn_idx": 999, "ts": "2024-01-01 01:59:00.000"}) + "\n")
    os.utime(flush2, (1_700_000_099, 1_700_000_099))
    _drain_sw()

    got = {
        (r.conv_id, r.start_ms): (r.end_ms, r.n_rows)
        for pdf in batches
        for r in pdf.itertuples()
    }
    clean = tmp_path / "clean"
    clean.mkdir()
    _write_files(str(clean), rows)
    want = {
        (conv, start): (end, n)
        for (conv, _sid), (start, end, n) in _batch_sessions(spark, clean).items()
    }
    assert want.items() <= got.items()  # every real session closed, correct
    # only the far-future flush sessions may appear beyond the real ones
    max_real_end = max(end for end, _n in want.values())
    extra = set(got) - set(want)
    assert all(start > max_real_end for _c, start in extra)
