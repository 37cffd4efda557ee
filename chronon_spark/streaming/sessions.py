"""Streaming gap-based sessionization — the realtime twin of
operators/sessionize.py.

The reference has no session operator (north-rule addition; see SURVEY.md
§2.4), but its streaming design principles apply: keyed state, event-time
semantics, 0-allowed-lateness with nightly batch correction
(flink/src/main/scala/ai/chronon/flink/FlinkJob.scala:117-165).

Two plans, both over ``readStream`` sources:

1. ``streaming_session_stats`` — the JVM-native path: ``F.session_window``
   merging windows inside Spark's streaming state store. Use this whenever
   the per-session outputs are plain aggregates; nothing crosses into
   Python.
2. ``streaming_sessionize_stateful`` — a custom stateful operator via
   ``applyInPandasWithState`` for outputs the native session window cannot
   express: stable per-key session ordinals that match the batch
   ``sessionize`` ids bit-for-bit, plus open-session snapshots every
   micro-batch (the "current session so far" feature a realtime fetcher
   serves). State per key is one open session (ordinal, bounds, row count);
   arithmetic inside the UDF is vectorized numpy over Arrow batches, never
   per-row Python loops.

Late-data policy matches streaming/tiles.py: rows at or before the open
session's last seen timestamp are dropped on the stream (counted in the
emitted row) and corrected by the nightly batch job.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from chronon_spark.operators.sessionize import _interval_to_ms
from chronon_spark.plans.windows import ts_to_millis


def streaming_session_stats(
    stream: DataFrame,
    keys: list[str],
    ts_column: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Native session aggregation: ``groupBy(session_window(ts, gap), keys)``.

    Emits one row per closed session (append mode): keys, start_ms/end_ms
    (first/last event time — NOT the window end, which session_window pads
    by ``gap``), duration_ms, n_rows, plus caller aggregates. The state
    store merges adjacent windows; the watermark closes sessions once
    event time passes last_event + gap + watermark.
    """
    # schema-aware conversion: a long epoch-millis ts cast straight to
    # timestamp would be read as SECONDS (windows.ts_to_millis contract)
    ts_ms = ts_to_millis(stream, ts_column)
    src = stream.withColumn("__event_time", F.timestamp_millis(ts_ms))
    base: dict[str, Column] = {
        "n_rows": F.count(F.lit(1)),
        "start_ms": F.min(ts_ms),
        "end_ms": F.max(ts_ms),
        "duration_ms": F.max(ts_ms) - F.min(ts_ms),
    }
    base.update(agg_exprs or {})
    return (
        src.withWatermark("__event_time", watermark)
        .groupBy(F.session_window(F.col("__event_time"), gap).alias("__sw"), *keys)
        .agg(*[c.alias(n) for n, c in base.items()])
        .drop("__sw")
    )


def streaming_sessionize_stateful(
    stream: DataFrame,
    keys: list[str],
    ts_column: str = "ts",
    gap: str | int = "30 minutes",
) -> DataFrame:
    """Custom stateful sessionizer: ``applyInPandasWithState`` keyed by
    ``keys`` with one open session as state.

    Every micro-batch emits, per touched session: (keys..., session_id,
    start_ms, end_ms, n_rows, closed, late_dropped). ``session_id`` is the
    same 0-based per-key ordinal the batch ``sessionize`` assigns, so a
    fetcher can reconcile stream rows against nightly batch output.
    Sessions closed by a gap inside or across batches emit ``closed=true``
    exactly once; the still-open session emits a ``closed=false`` snapshot
    each batch it is touched (update semantics — latest row per
    (keys, session_id) wins downstream).
    """
    gap_ms = gap if isinstance(gap, int) else _interval_to_ms(gap)
    key_types = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    key_fields = ", ".join(f"{k} {key_types[k]}" for k in keys)
    out_schema = (
        f"{key_fields}, session_id long, start_ms long, end_ms long, "
        "n_rows long, closed boolean, late_dropped long"
    )
    state_schema = "session_id long, start_ms long, last_ts long, n_rows long"

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ts = np.sort(
            np.concatenate([p["__ts_ms"].to_numpy(dtype=np.int64) for p in pdfs])
        )
        if state.exists:
            sess_id, start_ms, last_ts, n_rows = state.get
        else:
            sess_id, start_ms, last_ts, n_rows = -1, 0, np.int64(-(2**62)), 0
        late = int((ts <= last_ts).sum()) if n_rows else 0
        if late:
            ts = ts[ts > last_ts]
        if ts.size == 0:
            if late:
                yield pd.DataFrame(
                    {
                        **{k: [key[i]] for i, k in enumerate(keys)},
                        "session_id": [sess_id],
                        "start_ms": [start_ms],
                        "end_ms": [int(last_ts)],
                        "n_rows": [n_rows],
                        "closed": [False],
                        "late_dropped": [late],
                    }
                )
            return
        # segment boundaries: gap vs previous event (state's last_ts first)
        prev = np.concatenate(([last_ts], ts[:-1]))
        brk = (ts - prev) > gap_ms
        if n_rows == 0:
            brk[0] = True  # no open session: first row starts session 0
        seg = np.cumsum(brk)  # 0 = continuation of the open session
        out: dict[str, list] = {
            **{k: [] for k in keys},
            "session_id": [],
            "start_ms": [],
            "end_ms": [],
            "n_rows": [],
            "closed": [],
            "late_dropped": [],
        }
        n_segs = int(seg[-1]) + 1
        for s in range(n_segs):
            seg_ts = ts[seg == s]
            if s == 0 and seg_ts.size == 0:
                # open session untouched this batch (first new row broke it)
                if n_rows:
                    cur = (sess_id, start_ms, int(last_ts), n_rows)
                else:
                    continue
            elif s == 0:
                cur = (sess_id, start_ms, int(seg_ts[-1]), n_rows + int(seg_ts.size))
            else:
                sess_id += 1
                cur = (sess_id, int(seg_ts[0]), int(seg_ts[-1]), int(seg_ts.size))
            closed = s < n_segs - 1  # every segment but the last was ended by a gap
            for i, k in enumerate(keys):
                out[k].append(key[i])
            out["session_id"].append(cur[0])
            out["start_ms"].append(cur[1])
            out["end_ms"].append(cur[2])
            out["n_rows"].append(cur[3])
            out["closed"].append(closed)
            out["late_dropped"].append(late if s == 0 else 0)
        state.update((int(cur[0]), int(cur[1]), int(cur[2]), int(cur[3])))
        yield pd.DataFrame(out)

    src = stream.withColumn("__ts_ms", ts_to_millis(stream, ts_column))
    return src.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
