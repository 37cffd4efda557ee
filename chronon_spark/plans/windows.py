"""Sawtooth window arithmetic — the zero-leakage / tail-rounding invariant.

Reference semantics (SURVEY.md §1.4): a feature at query time ``ts`` over
window ``w`` observes exactly the events with

    round_down(ts - w, tail_hop(w)) <= event.ts < ts        (strict head)

where tail_hop is 5min for w<12h, 1h for w<12d, 1d for w>=12d
(aggregator/src/main/scala/ai/chronon/aggregator/windowing/Resolution.scala:37-47;
naive oracle aggregator/src/test/.../NaiveAggregator.scala:30-46).

All arithmetic is in long epoch-millis with exact integer ops (``pmod``), so
plans stay inside whole-stage codegen and match a DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chronon_spark.api import Window

MS_PER_DAY = 86_400_000


def to_millis(ts: Column) -> Column:
    """Cast a TIMESTAMP column to long epoch millis. For columns that may
    already be numeric epoch-millis use ``ts_to_millis`` (a bigint cast to
    timestamp is interpreted by Spark as SECONDS, which would silently
    multiply a millis column by 1000)."""
    return F.unix_millis(ts.cast("timestamp"))


def ts_to_millis(df, colname: str) -> Column:
    """Schema-aware time conversion: numeric columns are taken as epoch
    millis verbatim (the reference's `ts` contract — long millis,
    api/.../Constants.scala:22, enforced Long at GroupBy.scala:490-497);
    timestamp/date columns are converted."""
    from pyspark.sql import types as T

    dt = df.schema[colname].dataType
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType)):
        return F.col(colname).cast("long")
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return F.col(colname).cast("long")
    return F.unix_millis(F.col(colname).cast("timestamp"))


def round_down(ts_ms: Column, hop_ms: int) -> Column:
    """Exact integer floor-to-hop (positive domain): ts - ts % hop."""
    return (ts_ms - F.pmod(ts_ms, F.lit(hop_ms))).cast("long")


def sawtooth_tail(query_ts_ms: Column, window: Window) -> Column:
    """Inclusive lower bound of ``window`` as of ``query_ts_ms``."""
    return round_down(query_ts_ms - F.lit(window.millis), window.tail_hop_millis())


def in_window(event_ts_ms: Column, query_ts_ms: Column, window: Window | None) -> Column:
    """Boolean mask: event participates in the window at query time.

    ``window=None`` = lifetime (only the strict ``<`` head bound applies).
    """
    head = event_ts_ms < query_ts_ms
    if window is None:
        return head
    return head & (event_ts_ms >= sawtooth_tail(query_ts_ms, window))


def sawtooth_tail_sql(query_ts_ms_expr: str, window: Window) -> str:
    """ANSI-SQL rendering of ``sawtooth_tail`` (DuckDB-compatible oracle)."""
    w, hop = window.millis, window.tail_hop_millis()
    shifted = f"({query_ts_ms_expr} - {w})"
    return f"({shifted} - ({shifted} % {hop}))"


def snapshot_bounds_ms(ds_day_ms: Column, window: Window | None) -> tuple[Column | None, Column]:
    """Millis bounds of a snapshot-accuracy window for partition day starting
    at ``ds_day_ms``: [epoch(ds)+1d - N*1d, epoch(ds)+1d)  — i.e. the window
    covers N whole days ending at the end of ds
    (reference oracle: spark/src/test/.../GroupByTest.scala:57-66,109-121)."""
    eod = ds_day_ms + F.lit(MS_PER_DAY)
    if window is None:
        return None, eod
    return eod - F.lit(window.millis), eod
