"""Brute-force O(queries x events) pandas oracle for the temporal estimator.

Mirrors the reference's NaiveAggregator
(aggregator/src/test/scala/ai/chronon/aggregator/test/NaiveAggregator.scala:30-46):
for each query ts and window w, aggregate events with
``round_down(ts - w, tail_hop(w)) <= ev.ts < ts``.
"""

from __future__ import annotations

import math

import pandas as pd

from chronon_spark.api import Aggregation, Op, Window


def tail_ms(q_ms: int, w: Window) -> int:
    hop = w.tail_hop_millis()
    shifted = q_ms - w.millis
    return shifted - (shifted % hop)


def naive_features(
    events: pd.DataFrame,
    queries: pd.DataFrame,
    key: str,
    agg: Aggregation,
    ts_col: str = "ts_ms",
    tiebreak: str | None = None,
) -> pd.DataFrame:
    """queries: columns [key, 'q_ms']; events: [key, ts_col, input, tiebreak]."""
    rows = []
    for _, qr in queries.iterrows():
        k, q_ms = qr[key], qr["q_ms"]
        sub = events[(events[key] == k) & (events[ts_col] < q_ms)]
        rec = {key: k, "q_ms": q_ms}
        for w, _ in agg.unpacked():
            if w is not None:
                lo = tail_ms(q_ms, w)
                s = sub[sub[ts_col] >= lo]
            else:
                s = sub
            vals = s[agg.input_column].dropna()
            name = agg.output_name(w, None)
            rec[name] = _apply(agg, s, vals, ts_col, tiebreak)
        rows.append(rec)
    return pd.DataFrame(rows)


def _apply(agg: Aggregation, s: pd.DataFrame, vals: pd.Series, ts_col: str, tiebreak):
    op = agg.operation
    if op == Op.COUNT:
        return len(vals)
    if op == Op.SUM:
        return vals.sum() if len(vals) else None
    if op == Op.AVERAGE:
        return vals.mean() if len(vals) else None
    if op == Op.VARIANCE:
        return vals.var(ddof=0) if len(vals) else None
    if op == Op.MIN:
        return vals.min() if len(vals) else None
    if op == Op.MAX:
        return vals.max() if len(vals) else None
    if op == Op.UNIQUE_COUNT:
        return vals.nunique()
    if op in (Op.FIRST, Op.LAST, Op.FIRST_K, Op.LAST_K):
        sv = s[s[agg.input_column].notna()].sort_values(
            [ts_col] + ([tiebreak] if tiebreak else [])
        )
        seq = sv[agg.input_column].tolist()
        if op == Op.FIRST:
            return seq[0] if seq else None
        if op == Op.LAST:
            return seq[-1] if seq else None
        k = agg.k or 1
        if op == Op.FIRST_K:
            return seq[:k]
        return list(reversed(seq))[:k]
    if op in (Op.TOP_K, Op.BOTTOM_K):
        k = agg.k or 1
        srt = sorted(vals.tolist())
        return list(reversed(srt))[:k] if op == Op.TOP_K else srt[:k]
    if op == Op.PERCENTILE:
        if not len(vals):
            return None
        return [vals.quantile(p, interpolation="linear") for p in (agg.percentiles or (0.5,))]
    if op == Op.HISTOGRAM:
        vc = vals.astype(str).value_counts().to_dict()
        return vc or None
    raise NotImplementedError(op)


def allclose(a, b, tol=1e-9) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, list) or isinstance(b, list):
        if a is None or b is None or len(a) != len(b):
            return False
        return all(allclose(x, y, tol) for x, y in zip(a, b))
    if isinstance(a, dict) or isinstance(b, dict):
        if a is None or b is None or set(a) != set(b):
            return False
        return all(allclose(a[k], b[k], tol) for k in a)
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        if math.isnan(a) and math.isnan(b):
            return True
        return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
    return a == b
