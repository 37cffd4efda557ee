"""Registry of plan-internal persisted DataFrames.

The tile estimators persist intermediate frames (the distinct query frame and
the combined tile table) so one plan's TAIL/MID/HEAD passes share a single
materialization. Spark has no plan-scoped cache lifetime, so without
bookkeeping a long-lived session (a multi-query driver run, a chunked
backfill) accumulates dead cached blocks from completed plans and churns
executor storage memory.

Every estimator-internal persist is registered here; callers release at safe
points — after a backfill chunk is written (sources/tableio.backfill does
this), or between benchmark queries. Releasing is ALWAYS correctness-safe:
an unpersisted frame simply recomputes if an old plan is re-executed.
"""

from __future__ import annotations

_PERSISTED: list = []


def register(df):
    """Track a plan-internal persisted DataFrame for later release."""
    _PERSISTED.append(df)
    return df


def release_plan_caches() -> int:
    """Unpersist every registered plan-internal frame. Call at a point where
    previously returned plans have been materialized (a completed backfill
    chunk, a finished query). Returns the number of handles released."""
    n = 0
    for df in _PERSISTED:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session already stopped, etc. — releasing is best-effort
    _PERSISTED.clear()
    return n
