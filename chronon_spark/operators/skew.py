"""Skew handling + semi-join reduction.

Reference strategies re-expressed Spark-first (SURVEY.md §4):
- declared skew keys -> exclusion filters on both sides
  (api/.../Extensions.scala:950-1000)
- semi-join reduction before scanning a huge right side: IN-list injection
  below the small-mode cutoff (5000 left rows), LEFT SEMI join above it
  (the bloom-filter variant of the reference, TableUtils.scala:296-305 —
  AQE + DPP give the runtime-filter equivalent; a semi join is exact and
  broadcastable when the key set is small)
- salted two-phase aggregation for skewed groupBy keys (AQE splits skewed
  JOINs but not skewed aggregations — partial agg by (key, salt) then merge)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SMALL_MODE_CUTOFF = 5_000  # reference spark.chronon.backfill.small_mode_cutoff


def filter_skew_keys(df: DataFrame, skew_keys: dict[str, list]) -> DataFrame:
    """Drop declared hot keys: key NOT IN (...) per column (NULL-safe keep)."""
    for col, values in skew_keys.items():
        df = df.where(F.col(col).isNull() | ~F.col(col).isin(values))
    return df


def semi_join_reduce(
    right: DataFrame, left: DataFrame, keys: list[str], cutoff: int = SMALL_MODE_CUTOFF
) -> DataFrame:
    """Reduce ``right`` to rows whose keys appear on ``left`` before an
    expensive join/agg. Small key sets become literal IN-lists (pushed into
    the parquet scan as PushedFilters); larger ones a broadcast LEFT SEMI."""
    distinct_keys = left.select(*keys).distinct()
    if len(keys) == 1:
        sample = distinct_keys.limit(cutoff + 1).collect()
        if len(sample) <= cutoff:
            values = [r[0] for r in sample if r[0] is not None]
            return right.where(F.col(keys[0]).isin(values))
    return right.join(F.broadcast(distinct_keys), keys, "left_semi")


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_exprs: dict[str, Column],
    merge_exprs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-proof aggregation: phase 1 groups by (keys, salt) — hot keys
    spread over ``n_salts`` reducers — phase 2 merges the tiny per-salt
    partials. ``merge_exprs`` reference the partial output column names."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    p1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(n) for n, c in partial_exprs.items()])
    )
    return p1.groupBy(*keys).agg(*[c.alias(n) for n, c in merge_exprs.items()])


def null_safe_join(
    left: DataFrame, right: DataFrame, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join with <=> (NULL keys match NULL) — reference nullSafeJoin
    (spark/.../Extensions.scala:231-246)."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
        cond = c if cond is None else cond & c
    out = left.join(r, cond, how)
    return out.drop(*[f"__r_{k}" for k in keys])
