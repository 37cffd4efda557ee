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
BLOOM_THRESHOLD = 1_000_000  # reference spark.chronon.backfill.bloomfilter.threshold


def filter_skew_keys(df: DataFrame, skew_keys: dict[str, list]) -> DataFrame:
    """Drop declared hot keys: key NOT IN (...) per column (NULL-safe keep)."""
    for col, values in skew_keys.items():
        df = df.where(F.col(col).isNull() | ~F.col(col).isin(values))
    return df


def _bloom_m(n_keys: int, bits_per_key: int) -> int:
    m = 64
    while m < n_keys * bits_per_key:
        m <<= 1
    return m


def bloom_filter_reduce(
    right: DataFrame,
    left: DataFrame,
    keys: list[str],
    n_keys: int | None = None,
    bits_per_key: int = 8,
    k_hashes: int = 5,
) -> DataFrame:
    """Approximate semi-join prefilter: keep right rows whose keys MIGHT be
    on the left (superset — false positives at ~fpp, NEVER false negatives).

    The reference builds a driver-side Guava bloom over left keys and ships
    a mightContain UDF (spark/.../Extensions.scala:179-223, threshold
    TableUtils.scala:296-305). Here the bloom is built *distributed* and
    checked with pure Column expressions: k xxhash64(key, seed) positions
    into an m-bit bitmap packed as map<word_idx, long> via bit_or, collapsed
    to ONE row and broadcast. A 10^8-key bloom at 8 bits/key is ~100 MB —
    an order of magnitude smaller than broadcasting the distinct key set —
    and the probe is k map lookups + bitwise ANDs, fully codegen'd.
    """
    distinct_keys = left.select(*keys).distinct()
    if n_keys is None:
        n_keys = distinct_keys.count()
    m = _bloom_m(max(n_keys, 1), bits_per_key)

    def _positions(df_keys: list[str]) -> list[Column]:
        cols = [F.col(c) for c in df_keys]
        return [F.pmod(F.xxhash64(*cols, F.lit(i)), F.lit(m)) for i in range(k_hashes)]

    ex = distinct_keys.select(F.explode(F.array(*_positions(keys))).alias("p"))
    words = (
        ex.select(
            (F.col("p") / F.lit(64)).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
    )
    bloom = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w").alias("k"), F.col("bits").alias("v")))
        ).alias("__bloom")
    )
    out = right.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for p in _positions(keys):
        w = (p / F.lit(64)).cast("long")
        word = F.element_at(F.col("__bloom"), w)  # NULL when no bit set there
        hit = word.bitwiseAND(_shiftleft_dyn(p % F.lit(64))) != 0
        cond = cond & F.coalesce(hit, F.lit(False))
    return out.where(cond).drop("__bloom")


def _shiftleft_dyn(amount: Column) -> Column:
    """shiftleft(1L, amount) with a COLUMN shift amount (the pyspark
    functions API only takes an int literal; the SQL expression accepts
    columns)."""
    from pyspark.sql.functions import call_function

    return call_function("shiftleft", F.lit(1).cast("long"), amount.cast("int"))


def semi_join_reduce(
    right: DataFrame,
    left: DataFrame,
    keys: list[str],
    cutoff: int = SMALL_MODE_CUTOFF,
    broadcast_threshold: int = BLOOM_THRESHOLD,
    n_left_keys: int | None = None,
) -> DataFrame:
    """Reduce ``right`` to rows whose keys appear on ``left`` (EXACT) before
    an expensive join/agg. Three regimes, mirroring the reference's
    small-mode / bloom ladder (Join.scala:304-338):

    - key set <= ``cutoff`` (5000): literal IN-list, pushed into the parquet
      scan as PushedFilters;
    - <= ``broadcast_threshold`` (1M): broadcast LEFT SEMI;
    - above: bloom prefilter (broadcast ~1/10th the key-set size) followed
      by a shuffle LEFT SEMI over only the surviving rows — exact, and the
      big shuffle moves a bloom-reduced right side.
    """
    distinct_keys = left.select(*keys).distinct()
    if len(keys) == 1:
        sample = distinct_keys.limit(cutoff + 1).collect()
        if len(sample) <= cutoff:
            values = [r[0] for r in sample if r[0] is not None]
            return right.where(F.col(keys[0]).isin(values))
        n_left_keys = n_left_keys if n_left_keys is not None else distinct_keys.count()
    elif n_left_keys is None:
        n_left_keys = distinct_keys.count()
    if n_left_keys <= broadcast_threshold:
        return right.join(F.broadcast(distinct_keys), keys, "left_semi")
    reduced = bloom_filter_reduce(right, left, keys, n_keys=n_left_keys)
    return reduced.join(distinct_keys, keys, "left_semi")


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
    # deterministic salt (hash of the row's own values): a salt derived
    # from monotonically_increasing_id changes across task retries, so a
    # shuffle-fetch failure could re-route rows to different (key, salt)
    # reducers and corrupt the merged aggregates
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
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
    if how in ("right", "rightouter", "right_outer", "full", "fullouter",
               "full_outer", "outer"):
        # unmatched right rows have their keys only in the renamed columns —
        # fold them back before dropping or those rows lose their keys
        for k in keys:
            out = out.withColumn(k, F.coalesce(F.col(k), F.col(f"__r_{k}")))
    return out.drop(*[f"__r_{k}" for k in keys])
