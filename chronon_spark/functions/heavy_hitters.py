"""Misra-Gries mergeable heavy-hitter summaries with HARD state bounds.

The reference's APPROX_HISTOGRAM_K keeps an exact map until k distinct
values, then degrades to a Misra-Gries/ItemsSketch hybrid
(aggregator/src/main/scala/ai/chronon/aggregator/base/
SimpleAggregators.scala:458-600). The exact per-(key, value) count plans in
operators/groupby.py stay exact because Spark distributes the value
dimension; what they cannot bound is per-PARTIAL state when a summary must
live in one row (a streaming tile IR, a per-tile pre-aggregate shipped to a
serving store). This module is that bounded partial, Spark-first:

- a summary is ≤ ``cap`` (value, est) ROWS per group — no map column, no
  collect_list, every step a groupBy/window over distributed rows;
- ``mg_compress`` builds a summary from exact counts by keeping the top
  ``cap`` values and subtracting the (cap+1)-th count from the survivors —
  the classic MG decrement expressed as one window pass;
- ``mg_merge`` sums summaries entry-wise then compresses again.

Guarantees (Agarwal et al., "Mergeable Summaries", PODS'12): estimates never
exceed true counts, and after ANY merge tree over partials of total weight
n, ``true - est <= n / (cap + 1)``. Any value with true count above that
bound is guaranteed present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SW

EST = "__mg_est"


def mg_compress(
    counts: DataFrame, group_cols: list[str], value_col: str, count_col: str, cap: int
) -> DataFrame:
    """Compress exact per-(group, value) counts into an MG summary of at most
    ``cap`` rows per group: rank by (count desc, value desc), subtract the
    (cap+1)-th count from the kept entries, drop non-positive estimates."""
    w = SW.partitionBy(*group_cols).orderBy(
        F.col(count_col).desc(), F.col(value_col).desc()
    )
    ranked = counts.withColumn("__rn", F.row_number().over(w))
    thresh = F.max(F.when(F.col("__rn") == cap + 1, F.col(count_col))).over(
        SW.partitionBy(*group_cols)
    )
    return (
        ranked.withColumn(EST, F.col(count_col) - F.coalesce(thresh, F.lit(0)))
        .where((F.col("__rn") <= cap) & (F.col(EST) > 0))
        .select(*group_cols, F.col(value_col), F.col(EST))
    )


def mg_summarize(
    df: DataFrame, group_cols: list[str], value_col: str, cap: int
) -> DataFrame:
    """MG summary straight from raw rows: exact distributed count then
    compress. One shuffle on (group, value), one window on group."""
    counts = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("__n"))
    return mg_compress(counts, group_cols, value_col, "__n", cap)


def mg_merge(
    summaries: DataFrame,
    group_cols: list[str],
    value_col: str,
    cap: int,
    est_col: str = EST,
) -> DataFrame:
    """Merge MG summaries (e.g. per-tile partials rolling up to a window or a
    coarser tile): entry-wise sum, then compress back to ``cap`` rows. The
    input carries the finer group columns plus the target ``group_cols``."""
    summed = summaries.groupBy(*group_cols, value_col).agg(
        F.sum(est_col).alias("__n")
    )
    return mg_compress(summed, group_cols, value_col, "__n", cap)


def mg_topk(
    summary: DataFrame, group_cols: list[str], value_col: str, k: int, est_col: str = EST
) -> DataFrame:
    """Final top-k heavy hitters per group from a summary, (count desc,
    value desc) tie order matching the APPROX_HISTOGRAM_K truncation."""
    w = SW.partitionBy(*group_cols).orderBy(
        F.col(est_col).desc(), F.col(value_col).desc()
    )
    return (
        summary.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Column-expression forms — for serving IRs, where one (key [, tile]) row
# carries a whole summary as a bounded map<string,bigint> column (the KV-row
# shape of the reference's ItemsSketch bytes, GroupByUpload.scala:38-105).
# ---------------------------------------------------------------------------

_MAP_T = "map<string,bigint>"


def summary_map(group: DataFrame, group_cols: list[str], value_col: str, est_col: str = EST) -> DataFrame:
    """Fold an MG summary's rows into one map<string,bigint> column per
    group: the shape a KV store row (or an IR slot column) carries."""
    ent = F.struct(F.col(value_col).cast("string").alias("k"), F.col(est_col).alias("v"))
    return group.groupBy(*group_cols).agg(
        F.map_from_entries(F.array_sort(F.collect_list(ent))).alias("__mg_map")
    )


def merge_summary_maps(maps: Column) -> Column:
    """Entry-wise sum of an ARRAY of MG summary maps (nulls already dropped
    by collect_list). Each input is <= cap entries, so the transient merged
    map is bounded by n_maps x cap — the lambda-merge counterpart of
    ``mg_merge`` as a single JVM-side expression."""
    empty = F.create_map().cast(_MAP_T)
    return F.aggregate(
        maps,
        empty,
        lambda acc, m: F.map_zip_with(
            acc, m, lambda _k, a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        ),
    )


def topk_map_expr(m: Column, k: int | None) -> Column:
    """Finalize a merged histogram map: keep the k most frequent entries
    ((count desc, value desc) tie order — exactly _assemble_value_maps'
    truncation), drop non-positive estimates, NULL when empty (matching the
    offline engine's empty-window semantics). ``k=None`` keeps all entries."""
    ents = F.filter(F.map_entries(m), lambda e: e["value"] > 0)
    srt = F.array_sort(
        ents,
        lambda a, b: F.when(a["value"] > b["value"], F.lit(-1))
        .when(a["value"] < b["value"], F.lit(1))
        .when(a["key"] > b["key"], F.lit(-1))
        .when(a["key"] < b["key"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    if k:
        srt = F.slice(srt, 1, k)
    return F.when(F.size(srt) > 0, F.map_from_entries(srt))
