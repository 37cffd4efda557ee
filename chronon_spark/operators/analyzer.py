"""Dry-run analysis: output-schema inference + heavy-hitter (skew key)
detection — the reference's Analyzer re-expressed over DataFrames
(spark/src/main/scala/ai/chronon/spark/Analyzer.scala:64-700; heavy hitters
L95-143 use an ItemsSketch over sampled keys; we use exact counts over an
optional sample, which is deterministic and still one shuffle)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.api import GroupBy
from chronon_spark.operators import groupby as G


def heavy_hitters(
    df: DataFrame, cols: list[str], min_count: int = 1000, top_k: int = 20, sample: float | None = None
) -> DataFrame:
    """Keys whose frequency exceeds ``min_count`` per column — candidates for
    skew-key exclusion or salting. Returns (column, key, n) rows."""
    src = df.sample(sample, seed=42) if sample else df
    parts = []
    for c in cols:
        parts.append(
            src.groupBy(F.lit(c).alias("column"), F.col(c).cast("string").alias("key"))
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= min_count)
            .orderBy(F.col("n").desc(), F.col("key"))
            .limit(top_k)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@dataclass
class GroupByAnalysis:
    output_schema: list[tuple[str, str]]
    key_columns: list[str]
    hot_keys: list[tuple[str, str, int]]


def analyze_group_by(
    events: DataFrame, gb: GroupBy, hot_key_threshold: int = 10_000
) -> GroupByAnalysis:
    """Infer the exact output schema (by planning against an empty slice —
    no data pass) + detect hot keys. The reference runs this before every
    backfill as a validation gate (Analyzer.analyzeJoin)."""
    left = events.select(*gb.keys, F.col(gb.time_column).alias("ts")).limit(0)
    plan = G.temporal_events(left, events.limit(0), gb, left_time_column="ts")
    schema = [(f.name, f.dataType.simpleString()) for f in plan.schema.fields]
    hot = [
        (r["column"], r["key"], r["n"])
        for r in heavy_hitters(events, gb.keys, min_count=hot_key_threshold).collect()
    ]
    return GroupByAnalysis(schema, gb.keys, hot)
