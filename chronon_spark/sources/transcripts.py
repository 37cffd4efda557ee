"""Deterministic synthetic multi-turn transcript generator.

Produces the BASELINE.json ``input_hint`` schema
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp) fully inside Spark — ``spark.range`` + hash-derived columns, no
driver-side data, so it scales to any row count. Seeded and stateless:
row i always produces the same tuple, which makes tests and the two-
parallelism benchmark bit-reproducible.

Skew: a configurable fraction of rows is funneled into a handful of "hot"
conversations (~1000x the turns of a typical conversation) to exercise
salting / AQE skew handling, mirroring the reference test generator's
cardinality knobs (spark/src/test/.../DataFrameGen.scala:33-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "code", "browser", "calculator", "none"]
WORDS = [
    "plan", "step", "result", "error", "retry", "tool", "call", "answer",
    "question", "context", "window", "join", "agg", "spark", "table", "row",
    "batch", "stream", "merge", "sort", "hash", "scan", "filter", "group",
]


def generate_transcripts(
    spark: SparkSession,
    n_conversations: int = 200,
    avg_turns: int = 20,
    n_days: int = 30,
    start_ts_ms: int = 1704067200000,  # 2024-01-01 UTC
    hot_conversations: int = 2,
    hot_multiplier: int = 500,
    seed: int = 42,
) -> DataFrame:
    """One row per turn. Turn timestamps are monotone within a conversation
    (strictly increasing via a per-turn deterministic step)."""
    total_norm = n_conversations * avg_turns
    total_hot = hot_conversations * avg_turns * hot_multiplier
    total = total_norm + total_hot
    span_ms = n_days * 86_400_000

    df = spark.range(0, total, 1)
    is_hot = F.col("id") >= total_norm
    conv_ord = F.when(~is_hot, (F.col("id") / avg_turns).cast("long")).otherwise(
        F.lit(n_conversations) + ((F.col("id") - total_norm) / (avg_turns * hot_multiplier)).cast("long")
    )
    turn_idx = F.when(~is_hot, F.col("id") % avg_turns).otherwise(
        (F.col("id") - total_norm) % (avg_turns * hot_multiplier)
    )
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    # conversation start: deterministic hash of conv; turns step forward 1-5min
    conv_hash = F.abs(F.xxhash64(conv_ord, F.lit(seed + 1)))
    conv_start = conv_hash % F.lit(max(span_ms - 86_400_000, 1))
    step_ms = (h % 300_000) + 1  # strictly positive => monotone increasing
    # cumulative offset approximated deterministically: turn_idx * avg step of
    # this conv + per-turn jitter (keeps monotonicity without a window fn)
    avg_step = (conv_hash % 240_000) + 30_000
    ts_ms = F.lit(start_ts_ms) + conv_start + turn_idx * avg_step + (step_ms % avg_step)

    text_words = F.array(*[F.lit(w) for w in WORDS])
    n_words = (h % 12) + 1
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words.cast("int")),
            lambda i: F.element_at(
                text_words, (F.abs(F.xxhash64(F.col("id"), i, F.lit(seed))) % len(WORDS) + 1).cast("int")
            ),
        ),
        " ",
    )
    roles = F.array(*[F.lit(r) for r in ROLES])
    tools = F.array(*[F.lit(t) for t in TOOLS])
    role = F.element_at(roles, (turn_idx % 2 + 1).cast("int"))  # user/assistant alternating
    role = F.when(turn_idx == 0, F.lit("system")).otherwise(role)
    tool = F.when(
        (h % 5) == 0, F.element_at(tools, ((h % 4) + 1).cast("int"))
    ).otherwise(F.lit(None).cast("string"))
    text = F.when((h % 97) == 0, F.lit("")).otherwise(text)  # empty-text rows

    return df.select(
        F.concat(F.lit("conv_"), F.lpad(conv_ord.cast("string"), 6, "0")).alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (ts_ms / 1000).cast("timestamp").alias("ts"),
    )
