"""Turn-level sequence features: lag/lead and gap-based sessionization.

North-rule additions beyond the reference operator set (SURVEY.md §2.4 —
the reference has no session operator). Pure window-function plans: one
shuffle on the partition key, everything else stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SW

from chronon_spark.plans.windows import ts_to_millis


def with_lag_lead(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    columns: dict[str, int],
    prefix_lag: str = "lag",
    prefix_lead: str = "lead",
) -> DataFrame:
    """Add lag/lead columns: ``columns`` maps column name -> max offset; emits
    ``{col}_{lag|lead}{n}`` for n in 1..offset."""
    w = SW.partitionBy(*partition_by).orderBy(*order_by)
    out = df
    for col, depth in columns.items():
        for n in range(1, depth + 1):
            out = out.withColumn(f"{col}_{prefix_lag}{n}", F.lag(col, n).over(w))
            out = out.withColumn(f"{col}_{prefix_lead}{n}", F.lead(col, n).over(w))
    return out


def sessionize(
    df: DataFrame,
    partition_by: list[str],
    ts_column: str = "ts",
    gap: str | int = "30 minutes",
    order_by: list[str] | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per partition key.

    A new session starts when the gap to the previous row's ts exceeds
    ``gap`` (millis int or interval string). Classic lag+cumsum idiom —
    equivalent to F.session_window for batch but yields a per-row id we can
    aggregate on. Session ids are 0-based, ordered by time within each key.
    """
    gap_ms = gap if isinstance(gap, int) else _interval_to_ms(gap)
    order_by = order_by or [ts_column]
    w = SW.partitionBy(*partition_by).orderBy(*order_by)
    # schema-aware: a LONG epoch-millis ts cast via to_millis would be
    # interpreted as epoch seconds and inflate every gap 1000x
    ts_ms = ts_to_millis(df, ts_column)
    new_sess = (
        F.when(F.lag(ts_ms, 1).over(w).isNull(), F.lit(0))
        .when(ts_ms - F.lag(ts_ms, 1).over(w) > F.lit(gap_ms), F.lit(1))
        .otherwise(F.lit(0))
    )
    cum = SW.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(
        SW.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_sess).over(cum).cast("long"))


def session_stats(
    df: DataFrame,
    partition_by: list[str],
    ts_column: str = "ts",
    gap: str | int = "30 minutes",
    order_by: list[str] | None = None,
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Sessionize then aggregate one row per session: bounds, length, count
    plus any caller-provided aggregate expressions."""
    s = sessionize(df, partition_by, ts_column, gap, order_by)
    ts_ms = ts_to_millis(df, ts_column)
    base = {
        "n_rows": F.count(F.lit(1)),
        "start_ms": F.min(ts_ms),
        "end_ms": F.max(ts_ms),
        "duration_ms": F.max(ts_ms) - F.min(ts_ms),
    }
    base.update(agg_exprs or {})
    return s.groupBy(*partition_by, "session_id").agg(
        *[c.alias(n) for n, c in base.items()]
    )


def _interval_to_ms(s: str) -> int:
    qty, unit = s.split()
    mult = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(qty) * mult


def sft_pairs(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_history: int = 0,
    user_role: str = "user",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Supervised-finetuning pair extraction from multi-turn transcripts —
    the training-data prep step for conversational corpora: every assistant
    turn whose immediately-preceding turn is a user turn yields one
    (prompt, response) example; with ``max_history`` > 0 the prompt is the
    role-tagged concatenation of up to that many preceding turns (the
    standard multi-turn SFT context packing; public recipe in every
    chat-model finetuning pipeline).

    Returns (conv_col, turn_col, prompt, response, n_history). One window
    pass per conversation — the same (conv, turn-order) partitioning the
    rest of the transcript feature engine rides; per-turn text is passed
    through byte-identical (the north-rule invariant).
    """
    w = SW.partitionBy(conv_col).orderBy(turn_col)
    hist_frame = w.rowsBetween(-max(max_history, 1), -1)
    hist = F.collect_list(
        F.struct(F.col(turn_col).alias("i"), F.col(role_col).alias("r"), F.col(text_col).alias("t"))
    ).over(hist_frame)
    out = (
        transcripts.withColumn("__prev_role", F.lag(role_col).over(w))
        .withColumn("__hist", hist)  # materialized BEFORE the filter — the
        # window must see every turn, not just the surviving assistant rows
        .where(
            (F.col(role_col) == assistant_role) & (F.col("__prev_role") == user_role)
        )
    )
    prompt = F.array_join(
        F.transform(
            F.array_sort(F.col("__hist")),
            lambda s: F.concat(s["r"], F.lit(": "), s["t"]),
        ),
        "\n",
    )
    return out.select(
        conv_col,
        turn_col,
        prompt.alias("prompt"),
        F.col(text_col).alias("response"),
        F.size("__hist").cast("long").alias("n_history"),
    )
