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


#: conversation-level quality thresholds for transcript_quality, every one
#: overridable per call. ``refusal_markers`` is a deliberately small
#: placeholder phrase list (production swaps in its own).
TRANSCRIPT_QUALITY_PARAMS = {
    "min_turns": 2,
    "max_turns": 200,
    "min_alternation_frac": 0.5,
    "max_dup_turn_frac": 0.5,
    "max_refusal_frac": 0.5,
    "max_empty_turns": 0,
    "require_user_start": True,
    "refusal_markers": ("i cannot help", "i can't help", "as an ai"),
    "user_role": "user",
    "assistant_role": "assistant",
}


def transcript_quality(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    params: dict | None = None,
) -> DataFrame:
    """Conversation-level quality filtering for multi-turn transcripts —
    the screening pass an SFT/RLHF data pipeline runs before pair
    extraction (public practice in every open chat-data cleaning recipe:
    turn-count bounds, role-alternation, both-roles-present, user-first,
    empty-turn and copy-paste-loop detection, refusal-rate caps, and an
    exact conversation fingerprint for cross-conversation dedup).

    Per conversation: ``n_turns``, per-role turn counts, ``starts_with_user``,
    ``alternation_frac`` (adjacent turn pairs whose roles differ / pairs),
    ``n_empty_turns`` (whitespace-only text), ``dup_turn_frac``
    (1 - distinct normalized turns / turns: copy-paste loops),
    ``refusal_frac`` (assistant turns carrying a refusal marker / assistant
    turns), ``mean_assistant_chars``/``mean_user_chars`` (single
    integer/integer divisions), ``conv_fingerprint`` (md5 over the
    turn-order concatenation of ``role:normalized-text`` — the
    cross-conversation exact-dedup key), ``n_rules_failed`` and the
    ``tq_keep`` verdict.

    Exactness contract: counts are integers, every fraction is ONE
    division of two integers (IEEE-exact cross-engine), verdicts compare
    unrounded quotients, and the fingerprint is md5 over a deterministic
    order-preserving concatenation (DuckDB: string_agg ORDER BY turn).

    Plan shape (100TB): ONE hash-partitioning of ``conv_col`` — the lag
    window and the groupBy ride the same partitioning, so the whole
    battery costs a single shuffle of (conv, turn) tuples; text leaves
    the executors only inside the md5 accumulator, never raw.
    """
    from chronon_spark.operators.dedup import normalize_text

    p = {**TRANSCRIPT_QUALITY_PARAMS, **(params or {})}
    w = SW.partitionBy("__conv").orderBy("__turn")
    is_assistant = F.col(role_col) == p["assistant_role"]
    is_user = F.col(role_col) == p["user_role"]
    # NULL text behaves as empty text everywhere (counters must never
    # silently skip a turn)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    nt = normalize_text(txt)
    refusal = F.lit(False)
    for m in p["refusal_markers"]:
        refusal = refusal | F.lower(txt).contains(m)

    turns = transcripts.select(
        F.col(conv_col).alias("__conv"),
        F.col(turn_col).alias("__turn"),
        F.col(role_col).alias("__role"),
        is_assistant.alias("__is_a"),
        is_user.alias("__is_u"),
        (F.length(F.trim(txt)) == 0).alias("__empty"),
        nt.alias("__nt"),
        F.length(txt).alias("__chars"),
        (refusal & is_assistant).alias("__refusal"),
    ).withColumn("__prev_role", F.lag("__role").over(w))

    agg = turns.groupBy("__conv").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("__is_u"), 1).otherwise(0)).alias("n_user_turns"),
        F.sum(F.when(F.col("__is_a"), 1).otherwise(0)).alias("n_assistant_turns"),
        F.max(F.when(F.col("__turn") == 0, F.col("__is_u"))).alias("starts_with_user"),
        F.sum(
            F.when(F.col("__prev_role").isNotNull() & (F.col("__prev_role") != F.col("__role")), 1)
            .when(F.col("__prev_role").isNotNull(), 0)
        ).alias("n_alternations"),
        F.sum(F.when(F.col("__empty"), 1).otherwise(0)).alias("n_empty_turns"),
        F.count_distinct("__nt").alias("n_distinct_turns"),
        F.sum(F.when(F.col("__refusal"), 1).otherwise(0)).alias("n_refusals"),
        F.sum(F.when(F.col("__is_a"), F.col("__chars")).otherwise(0)).alias("assistant_chars"),
        F.sum(F.when(F.col("__is_u"), F.col("__chars")).otherwise(0)).alias("user_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__turn").alias("i"),
                                F.concat(F.col("__role"), F.lit(":"), F.col("__nt")).alias("s"),
                            )
                        )
                    ),
                    lambda s: s["s"],
                ),
                "\x1e",
            )
        ).alias("conv_fingerprint"),
    )

    nt_ = F.col("n_turns").cast("double")
    na = F.col("n_assistant_turns").cast("double")
    pairs = F.col("n_turns") - 1
    alt_frac = F.when(pairs > 0, F.col("n_alternations") / pairs.cast("double"))
    dup_frac = F.when(
        F.col("n_turns") > 0,
        (F.col("n_turns") - F.col("n_distinct_turns")) / nt_,
    )
    ref_frac = F.when(F.col("n_assistant_turns") > 0, F.col("n_refusals") / na)
    mean_a = F.when(F.col("n_assistant_turns") > 0, F.col("assistant_chars") / na)
    mean_u = F.when(
        F.col("n_user_turns") > 0,
        F.col("user_chars") / F.col("n_user_turns").cast("double"),
    )

    rules = [
        F.col("n_turns") >= p["min_turns"],
        F.col("n_turns") <= p["max_turns"],
        F.col("n_user_turns") > 0,
        F.col("n_assistant_turns") > 0,
        (F.coalesce(F.col("starts_with_user"), F.lit(False)))
        if p["require_user_start"]
        else F.lit(True),
        F.coalesce(alt_frac, F.lit(0.0)) >= p["min_alternation_frac"],
        F.col("n_empty_turns") <= p["max_empty_turns"],
        F.coalesce(dup_frac, F.lit(0.0)) <= p["max_dup_turn_frac"],
        F.coalesce(ref_frac, F.lit(0.0)) <= p["max_refusal_frac"],
    ]
    from chronon_spark.operators.text_ops import sum_cols

    n_failed = sum_cols([F.when(~r, F.lit(1)).otherwise(F.lit(0)) for r in rules])

    return agg.select(
        F.col("__conv").alias(conv_col),
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_user_turns").cast("long").alias("n_user_turns"),
        F.col("n_assistant_turns").cast("long").alias("n_assistant_turns"),
        F.coalesce(F.col("starts_with_user"), F.lit(False)).alias("starts_with_user"),
        F.round(F.coalesce(alt_frac, F.lit(0.0)), 6).alias("alternation_frac"),
        F.col("n_empty_turns").cast("long").alias("n_empty_turns"),
        F.round(F.coalesce(dup_frac, F.lit(0.0)), 6).alias("dup_turn_frac"),
        F.round(F.coalesce(ref_frac, F.lit(0.0)), 6).alias("refusal_frac"),
        F.round(F.coalesce(mean_a, F.lit(0.0)), 6).alias("mean_assistant_chars"),
        F.round(F.coalesce(mean_u, F.lit(0.0)), 6).alias("mean_user_chars"),
        F.col("conv_fingerprint"),
        n_failed.cast("long").alias("n_rules_failed"),
        (n_failed == 0).alias("tq_keep"),
    )


#: degeneration thresholds (overridable): a turn is flagged when its
#: distinct-word fraction collapses or any single word repeats in an
#: unbroken run
DEGENERATION_PARAMS = {
    "min_distinct_word_frac": 0.3,
    "max_word_run": 4,
    "min_words": 5,  # short turns are never flagged (too little signal)
}


def turn_degeneration(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    params: dict | None = None,
) -> DataFrame:
    """Degenerate-generation detection per turn — the model-output loop
    screen an agent-transcript pipeline runs before using assistant turns
    as training data: collapsed vocabulary (distinct-word fraction) and
    unbroken single-word repetition runs ("the the the ..."), flagged per
    (conversation, turn).

    ``max_word_run`` is computed with ONE native ``F.aggregate`` pass over
    the word array (state = (prev, current-run, best-run)) — no explode,
    no shuffle; the whole operator is row-local and preserves scan
    partitioning. The DuckDB twin computes the same run length with the
    gaps-and-islands idiom over unnested word positions, so verdicts are
    bit-stable cross-engine (fractions are single integer/integer
    divisions).

    Returns (conv, turn, role, n_words, n_distinct_words,
    distinct_word_frac, max_word_run, degenerate).
    """
    from chronon_spark.operators.dedup import normalize_text

    p = {**DEGENERATION_PARAMS, **(params or {})}
    nt = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    ws = F.when(F.length(nt) > 0, F.split(nt, " ")).otherwise(
        F.array().cast("array<string>")
    )
    base = transcripts.select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(role_col),
        ws.alias("__ws"),
    )
    n_words = F.size("__ws")
    n_distinct = F.size(F.array_distinct("__ws"))
    max_run = F.aggregate(
        F.col("__ws"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    d_frac = F.when(n_words > 0, n_distinct / n_words.cast("double"))
    out = base.select(
        conv_col,
        F.col(turn_col).cast("long").alias(turn_col),
        role_col,
        n_words.cast("long").alias("n_words"),
        n_distinct.cast("long").alias("n_distinct_words"),
        F.round(F.coalesce(d_frac, F.lit(0.0)), 6).alias("distinct_word_frac"),
        max_run.cast("long").alias("max_word_run"),
    )
    return out.withColumn(
        "degenerate",
        (F.col("n_words") >= p["min_words"])
        & (
            (F.col("distinct_word_frac") < p["min_distinct_word_frac"])
            | (F.col("max_word_run") > p["max_word_run"])
        ),
    )
