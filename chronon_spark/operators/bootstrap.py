"""Bootstrap join + label join — the remaining Join-lifecycle phases.

Bootstrap (reference spark/src/main/scala/ai/chronon/spark/Join.scala:48-63,
517-635; BootstrapInfo.scala): pre-computed feature rows are left-joined
onto the query table first, a provenance column records which source
covered each row, and the backfill engine only computes features for rows
NOT covered — then coalesces bootstrap values over computed ones.

Label join (reference spark/.../LabelJoin.scala:33-284): labels are
*forward-looking* aggregates — for a feature row at ts, the label observes
events in (ts, ts + horizon]. Same engine as the temporal backfill with the
window reflected forward; leakage discipline inverts (a label may ONLY see
the future window, never ts itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.api import Accuracy, Aggregation, GroupBy, Window
from chronon_spark.operators import groupby as G
from chronon_spark.operators.join import coalesced_join
from chronon_spark.plans.windows import to_millis

PROVENANCE = "matched_hashes"


def bootstrap_join(
    left: DataFrame,
    bootstrap_parts: list[tuple[str, DataFrame]],
    keys: list[str],
) -> DataFrame:
    """left ⟕ each pre-computed table; adds a ``matched_hashes`` array column
    naming the parts that covered each row (reference provenance semantics)."""
    out = left.withColumn(PROVENANCE, F.array().cast("array<string>"))
    for name, part in bootstrap_parts:
        part = part.dropDuplicates(keys)
        val_cols = [c for c in part.columns if c not in keys]
        marked = part.withColumn(f"__hit_{name}", F.lit(True))
        out = coalesced_join(out, marked, keys)
        out = out.withColumn(
            PROVENANCE,
            F.when(
                F.col(f"__hit_{name}"),
                F.array_union(F.col(PROVENANCE), F.array(F.lit(name))),
            ).otherwise(F.col(PROVENANCE)),
        ).drop(f"__hit_{name}")
    return out


def uncovered_rows(bootstrapped: DataFrame, part_name: str) -> DataFrame:
    """CoveringSet filter: rows this part still needs to backfill
    (reference Join.scala covering-set semantics)."""
    return bootstrapped.where(
        ~F.array_contains(F.col(PROVENANCE), part_name)
    )


def backfill_with_bootstrap(
    left: DataFrame,
    events: DataFrame,
    gb: GroupBy,
    bootstrap: DataFrame,
    keys: list[str],
    time_column: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Bootstrap-aware backfill for one GroupBy: rows covered by the
    bootstrap table keep its values; only uncovered rows are computed."""
    booted = bootstrap_join(left, [(gb.name, bootstrap)], [*keys, time_column])
    todo = uncovered_rows(booted, gb.name).select(*keys, time_column)
    # no driver-side isEmpty() probe: an empty todo just contributes an empty
    # branch to the coalesced join (one plan, no extra blocking job)
    computed = G.temporal_events(todo, events, gb, left_time_column=time_column, tiebreak=tiebreak)
    out = coalesced_join(booted, computed, [*keys, time_column])
    return out


def label_join(
    features: DataFrame,
    label_events: DataFrame,
    label_gb: GroupBy,
    horizon: Window,
    time_column: str = "ts",
    tiebreak: str | None = None,
    prefix: str = "label",
) -> DataFrame:
    """Attach forward-looking labels: for each feature row at ts, aggregate
    label events with ``ts < ev.ts <= ts + horizon``.

    Implemented by reflecting time: negate both query and event timestamps
    and run the standard strict-past temporal engine — `-ev < -q  <=>
    ev > q`, and the trailing window becomes the leading horizon. Reuses all
    leakage discipline (now guaranteeing labels see ONLY the future)."""
    # negated REAL timestamps (pre-1970 instants) so all millis arithmetic in
    # the engine (to_millis, pmod tail rounding) stays exact
    neg_ts = F.timestamp_millis(-to_millis(F.col(time_column)))
    neg_q = features.select(*label_gb.keys, time_column, neg_ts.alias("__neg_ts"))
    neg_ev = label_events.withColumn(
        "__neg_ts", F.timestamp_millis(-to_millis(F.col(label_gb.time_column)))
    )
    gb_neg = GroupBy(
        name=label_gb.name,
        keys=label_gb.keys,
        aggregations=[
            Aggregation(
                operation=a.operation,
                input_column=a.input_column,
                windows=(horizon,),
                buckets=a.buckets,
                k=a.k,
                percentiles=a.percentiles,
            )
            for a in label_gb.aggregations
        ],
        accuracy=Accuracy.TEMPORAL,
        time_column="__neg_ts",
    )
    # strict past on negated axis = strict future on real axis; the sawtooth
    # tail on the negated axis rounds the horizon start — acceptable for
    # labels (same hop semantics, mirrored). Exact estimator only.
    q = neg_q.select(
        *label_gb.keys, F.col("__neg_ts").alias("__q_neg"), F.col(time_column)
    )
    ev2 = neg_ev.withColumn("__label_ts", F.col("__neg_ts"))
    gb_neg.time_column = "__label_ts"
    out = G.temporal_events(
        q,
        ev2,
        gb_neg,
        left_time_column="__q_neg",
        tiebreak=tiebreak,
        strategy="exact",
    )
    renames = {c: f"{prefix}_{c}" for c in gb_neg.output_columns()}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # features with duplicate (keys, ts) rows fan out into `out`; dedup the
    # label side so the final join preserves the left row count instead of
    # multiplying duplicates n x m
    out = out.drop("__q_neg").dropDuplicates([*label_gb.keys, time_column])
    return features.join(out, [*label_gb.keys, time_column], "left")
