"""Entity-mutation (CDC) temporal engine — point-in-time features over
MUTABLE dimension tables.

Reference semantics (spark/src/main/scala/ai/chronon/spark/GroupBy.scala
L170-273 `temporalEntities`; aggregator/src/main/scala/ai/chronon/aggregator/
windowing/SawtoothMutationAggregator.scala L40-216; tested by
spark/src/test/scala/ai/chronon/spark/test/MutationsTest.scala):

for a query at ``ts`` on day ``d``, the feature value aggregates the entity
rows *as they existed at ts*:

1. start from the end-of-day state of day ``d-1`` (the snapshot table's
   partition ``d-1``, whose span ends at midnight of ``d``);
2. roll forward the day-``d`` mutation rows with ``mutation_ts < ts``
   (STRICT — a mutation at exactly the query instant is not yet visible):
   insert rows (``is_before = false``) update the IR, reversal rows
   (``is_before = true``) DELETE their contribution;
3. windowed aggregations additionally mask every contribution by the row's
   own event time: ``sawtooth_tail(ts, w) <= row.ts < ts``
   (SawtoothMutationAggregator.updateIr L113-128: ``row.ts >=
   round(queryTs - w, hop) && row.ts < queryTs``); unwindowed (lifetime)
   aggregations apply no event-time mask at all (``window == null ||
   rowInWindow``).

Spark-first design — no RDD cogroup, no mutable IR objects. Deletable
operations (COUNT / SUM / AVERAGE / VARIANCE — the reference's abelian-group
IRs, aggregator/.../row/ColumnAggregator.scala `delete`) are *signed sums*,
so both phases collapse into one declarative plan:

    contributions = (snapshot rows of day d-1, sign +1)
                  UNION (day-d mutations with mutation_ts < ts,
                         sign -1 for reversals else +1)
    feature       = groupBy(keys, ts).agg( SUM(sign [* value] [mask]) )

The snapshot side is a pure equi-join on (keys, day) — no range join, no
per-key fan-out beyond the entity's live rows. The mutation side carries the
``mutation_ts < ts`` predicate *inside* a (keys, day) equi-join, so the
range comparison is confined to one key-day cell (bounded by a day's
mutation volume — the same day-bounded shape as the reference's per-day
cogroup; a pathologically hot key-day can be salted upstream like any other
skewed aggregation).

The reference's tailBufferMillis / collapsed-vs-tail-hop IR split
(SawtoothMutationAggregator L62-104) is a memory layout for shipping IRs to
a KV store; the *semantics* it implements is exactly the event-time mask of
step 3, which this plan applies directly per (query, window).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.plans import windows as W

QTS = "__q_ts_ms"  # query-time long millis
ETS = "__e_ts_ms"  # entity-row event-time long millis
MTS = "__m_ts_ms"  # mutation-time long millis (NULL for snapshot rows)
SGN = "__sign"  # +1 insert / snapshot, -1 reversal
QDAY = "__q_day_ms"  # midnight (day start) of the query's day
DAY_MS = W.MS_PER_DAY

# the reference's deletable aggregators (abelian-group IRs that support
# `delete`): only these may be used over a mutation source
# (aggregator/.../row/ColumnAggregator.scala sum/count/average/variance
# deletable dispatch; Analyzer rejects the rest for mutation sources).
# TIME_DECAYED ops are signed WEIGHTED sums — an abelian group too — so a
# reversal cancels its insert exactly at any halflife; they require a
# window (CDC lifetime visibility is mutation-time-based, and the age
# weighting needs the event-time mask to guarantee non-negative ages).
DELETABLE_OPS = {
    Op.COUNT,
    Op.SUM,
    Op.AVERAGE,
    Op.VARIANCE,
    Op.TIME_DECAYED_SUM,
    Op.TIME_DECAYED_COUNT,
}


def _signed_agg(a: Aggregation, w, value: Column, ets: Column, qts: Column, sign: Column) -> Column:
    """One signed aggregate for (op, window): contributions inside the
    event-time window (windowed ops) with reversal rows subtracting."""
    if w is None:
        mask = F.lit(True)  # lifetime: mutation visibility only, no ETS mask
    else:
        mask = (ets < qts) & (ets >= W.sawtooth_tail(qts, w))
    op = a.operation
    v = F.when(mask, value)
    s = F.when(mask & value.isNotNull(), sign)
    if op == Op.COUNT:
        return F.coalesce(F.sum(s), F.lit(0)).cast("long")
    if op == Op.SUM:
        return F.sum(v * sign)
    if op == Op.AVERAGE:
        n = F.sum(s)
        return F.when(n > 0, F.sum(v * sign) / n)
    if op == Op.VARIANCE:
        d = v.cast("double")
        n, sm, sq = F.sum(s), F.sum(d * sign), F.sum(d * d * sign)
        return F.when(n > 0, sq / n - (sm / n) * (sm / n))
    if op in (Op.TIME_DECAYED_SUM, Op.TIME_DECAYED_COUNT):
        from chronon_spark.functions import ops as O

        if w is None:
            raise ValueError(
                f"{op.value} on a mutation (CDC) source requires a window: "
                "lifetime visibility is mutation-time-based, but the decay "
                "weighting needs the event-time mask (non-negative ages)"
            )
        wt = O.decayed_weight(a, qts, F.when(mask, ets))
        base = (
            F.when(mask & value.isNotNull(), F.lit(1).cast("long"))
            if op == Op.TIME_DECAYED_COUNT
            else v
        )
        return O.decayed_finalize(a, F.sum(base * sign * wt))
    raise ValueError(
        f"{op} is not deletable — mutation (CDC) sources support only {sorted(o.value for o in DELETABLE_OPS)}"
    )


def _bucket_maps(
    contribs: DataFrame, gb: GroupBy, keys: list[str], bcol: str, aggs: list[Aggregation]
) -> DataFrame:
    """Bucketed (map-output) signed aggregates for one bucket column:
    groupBy(keys, qts, bucket) signed pass, then Map[bucket -> value]
    assembly per (aggregation, window) — the CDC analog of the event
    engine's _bucket_pass (reference BucketedColumnAggregator over the
    SawtoothMutationAggregator's deletable IRs).

    A bucket entry is kept iff its signed PRESENCE is positive — ≥1 alive
    (non-reversed, mutation-visible) row with a non-null bucket inside the
    GroupBy's shared presence window (the largest window across all
    aggregations; plans/sliding._presence_window, the same rule the exact
    and tiled event passes use). A fully-reversed bucket therefore drops
    out of the map, exactly as it would never have appeared had the rows
    never existed."""
    from chronon_spark.plans.sliding import _presence_window

    w_pres = _presence_window(gb)
    qts, ets = F.col(QTS), F.col(ETS)
    if w_pres is None:
        pres_mask = F.lit(True)
    else:
        pres_mask = (ets < qts) & (ets >= W.sawtooth_tail(qts, w_pres))
    inner_exprs, outs = [], []
    for a in aggs:
        for w, b in a.unpacked():
            if b != bcol:
                continue
            nm = a.output_name(w, bcol)
            inner_exprs.append(
                _signed_agg(
                    a, w, F.col(a.input_column), ets, qts, F.col(SGN)
                ).alias(f"__v_{nm}")
            )
            outs.append(nm)
    inner = (
        contribs.where(F.col(bcol).isNotNull())
        .groupBy(*keys, QTS, bcol)
        .agg(*inner_exprs, F.sum(F.when(pres_mask, F.col(SGN))).alias("__pres"))
        .where(F.col("__pres") > 0)
    )
    return inner.groupBy(*keys, QTS).agg(
        *[
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(bcol).alias("k"), F.col(f"__v_{nm}").alias("v"))
                    )
                )
            ).alias(nm)
            for nm in outs
        ]
    )


def temporal_entities(
    queries: DataFrame,
    snapshots: DataFrame,
    mutations: DataFrame,
    gb: GroupBy,
    left_time_column: str | None = None,
    ds_column: str = "ds",
    mutation_time_column: str = "mutation_ts",
    reversal_column: str = "is_before",
    n_salts: int = 1,
) -> DataFrame:
    """Point-in-time features over a mutable entity source.

    ``queries``   — left rows: gb.keys + a timestamp column.
    ``snapshots`` — daily end-of-day state: gb.keys + input columns +
                    gb.time_column (the row's event time) + ``ds_column``;
                    partition ``ds`` holds the rows live at the END of ds.
    ``mutations`` — CDC log: same columns as snapshots plus
                    ``mutation_time_column`` and boolean ``reversal_column``
                    (true = before-image / delete); partitioned by the
                    mutation's day in ``ds_column``.

    Returns the query rows + one feature column per (aggregation, window)
    — Map[bucket -> value] columns for bucketed aggregations (entry kept
    iff the bucket has alive presence in the GroupBy's shared presence
    window; see _bucket_maps). Duplicate query rows are preserved
    (aggregate on distinct (keys, ts), fan back out — same contract as
    temporal_events).

    ``n_salts`` > 1 splits each (key, day) join cell across that many tasks
    (contribution rows hashed into salt groups, queries replicated): a hot
    entity with millions of same-day mutations otherwise lands its whole
    q x m pairing in one sort-merge group. Signed sums merge across salts
    for free in the final groupBy, so results are identical at any salt
    count.
    """
    for a in gb.aggregations:
        if a.operation not in DELETABLE_OPS:
            raise ValueError(
                f"{a.operation} is not deletable; mutation sources support "
                f"only {sorted(o.value for o in DELETABLE_OPS)}"
            )
    from chronon_spark.operators.groupby import run_setups

    run_setups(queries, gb.setups)
    keys = gb.keys
    direct = [a for a in gb.aggregations if not a.buckets]
    bucketed: dict[str, list[Aggregation]] = {}
    for a in gb.aggregations:
        for b in a.buckets or ():
            bucketed.setdefault(b, []).append(a)
    ltc = left_time_column or gb.time_column
    left_n = queries.withColumn(QTS, W.ts_to_millis(queries, ltc))
    q = (
        left_n.select(*keys, QTS)
        .distinct()
        .withColumn(QDAY, F.col(QTS) - F.pmod(F.col(QTS), F.lit(DAY_MS)))
    )

    inputs = sorted({a.input_column for a in gb.aggregations} | set(bucketed))
    day_of_ds = W.to_millis(F.to_timestamp(F.col(ds_column)))

    # snapshot partition d covers state up to midnight of d+1 == the query's
    # own midnight (the reference's shifted end_of_day_ds join,
    # GroupBy.scala:207-213)
    snap = snapshots.select(
        *keys,
        *inputs,
        W.ts_to_millis(snapshots, gb.time_column).alias(ETS),
        (day_of_ds + F.lit(DAY_MS)).alias(QDAY),
        F.lit(None).cast("long").alias(MTS),
        F.lit(1).alias(SGN),
    )
    mut = mutations.select(
        *keys,
        *inputs,
        W.ts_to_millis(mutations, gb.time_column).alias(ETS),
        day_of_ds.alias(QDAY),
        W.ts_to_millis(mutations, mutation_time_column).alias(MTS),
        F.when(F.col(reversal_column), F.lit(-1)).otherwise(F.lit(1)).alias(SGN),
    )

    q_j = q
    if n_salts > 1:
        q_j = q.withColumn(
            "__qsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )

    def _joined(contrib: DataFrame, extra: Column | None) -> DataFrame:
        c = contrib.select(
            *[F.col(k).alias(f"__e_{k}") for k in keys],
            F.col(QDAY).alias("__e_qday"),
            ETS,
            MTS,
            SGN,
            *inputs,
        )
        cond = F.col(QDAY) == F.col("__e_qday")
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__e_{k}"))
        if extra is not None:
            cond = cond & extra
        if n_salts > 1:
            c = c.withColumn(
                "__esalt",
                F.pmod(F.xxhash64(F.col(ETS), F.coalesce(F.col(MTS), F.lit(0))), F.lit(n_salts)),
            )
            cond = cond & (F.col("__qsalt") == F.col("__esalt"))
        return q_j.join(c, cond, "inner").select(*keys, QTS, ETS, MTS, SGN, *inputs)

    snap_j = _joined(snap, None)
    # STRICT visibility: a mutation at exactly the query instant is unseen
    # (lambdaAggregateIrMany: `sortedInputs(inputIdx).mutationTs < queryTs`)
    mut_j = _joined(mut, F.col(MTS) < F.col(QTS))
    contribs = snap_j.unionByName(mut_j)

    exprs = []
    for a in direct:
        for w, _ in a.unpacked():
            exprs.append(
                _signed_agg(
                    a, w, F.col(a.input_column), F.col(ETS), F.col(QTS), F.col(SGN)
                ).alias(a.output_name(w, None))
            )
    if exprs:
        feat = (
            q.join(contribs, [*keys, QTS], "left_outer")
            .groupBy(*keys, QTS)
            .agg(*exprs)
        )
    else:
        feat = q.select(*keys, QTS)
    for bcol, baggs in bucketed.items():
        feat = feat.join(
            _bucket_maps(contribs, gb, keys, bcol, baggs), [*keys, QTS], "left"
        )
    out = left_n.join(feat, [*keys, QTS], "left").drop(QTS)
    if gb.derivations:
        from chronon_spark.operators.groupby import apply_derivations

        out = apply_derivations(out, gb.derivations, keep=list(queries.columns))
    return out
