"""Sliding-tile estimator — the skew-proof, 100TB-scale temporal engine.

Key identity: every window length is a whole multiple of its sawtooth tail
hop (windows are whole minutes/hours/days; hops are 5min/1h/1d), so

    sawtooth_tail(q, w) = floor(q, hop(w)) - w      (exactly)

and the window [tail, q) decomposes into three bands that depend on q only
through floor(q, hop) and floor(q, 5min):

    TAIL [floor(q,h)-w, floor(q,h))   per-(key) sliding RANGE window over
                                      the hop-tile table
    MID  [floor(q,h), floor(q,5m))    per-(key, hop-bucket) running prefix
                                      over the 5-minute-tile table
    HEAD [floor(q,5m), q)             raw events in the query's own
                                      5-minute bucket (strict <)

TAIL and MID are window functions over *densified* tile tables — probe rows
derived from the queries (NULL IRs) are unioned in, so bucket gaps resolve
without an as-of join — and queries fetch results by plain equi-joins on
(key, bucket). There is NO range join anywhere, so the quadratic key-group
blowup that kills equality-join plans on hot keys (a 60k-turn conversation
pairing 30k queries x 30k tiles inside one sort-merge group) cannot occur.
Per-key cost is O((tiles + probes) x frame) — linear.

This is the reference's HopsAggregator + SawtoothAggregator design
(aggregator/src/main/scala/ai/chronon/aggregator/windowing/
SawtoothAggregator.scala:64-139, HopsAggregator.scala:33-165) re-derived for
Catalyst: hop tiles = hop IRs, the densified window pass = the
(key, headStart) cogroup + computeWindows, the HEAD join = cumulate.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SW

from chronon_spark.api import Aggregation, GroupBy, Op, Window
from chronon_spark.functions import ops as O
from chronon_spark.plans import windows as W

QTS = "__q_ts_ms"
ETS = "__e_ts_ms"
TILE = "__tile_ms"
FINEST = 300_000  # 5-minute head resolution (reference FiveMinuteResolution)
DAY_MS = 86_400_000

# ops the sliding estimator supports (hop-mergeable minus sketches whose IRs
# cannot be merged at expression level)
SLIDING_OPS = O.HOP_MERGEABLE_OPS - {Op.APPROX_UNIQUE_COUNT}


# ---------------------------------------------------------------------------
# IR algebra: window-frame merge and expression-level band combine+finalize
# ---------------------------------------------------------------------------


def window_merge_cols(agg: Aggregation, slot: str, wspec) -> dict[str, Column]:
    """Merged partial IR columns over a window frame (same slot names)."""
    op = agg.operation
    k = agg.k or 1

    def c(s: str) -> Column:
        return F.col(f"{slot}__{s}")

    if op == Op.COUNT:
        return {f"{slot}__n": F.sum(c("n")).over(wspec)}
    if op == Op.SUM:
        return {f"{slot}__s": F.sum(c("s")).over(wspec)}
    if op == Op.AVERAGE:
        return {f"{slot}__s": F.sum(c("s")).over(wspec), f"{slot}__n": F.sum(c("n")).over(wspec)}
    if op == Op.VARIANCE:
        return {
            f"{slot}__n": F.sum(c("n")).over(wspec),
            f"{slot}__s": F.sum(c("s")).over(wspec),
            f"{slot}__q": F.sum(c("q")).over(wspec),
        }
    if op == Op.MIN:
        return {f"{slot}__m": F.min(c("m")).over(wspec)}
    if op == Op.MAX:
        return {f"{slot}__m": F.max(c("m")).over(wspec)}
    if op == Op.FIRST:
        return {f"{slot}__p": F.min(c("p")).over(wspec)}
    if op == Op.LAST:
        return {f"{slot}__p": F.max(c("p")).over(wspec)}
    if op in (Op.FIRST_K, Op.LAST_K, Op.TOP_K, Op.BOTTOM_K):
        flat = F.flatten(F.collect_list(c("l")).over(wspec))
        srt = F.array_sort(flat)
        if op in (Op.LAST_K, Op.TOP_K):
            srt = F.reverse(srt)
        return {f"{slot}__l": F.slice(srt, 1, k)}
    if op == Op.UNIQUE_COUNT:
        return {f"{slot}__set": F.array_distinct(F.flatten(F.collect_list(c("set")).over(wspec)))}
    raise ValueError(f"{op} not supported by the sliding estimator")


def _nz(col: Column) -> Column:
    return F.coalesce(col, F.lit(0))


def _sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def combine_and_finalize(agg: Aggregation, prefixes: list[str]) -> Column:
    """Expression-level merge of band IR columns ({prefix}__{slotcol}) and
    finalization to the user-facing value."""
    op = agg.operation
    k = agg.k or 1

    def cs(s: str) -> list[Column]:
        return [F.col(f"{p}__{s}") for p in prefixes]

    if op == Op.COUNT:
        return _sum_cols([_nz(c) for c in cs("n")])
    if op == Op.SUM:
        nonnull = None
        for c in cs("s"):
            nn = c.isNotNull()
            nonnull = nn if nonnull is None else (nonnull | nn)
        return F.when(nonnull, _sum_cols([_nz(c) for c in cs("s")]))
    if op == Op.AVERAGE:
        n = _sum_cols([_nz(c) for c in cs("n")])
        s = _sum_cols([_nz(c) for c in cs("s")])
        return F.when(n > 0, s / n)
    if op == Op.VARIANCE:
        n = _sum_cols([_nz(c) for c in cs("n")])
        s = _sum_cols([_nz(c) for c in cs("s")])
        sq = _sum_cols([_nz(c) for c in cs("q")])
        return F.when(n > 0, sq / n - (s / n) * (s / n))
    if op == Op.MIN:
        return F.least(*cs("m")) if len(prefixes) > 1 else cs("m")[0]
    if op == Op.MAX:
        return F.greatest(*cs("m")) if len(prefixes) > 1 else cs("m")[0]
    if op in (Op.FIRST, Op.LAST):
        arr = F.array_sort(F.array_compact(F.array(*cs("p"))))
        if op == Op.LAST:
            arr = F.reverse(arr)
        return F.when(F.size(arr) > 0, F.element_at(arr, 1)["v"])
    if op in (Op.FIRST_K, Op.LAST_K):
        # flatten(array_compact(array(bands))) sidesteps typed-empty-array
        # coercion: null band arrays just disappear
        flat = F.flatten(F.array_compact(F.array(*cs("l"))))
        srt = F.array_sort(flat)
        if op == Op.LAST_K:
            srt = F.reverse(srt)
        return F.transform(F.slice(srt, 1, k), lambda s: s["v"])
    if op in (Op.TOP_K, Op.BOTTOM_K):
        flat = F.array_sort(F.flatten(F.array_compact(F.array(*cs("l")))))
        if op == Op.TOP_K:
            flat = F.reverse(flat)
        return F.slice(flat, 1, k)
    if op == Op.UNIQUE_COUNT:
        flat = F.flatten(F.array_compact(F.array(*cs("set"))))
        return F.size(F.array_distinct(flat)).cast("long")
    raise ValueError(f"{op} not supported by the sliding estimator")


# ---------------------------------------------------------------------------
# the estimator
# ---------------------------------------------------------------------------


def _hop_of(w: Window | None) -> int:
    """Tail hop per window; lifetime aggregations ride the 1d tile table."""
    return DAY_MS if w is None else w.tail_hop_millis()


def temporal_pass_sliding(
    q: DataFrame,
    ev: DataFrame,
    gb: GroupBy,
    aggs: list[Aggregation],
    tiebreak: str | None,
) -> DataFrame:
    """Features for distinct query rows (keys + QTS). Returns a DataFrame
    keyed by (keys, QTS) with one column per (agg x window)."""
    from pyspark.storagelevel import StorageLevel

    keys = gb.keys
    pairs = [(a, w) for a in aggs for w, _ in a.unpacked()]
    by_hop: dict[int, list[tuple[Aggregation, Window | None]]] = defaultdict(list)
    for a, w in pairs:
        by_hop[_hop_of(w)].append((a, w))

    slot_of: dict[int, str] = {}
    partial_exprs: dict[str, Column] = {}
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    for a, _w in pairs:
        if id(a) not in slot_of:
            slot_of[id(a)] = f"a{len(slot_of)}"
            partial_exprs.update(
                O.partial_cols(a, F.col(a.input_column), F.col(ETS), tb, slot_of[id(a)])
            )
    ir_cols = list(partial_exprs.keys())
    aggs_unique = list({id(a): a for a, _ in pairs}.values())

    q = q.persist(StorageLevel.MEMORY_AND_DISK)

    # 5-minute base tiles, shared by all hop groups and the MID band
    t5 = (
        ev.withColumn(TILE, W.round_down(F.col(ETS), FINEST))
        .groupBy(*keys, TILE)
        .agg(*[c.alias(n) for n, c in partial_exprs.items()])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ir_types = {c: t5.schema[c].dataType for c in ir_cols}

    def _null_irs() -> list[Column]:
        return [F.lit(None).cast(ir_types[c]).alias(c) for c in ir_cols]

    out = q
    band_prefixes: dict[tuple[int, int], list[str]] = defaultdict(list)  # (agg_id, w_ms) -> prefixes

    for hop, hop_pairs in sorted(by_hop.items()):
        hb_col = f"__hb_{hop}"
        t5b_col = "__t5b"
        out = out.withColumn(hb_col, W.round_down(F.col(QTS), hop))
        if t5b_col not in out.columns:
            out = out.withColumn(t5b_col, W.round_down(F.col(QTS), FINEST))

        # ---- TAIL: densified sliding window over the hop tile table ----
        if hop == FINEST:
            tiles_h = t5
        else:
            merged: dict[str, Column] = {}
            for a in aggs_unique:
                merged.update(O.partial_merge_cols(a, slot_of[id(a)]))
            tiles_h = (
                t5.withColumn(TILE, W.round_down(F.col(TILE), hop))
                .groupBy(*keys, TILE)
                .agg(*[c.alias(n) for n, c in merged.items()])
            )
        probes = q.select(*keys, W.round_down(F.col(QTS), hop).alias(TILE)).distinct()
        dense = tiles_h.withColumn("__probe", F.lit(0)).unionByName(
            probes.select(*keys, TILE, *_null_irs()).withColumn("__probe", F.lit(1))
        )
        tail_sel: list[Column] = []
        for a, w in hop_pairs:
            slot = slot_of[id(a)]
            lo = -w.millis if w is not None else SW.unboundedPreceding
            wspec = SW.partitionBy(*keys).orderBy(F.col(TILE)).rangeBetween(lo, -1)
            prefix = f"t{hop}_{'w' + str(w.millis) if w is not None else 'life'}_{slot}"
            wm = window_merge_cols(a, slot, wspec)
            for name, col in wm.items():
                # name is "{slot}__{s}" -> rename to "{prefix}__{s}"
                tail_sel.append(col.alias(prefix + name[len(slot):]))
            band_prefixes[(id(a), w.millis if w else -1)].append(prefix)
        tail_probe = (
            dense.select(*keys, TILE, F.col("__probe"), *tail_sel)
            .where(F.col("__probe") == 1)
            .drop("__probe")
            .withColumnRenamed(TILE, hb_col)
        )
        out = out.join(tail_probe, [*keys, hb_col], "left")

        # ---- MID: running prefix of 5m tiles inside the hop bucket ----
        if hop != FINEST:
            probes5 = q.select(*keys, W.round_down(F.col(QTS), FINEST).alias(TILE)).distinct()
            dense5 = t5.withColumn("__probe", F.lit(0)).unionByName(
                probes5.select(*keys, TILE, *_null_irs()).withColumn("__probe", F.lit(1))
            )
            wspec5 = (
                SW.partitionBy(*keys, W.round_down(F.col(TILE), hop))
                .orderBy(F.col(TILE))
                .rangeBetween(SW.unboundedPreceding, -1)
            )
            mid_sel: list[Column] = []
            for a in {id(a): a for a, _ in hop_pairs}.values():
                slot = slot_of[id(a)]
                prefix = f"m{hop}_{slot}"
                for name, col in window_merge_cols(a, slot, wspec5).items():
                    mid_sel.append(col.alias(prefix + name[len(slot):]))
            for a, w in hop_pairs:
                band_prefixes[(id(a), w.millis if w else -1)].append(
                    f"m{hop}_{slot_of[id(a)]}"
                )
            mid_probe = (
                dense5.select(*keys, TILE, F.col("__probe"), *mid_sel)
                .where(F.col("__probe") == 1)
                .drop("__probe")
                .withColumnRenamed(TILE, t5b_col)
            )
            out = out.join(mid_probe, [*keys, t5b_col], "left")

    # ---- HEAD: raw events in the query's own 5-minute bucket ----
    eva = ev.select(
        *[F.col(k).alias(f"__e_{k}") for k in keys],
        W.round_down(F.col(ETS), FINEST).alias("__e_t5b"),
        *[c for c in ev.columns if c not in keys],
    )
    hcond = F.lit(True)
    for k in keys:
        hcond = hcond & (F.col(k) == F.col(f"__e_{k}"))
    hcond = hcond & (F.col("__t5b") == F.col("__e_t5b")) & (F.col(ETS) < F.col(QTS))
    head_sel = {f"h_{n}": c for n, c in partial_exprs.items()}
    head_src = q.select(*keys, QTS).withColumn("__t5b", W.round_down(F.col(QTS), FINEST))
    head = (
        head_src.join(eva, hcond, "inner")
        .groupBy(*keys, QTS)
        .agg(*[c.alias(n) for n, c in head_sel.items()])
    )
    out = out.join(head, [*keys, QTS], "left")
    for a, w in pairs:
        band_prefixes[(id(a), w.millis if w else -1)].append(f"h_{slot_of[id(a)]}")

    final_cols = []
    for a, w in pairs:
        prefixes = band_prefixes[(id(a), w.millis if w else -1)]
        final_cols.append(combine_and_finalize(a, prefixes).alias(a.output_name(w, None)))
    feature_names = [a.output_name(w, None) for a, w in pairs]
    return out.select(*gb.keys, QTS, *final_cols).select(*gb.keys, QTS, *feature_names)
