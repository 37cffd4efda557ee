"""Dry-run analysis: output-schema inference, heavy-hitter (skew key)
detection, and a pre-flight VALIDATION GATE — the reference's Analyzer
re-expressed over DataFrames (spark/src/main/scala/ai/chronon/spark/
Analyzer.scala:64-700; heavy hitters L95-143 use an ItemsSketch over
sampled keys — we use exact counts over an optional sample; schema /
data-availability / timestamp validations L190-520, 593-640).

The gate exists so a misdeclared source fails with a structured diagnosis
BEFORE a multi-hour backfill, not with a mid-job Spark exception."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api import GroupBy, Op
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
class ValidationError:
    code: str  # stable machine-readable identifier
    column: str | None
    message: str


# ops whose input must be numeric (reference ColumnAggregator.construct
# dispatch rejects other input types at plan time)
_NUMERIC_OPS = {
    Op.SUM,
    Op.TIME_DECAYED_SUM,
    Op.AVERAGE,
    Op.VARIANCE,
    Op.SKEW,
    Op.KURTOSIS,
    Op.PERCENTILE,
    Op.APPROX_PERCENTILE,
}
_NUMERIC_TYPES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_TIME_TYPES = (T.TimestampType, T.TimestampNTZType, T.LongType, T.IntegerType, T.DateType)

# plausible epoch-millis range: 2001-09-09 (1e12) .. 2128 (5e12); values in
# [1e9, 1e12) are almost certainly epoch SECONDS (the reference's ts checks,
# Analyzer.scala:593-640)
_MS_LO, _MS_HI = 1_000_000_000_000, 5_000_000_000_000


def validate_group_by(
    events: DataFrame,
    gb: GroupBy,
    start_ds: str | None = None,
    check_data: bool = True,
    mutations: DataFrame | None = None,
) -> list[ValidationError]:
    """Pre-flight checks for one GroupBy against its source. Schema checks
    are free (no job); data checks (timestamp sanity + availability) run ONE
    aggregate over the source when ``check_data``.

    Returns [] when the backfill is safe to launch."""
    errs: list[ValidationError] = []
    if isinstance(events, (tuple, list, dict)):
        # entity-CDC source (snapshots, mutations) — validate the snapshot
        # frame as the source and the mutation frame through the CDC checks
        if isinstance(events, dict):
            events, mutations = events["snapshots"], events["mutations"]
        else:
            events, mutations = events
    fields = {f.name: f.dataType for f in events.schema.fields}

    for k in gb.keys:
        if k not in fields:
            errs.append(ValidationError("missing_key_column", k, f"key column '{k}' not in source schema"))
    if gb.aggregations is None:
        # no-aggregation selection part: features are the snapshot's non-key
        # fields served from the previous day's 'ds' partition — no time
        # engine, so the only extra requirement is the partition column
        if mutations is not None:
            errs.append(
                ValidationError(
                    "selection_with_mutations", gb.name,
                    "selection GroupBy (aggregations=None) cannot consume a "
                    "mutation source — it serves snapshot fields only",
                )
            )
        if "ds" not in fields:
            errs.append(
                ValidationError(
                    "missing_partition_column", "ds",
                    "selection GroupBy (aggregations=None) requires a 'ds' "
                    "snapshot-partition column to serve from",
                )
            )
        return errs
    if gb.time_column not in fields:
        errs.append(
            ValidationError(
                "missing_time_column", gb.time_column, f"time column '{gb.time_column}' not in source schema"
            )
        )
    elif not isinstance(fields[gb.time_column], _TIME_TYPES):
        errs.append(
            ValidationError(
                "bad_time_type",
                gb.time_column,
                f"time column '{gb.time_column}' is {fields[gb.time_column].simpleString()}; "
                "expected timestamp or epoch-millis long",
            )
        )
    for a in gb.aggregations:
        if a.input_column not in fields:
            errs.append(
                ValidationError(
                    "missing_input_column", a.input_column,
                    f"aggregation input '{a.input_column}' not in source schema",
                )
            )
        elif a.operation in _NUMERIC_OPS and not isinstance(fields[a.input_column], _NUMERIC_TYPES):
            errs.append(
                ValidationError(
                    "bad_input_type",
                    a.input_column,
                    f"{a.operation.value} requires a numeric input; "
                    f"'{a.input_column}' is {fields[a.input_column].simpleString()}",
                )
            )
        from chronon_spark.functions.ops import MAP_OPS

        if a.buckets and a.operation in MAP_OPS:
            errs.append(
                ValidationError(
                    "bucketed_map_op", a.input_column,
                    f"{a.operation.value} does not support buckets "
                    "(map-valued output cannot nest)",
                )
            )
        from chronon_spark.functions.ops import DECAYED_OPS

        if a.operation in DECAYED_OPS:
            if a.halflife is None:
                errs.append(
                    ValidationError(
                        "missing_halflife", a.input_column,
                        f"{a.operation.value} requires halflife "
                        "(e.g. halflife=Window(1, TimeUnit.DAYS))",
                    )
                )
            elif a.halflife.millis <= 0:
                errs.append(
                    ValidationError(
                        "bad_halflife", a.input_column,
                        f"halflife must be positive; got {a.halflife.suffix}",
                    )
                )
            if not (1 <= a.decay_cap <= 40):
                errs.append(
                    ValidationError(
                        "bad_decay_cap", a.input_column,
                        f"decay_cap must be in [1, 40]; got {a.decay_cap}",
                    )
                )
            if mutations is not None and a.windows is None:
                errs.append(
                    ValidationError(
                        "decayed_lifetime_cdc", a.input_column,
                        f"{a.operation.value} on a mutation (CDC) source "
                        "requires a window (event-time mask)",
                    )
                )
        for b in a.buckets or ():
            if b not in fields:
                errs.append(
                    ValidationError("missing_bucket_column", b, f"bucket column '{b}' not in source schema")
                )
            elif not isinstance(fields[b], T.StringType):
                # reference RowAggregator.scala:41-47: buckets must be String
                errs.append(
                    ValidationError(
                        "bucket_not_string", b,
                        f"bucket column '{b}' is {fields[b].simpleString()}; buckets must be string",
                    )
                )
    # duplicate output-name gate WITHIN one GroupBy (join-part level dedup
    # runs across parts in validate_join; two aggs identical except for a
    # non-name-bearing knob would otherwise silently collide)
    seen_outputs: dict[str, str] = {}
    for a in gb.aggregations:
        for w, b in a.unpacked():
            nm = a.output_name(w, b)
            desc = f"{a.operation.value}({a.input_column})"
            if nm in seen_outputs:
                errs.append(
                    ValidationError(
                        "duplicate_output_column", nm,
                        f"output column '{nm}' produced by both {seen_outputs[nm]} "
                        f"and {desc} — rename inputs or vary windows/halflife",
                    )
                )
            else:
                seen_outputs[nm] = desc
        # int64 headroom warning for integer-scaled decayed sums: the IR is
        # sum(value << (decay_cap - age_halflives)), so integral inputs must
        # stay below 2^(63 - decay_cap) per row (and the per-key sum below
        # int64) or Spark's non-ANSI SUM wraps silently.
        if a.operation is Op.TIME_DECAYED_SUM and a.input_column in fields:
            _widths = {T.ByteType: 7, T.ShortType: 15, T.IntegerType: 31, T.LongType: 63}
            width = next((w_ for t, w_ in _widths.items() if isinstance(fields[a.input_column], t)), None)
            if width is not None and width + a.decay_cap > 62:
                import warnings

                warnings.warn(
                    f"TIME_DECAYED_SUM({a.input_column}): "
                    f"{fields[a.input_column].simpleString()} input with decay_cap="
                    f"{a.decay_cap} can overflow the int64 scaled sum if values "
                    f"exceed 2^{63 - a.decay_cap}; lower decay_cap or cast to double",
                    stacklevel=2,
                )

    if mutations is not None:
        mfields = {f.name for f in mutations.schema.fields}
        for req in ("mutation_ts", "is_before"):
            if req not in mfields:
                errs.append(
                    ValidationError(
                        "missing_mutation_column", req, f"mutation source lacks required column '{req}'"
                    )
                )
        from chronon_spark.operators.mutations import DELETABLE_OPS

        for a in gb.aggregations:
            if a.operation not in DELETABLE_OPS:
                errs.append(
                    ValidationError(
                        "non_deletable_op",
                        a.input_column,
                        f"{a.operation.value} is not deletable and cannot run over a mutation source",
                    )
                )

    if errs or not check_data:
        return errs  # schema errors make the data pass meaningless

    from chronon_spark.plans.windows import ts_to_millis

    ts = ts_to_millis(events, gb.time_column)
    stats = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(gb.time_column)).alias("n_ts"),
        F.min(ts).alias("lo"),
        F.max(ts).alias("hi"),
    ).first()
    if stats["n"] == 0:
        errs.append(ValidationError("empty_source", None, "source has no rows"))
        return errs
    if stats["n_ts"] < stats["n"]:
        errs.append(
            ValidationError(
                "null_timestamps", gb.time_column,
                f"{stats['n'] - stats['n_ts']} of {stats['n']} rows have a NULL time column",
            )
        )
    if stats["lo"] is not None and not (_MS_LO <= stats["lo"] and stats["hi"] < _MS_HI):
        errs.append(
            ValidationError(
                "ts_not_millis", gb.time_column,
                f"time range [{stats['lo']}, {stats['hi']}] is outside plausible epoch-millis "
                "bounds (epoch seconds instead of milliseconds?)",
            )
        )
    if start_ds is not None and stats["lo"] is not None:
        import calendar
        import datetime as _dt

        start_ms = calendar.timegm(_dt.datetime.strptime(start_ds, "%Y-%m-%d").timetuple()) * 1000
        max_w = gb.max_window_millis()
        scan_lo = start_ms - (max_w or 0)
        if max_w is not None and stats["lo"] > scan_lo:
            errs.append(
                ValidationError(
                    "insufficient_history", gb.time_column,
                    f"backfill from {start_ds} needs events from epoch-ms {scan_lo} "
                    f"(start - max window) but the source begins at {stats['lo']}",
                )
            )
    return errs


@dataclass
class GroupByAnalysis:
    output_schema: list[tuple[str, str]]
    key_columns: list[str]
    hot_keys: list[tuple[str, str, int]]
    errors: list[ValidationError] = field(default_factory=list)


def analyze_group_by(
    events: DataFrame, gb: GroupBy, hot_key_threshold: int = 10_000
) -> GroupByAnalysis:
    """Infer the exact output schema (by planning against an empty slice —
    no data pass), run the validation gate, and detect hot keys. The
    reference runs this before every backfill (Analyzer.analyzeJoin)."""
    errors = validate_group_by(events, gb, check_data=False)
    if errors:
        return GroupByAnalysis([], gb.keys, [], errors)
    if isinstance(events, dict):
        snapshots = events["snapshots"]
    elif isinstance(events, (tuple, list)):
        snapshots = events[0]
    else:
        snapshots = events
    if gb.aggregations is None:
        # selection GroupBy: output = keys + the snapshot's non-key fields
        schema = [
            (f.name, f.dataType.simpleString())
            for f in snapshots.schema.fields
            if f.name not in ("ds", gb.time_column)
        ]
    else:
        left = snapshots.select(*gb.keys, F.col(gb.time_column).alias("ts")).limit(0)
        if isinstance(events, (tuple, list, dict)):
            from chronon_spark.operators.mutations import temporal_entities

            if isinstance(events, dict):
                muts = events["mutations"]
            else:
                muts = events[1]
            plan = temporal_entities(
                left, snapshots.limit(0), muts.limit(0), gb, left_time_column="ts"
            )
        else:
            plan = G.temporal_events(left, events.limit(0), gb, left_time_column="ts")
        schema = [(f.name, f.dataType.simpleString()) for f in plan.schema.fields]
    hot = [
        (r["column"], r["key"], r["n"])
        for r in heavy_hitters(snapshots, gb.keys, min_count=hot_key_threshold).collect()
    ]
    return GroupByAnalysis(schema, gb.keys, hot, [])


# ---------------------------------------------------------------------------
# join-level analysis (reference Analyzer.analyzeJoin, Analyzer.scala:279-483):
# validate the left and EVERY join part, detect output-column collisions
# across parts, and aggregate hot-key detection over all part key columns.
# ---------------------------------------------------------------------------


def validate_join(
    left: DataFrame,
    sources: dict[str, DataFrame],
    join,
    start_ds: str | None = None,
    check_data: bool = False,
) -> list[ValidationError]:
    """Pre-flight checks for a whole Join: left schema (keys + time column),
    per-part key mapping sanity, every part's GroupBy against its own source,
    and cross-part output-name collisions. Schema-only unless ``check_data``.
    ``sources`` values may be DataFrames, CDC (snapshots, mutations) pairs,
    or declarative EventSource/EntitySource objects (resolved schema-only
    unless ``check_data`` — the gate itself must not launch jobs)."""
    from chronon_spark.operators.join import _resolve_sources

    sources = _resolve_sources(left.sparkSession, sources, schema_only=not check_data)
    errs: list[ValidationError] = []
    lf = {f.name: f.dataType for f in left.schema.fields}

    if join.time_column not in lf:
        errs.append(
            ValidationError(
                "missing_time_column", join.time_column,
                f"left lacks time column '{join.time_column}'",
            )
        )
    elif not isinstance(lf[join.time_column], _TIME_TYPES):
        errs.append(
            ValidationError(
                "bad_time_type", join.time_column,
                f"left time column '{join.time_column}' is "
                f"{lf[join.time_column].simpleString()}; expected timestamp or epoch-millis long",
            )
        )

    seen_outputs: dict[str, str] = {}
    for part in join.join_parts:
        gb = part.group_by
        label = part.full_prefix()
        if gb.name not in sources:
            errs.append(
                ValidationError(
                    "missing_source", gb.name,
                    f"join part '{label}' has no source DataFrame for GroupBy '{gb.name}'",
                )
            )
            continue
        for lk, rk in part.key_mapping.items():
            if rk not in gb.keys:
                errs.append(
                    ValidationError(
                        "bad_key_mapping", rk,
                        f"part '{label}' maps left '{lk}' to '{rk}', which is not a key "
                        f"of GroupBy '{gb.name}' (keys: {gb.keys})",
                    )
                )
        for lk in part.left_keys():
            if lk not in lf:
                errs.append(
                    ValidationError(
                        "missing_left_key", lk,
                        f"part '{label}' joins on left column '{lk}' which the left lacks",
                    )
                )
        for e in validate_group_by(sources[gb.name], gb, start_ds=start_ds, check_data=check_data):
            errs.append(
                ValidationError(e.code, e.column, f"part '{label}': {e.message}")
            )
        if gb.aggregations is None:
            # selection part: outputs are the snapshot's non-key fields
            src = sources[gb.name]
            if isinstance(src, (tuple, list, dict)):
                errs.append(
                    ValidationError(
                        "selection_with_mutations", gb.name,
                        f"part '{label}' has aggregations=None but a CDC "
                        "(snapshots, mutations) source — selection parts "
                        "serve snapshot fields only",
                    )
                )
                continue
            part_outputs = [
                c
                for c in src.columns
                if c not in (*gb.keys, "ds", gb.time_column)
            ]
        else:
            part_outputs = gb.output_columns()
        for c in part_outputs:
            full = f"{label}_{c}"
            if full in seen_outputs:
                errs.append(
                    ValidationError(
                        "duplicate_output_column", full,
                        f"parts '{seen_outputs[full]}' and '{label}' both emit '{full}' "
                        "(set JoinPart.prefix to disambiguate)",
                    )
                )
            seen_outputs[full] = label
    return errs


@dataclass
class JoinAnalysis:
    output_schema: list[tuple[str, str]]
    part_schemas: dict[str, list[tuple[str, str]]]
    hot_keys: list[tuple[str, str, str, int]]  # (part | 'left', column, key, n)
    errors: list[ValidationError] = field(default_factory=list)


def analyze_join(
    left: DataFrame,
    sources: dict[str, DataFrame],
    join,
    hot_key_threshold: int = 10_000,
) -> JoinAnalysis:
    """Join-level dry run: validation gate over left + every part, exact
    output schema (planned against empty slices — no data pass), and hot-key
    detection aggregated across the left and every part source."""
    from chronon_spark.operators.join import _resolve_sources, compute_join

    sources = _resolve_sources(left.sparkSession, sources)
    errors = validate_join(left, sources, join, check_data=False)
    if errors:
        return JoinAnalysis([], {}, [], errors)

    def _empty(s):
        # CDC sources are (snapshots, mutations) pairs — empty both legs
        if isinstance(s, dict):
            return {k: v.limit(0) for k, v in s.items()}
        if isinstance(s, (tuple, list)):
            return tuple(x.limit(0) for x in s)
        return s.limit(0)

    plan = compute_join(
        left.limit(0), {n: _empty(s) for n, s in sources.items()}, join
    )
    schema = [(f.name, f.dataType.simpleString()) for f in plan.schema.fields]
    part_schemas: dict[str, list[tuple[str, str]]] = {}
    for part in join.join_parts:
        prefix = f"{part.full_prefix()}_"
        part_schemas[part.full_prefix()] = [
            (n, t) for n, t in schema if n.startswith(prefix)
        ]

    hot: list[tuple[str, str, str, int]] = []
    left_keys = sorted({lk for p in join.join_parts for lk in p.left_keys()})
    for r in heavy_hitters(left, left_keys, min_count=hot_key_threshold).collect():
        hot.append(("left", r["column"], r["key"], r["n"]))
    for part in join.join_parts:
        src = sources[part.group_by.name]
        if isinstance(src, dict):
            src = src["snapshots"]
        elif isinstance(src, (tuple, list)):
            src = src[0]
        hh = heavy_hitters(src, part.group_by.keys, min_count=hot_key_threshold)
        for r in hh.collect():
            hot.append((part.full_prefix(), r["column"], r["key"], r["n"]))
    return JoinAnalysis(schema, part_schemas, hot, [])
