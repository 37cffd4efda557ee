"""Drift / consistency metrics — the reference's CompareMetrics + sequence
EditDistance re-expressed Spark-first.

Reference: spark/src/main/scala/ai/chronon/spark/stats/CompareMetrics.scala
(metric transforms L50-125: both_null / left_null / right_null / mismatch /
total, numeric smape + percentiles of left-right, sequence lengths + edit
distance) and EditDistance.scala (insert/delete-only distance — NO
substitution — so distance decomposes as insert = |left| - LCS,
delete = |right| - LCS, "inserts and deletes into right to make it like
left").

All counting/smape/percentile metrics are native Column expressions. The
sequence edit distance is the one genuinely non-expressible op: it runs as
an Arrow-vectorized pandas UDF (the reference itself drops to a Scala UDF
here), batch-at-a-time, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

L, R = "_left", "_right"

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _lcs(a, b) -> int:
    """Longest common subsequence length (two-row DP)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[len(b)]


def edit_distance(left: Column, right: Column) -> Column:
    """struct(insert, delete, total): insert/delete-only edit distance
    turning ``right`` into ``left`` (reference EditDistance.between).
    Arrow-batched pandas UDF over array or string columns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<insert:int,delete:int,total:int>")
    def _ed(ls: pd.Series, rs: pd.Series) -> pd.DataFrame:
        ins, dele, tot = [], [], []
        for a, b in zip(ls, rs):
            a = list(a) if a is not None else []
            b = list(b) if b is not None else []
            k = _lcs(a, b)
            i, d = len(a) - k, len(b) - k
            ins.append(i)
            dele.append(d)
            tot.append(i + d)
        return pd.DataFrame({"insert": ins, "delete": dele, "total": tot})

    return _ed(left, right)


def side_by_side(
    left: DataFrame, right: DataFrame, keys: list[str], mapping: dict[str, str] | None = None
) -> tuple[DataFrame, list[tuple[str, object]]]:
    """Full-outer join with _left/_right suffixed value columns (the
    reference's comparison view). Returns (joined, [(name, dataType)]) for
    the compared fields."""
    mapping = mapping or {}
    lvals = [c for c in left.columns if c not in keys]
    shared = [c for c in lvals if mapping.get(c, c) in right.columns]
    lsel = left.select(*keys, *[F.col(c).alias(c + L) for c in shared])
    rsel = right.select(*keys, *[F.col(mapping.get(c, c)).alias(c + R) for c in shared])
    joined = lsel.join(rsel, keys, "full_outer")
    types_ = {f.name: f.dataType for f in left.schema.fields}
    return joined, [(c, types_[c]) for c in shared]


def compare_metrics(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    mapping: dict[str, str] | None = None,
    percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact_percentiles: bool = False,
) -> DataFrame:
    """One-row DataFrame of per-column consistency metrics between two
    frames keyed identically (e.g. offline backfill vs online log):

    - {col}_both_null / _left_null / _right_null / _mismatch / _total
    - numeric: {col}_smape (mean symmetric error), {col}_diff_p{q} —
      percentiles of left - right (approx by default like the reference's
      KLL sketches; exact for oracle-checked tests)
    - arrays: {col}_mismatch_length, {col}_edit_p50 — median total edit
      distance (insert/delete-only).
    """
    joined, fields = side_by_side(left, right, keys, mapping)
    aggs: list[Column] = []
    for name, dt in fields:
        lc, rc = F.col(name + L), F.col(name + R)
        aggs += [
            F.sum((lc.isNull() & rc.isNull()).cast("long")).alias(f"{name}_both_null"),
            F.sum((lc.isNull() & rc.isNotNull()).cast("long")).alias(f"{name}_left_null"),
            F.sum((lc.isNotNull() & rc.isNull()).cast("long")).alias(f"{name}_right_null"),
            F.count(F.lit(1)).alias(f"{name}_total"),
        ]
        if not isinstance(dt, T.MapType):
            aggs.append(
                F.sum((lc.isNotNull() & rc.isNotNull() & (lc != rc)).cast("long")).alias(
                    f"{name}_mismatch"
                )
            )
        if isinstance(dt, _NUMERIC):
            denom = F.abs(lc) + F.abs(rc)
            smape = F.when(denom != 0.0, (F.abs(lc - rc) * 2).cast("double") / denom).otherwise(
                F.lit(0.0)
            )
            aggs.append(F.avg(smape).alias(f"{name}_smape"))
            diff = lc - rc
            for p in percentiles:
                pc = (
                    F.percentile(diff, F.lit(p))
                    if exact_percentiles
                    else F.percentile_approx(diff, F.lit(p), 10000)
                )
                aggs.append(pc.alias(f"{name}_diff_p{int(p * 100)}"))
        if isinstance(dt, T.ArrayType):
            aggs.append(
                F.sum(
                    (lc.isNotNull() & rc.isNotNull() & (F.size(lc) != F.size(rc))).cast("long")
                ).alias(f"{name}_mismatch_length")
            )
    out = joined.groupBy().agg(*aggs)
    # edit distance needs a projected column (pandas UDF), computed once and
    # aggregated separately, then joined onto the single metrics row
    arr_fields = [n for n, dt in fields if isinstance(dt, T.ArrayType)]
    if arr_fields:
        ed_cols = joined.select(
            *[edit_distance(F.col(n + L), F.col(n + R)).alias(f"__ed_{n}") for n in arr_fields]
        )
        ed_aggs = [
            F.percentile_approx(F.col(f"__ed_{n}")["total"], F.lit(0.5), 10000).alias(
                f"{n}_edit_p50"
            )
            for n in arr_fields
        ]
        out = out.crossJoin(ed_cols.groupBy().agg(*ed_aggs))
    return out


def corpus_token_histogram(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashed-vocabulary token histogram of a corpus: tokens of the dedup
    normal form bucketed by md5 bits (bit-identical in DuckDB — the repo
    oracle pattern), one count per bucket. The hashing bounds output
    cardinality at ``n_buckets`` regardless of corpus vocabulary, so the
    histogram of a 100TB snapshot is a single bounded groupBy."""
    from chronon_spark.operators.dedup import normalize_text

    toks = df.select(
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    return toks.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def corpus_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    quant: int = 10**6,
) -> DataFrame:
    """Distribution drift between two corpus snapshots (crawl versions,
    sources, before/after a filter): hashed-vocab token histograms compared
    bucket-wise — ONE summary row with total variation distance and
    Jensen-Shannon divergence (natural log).

    Exactness contract: TVD needs NO quantization — the per-bucket term
    |cnt_a * tot_b - cnt_b * tot_a| is pure INTEGER arithmetic, summed as
    integers, with ONE final division by (2 * tot_a * tot_b); JSD's log
    terms follow the repo's quantized-ln pattern (each bucket's
    p*ln(p/m) term is rounded to an integer at ``quant`` resolution, so
    the sum is addition-order independent and bit-stable cross-engine;
    resolution error <= n_buckets/quant, documented).

    Plan shape (100TB): each side is one bounded groupBy (<= n_buckets
    rows), the comparison is an outer join of two tiny frames, and the
    totals ride a single-row cross join — nothing large ever shuffles
    twice.
    """
    ha = corpus_token_histogram(df_a, text_col, n_buckets).withColumnRenamed(
        "cnt", "cnt_a"
    )
    hb = corpus_token_histogram(df_b, text_col, n_buckets).withColumnRenamed(
        "cnt", "cnt_b"
    )
    joined = (
        ha.join(hb, "bucket", "full_outer")
        .na.fill({"cnt_a": 0, "cnt_b": 0})
    )
    tot = joined.groupBy().agg(
        F.sum("cnt_a").alias("tot_a"),
        F.sum("cnt_b").alias("tot_b"),
        # active-bucket count: the PSI Laplace-smoothing denominator share
        F.count(F.lit(1)).alias("nb"),
    )
    j = joined.crossJoin(F.broadcast(tot))
    ca, cb = F.col("cnt_a"), F.col("cnt_b")
    ta, tb = F.col("tot_a"), F.col("tot_b")
    tvd_num = F.abs(ca * tb - cb * ta)  # integer, exact
    # JSD (nats): sum_x 0.5*p*ln(p/m) + 0.5*q*ln(q/m), m = (p+q)/2.
    # p/m = 2*ca*tb / (ca*tb + cb*ta) — integer ratio inside the ln. The
    # denominator is 0 only when the OTHER side is an empty corpus (then
    # the whole metric is meaningless — summary nulls it below), so the
    # guard keeps the plan lazily safe under ANSI division semantics.
    denom = ca * tb + cb * ta
    pm = (2.0 * ca * tb) / denom
    qm = (2.0 * cb * ta) / denom
    term_a = F.when(
        (ca > 0) & (denom > 0), F.round(F.lit(quant) * (ca / ta) * F.log(pm))
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        (cb > 0) & (denom > 0), F.round(F.lit(quant) * (cb / tb) * F.log(qm))
    ).otherwise(F.lit(0.0))
    # PSI (population stability index, the classic feature-monitoring drift
    # score): sum (p - q) * ln(p/q) with Laplace-smoothed proportions
    # p = (cnt_a+1)/(tot_a+nb), q = (cnt_b+1)/(tot_b+nb) over the nb ACTIVE
    # buckets (the +1 keeps one-sided buckets finite — the standard PSI
    # zero-bin convention, made deterministic). Same quantized-ln idiom as
    # JSD: each bucket term rounds to an integer at ``quant`` resolution so
    # the sum is order-independent; doubles enter only through identical
    # IEEE expressions on both engines.
    nb = F.col("nb")
    sa, sb = (ca + F.lit(1)).cast("double"), (cb + F.lit(1)).cast("double")
    da, db = ta + nb, tb + nb
    psi_ratio = (sa * db) / (sb * da)
    psi_term = F.round(F.lit(quant) * (sa / da - sb / db) * F.log(psi_ratio))
    per_bucket = j.select(
        "bucket", "cnt_a", "cnt_b", "tot_a", "tot_b",
        # decimal(38,0): the integer sum stays EXACT (and order-independent)
        # even at counts where cnt*tot products overflow a long — DuckDB's
        # bigint sums promote to hugeint, this is the Spark twin
        tvd_num.cast("decimal(38,0)").alias("tvd_num"),
        term_a.cast("long").alias("jsd_qa"),
        term_b.cast("long").alias("jsd_qb"),
        psi_term.cast("long").alias("psi_q"),
    )
    return per_bucket.groupBy("tot_a", "tot_b").agg(
        F.count(F.lit(1)).alias("n_active_buckets"),
        F.sum(
            F.when((F.col("cnt_a") > 0) & (F.col("cnt_b") > 0), 1).otherwise(0)
        ).alias("n_shared_buckets"),
        (
            F.sum("tvd_num").cast("double")
            / (2.0 * F.first("tot_a") * F.first("tot_b"))
        ).alias("tvd"),
        (
            (F.sum("jsd_qa") + F.sum("jsd_qb")) / (2.0 * quant)
        ).alias("jsd"),
        (F.sum("psi_q") / F.lit(float(quant))).alias("psi"),
    ).select(
        F.col("tot_a").cast("long"),
        F.col("tot_b").cast("long"),
        F.col("n_active_buckets").cast("long"),
        F.col("n_shared_buckets").cast("long"),
        # drift against an EMPTY corpus is undefined, not zero
        F.when(
            (F.col("tot_a") > 0) & (F.col("tot_b") > 0), F.round("tvd", 9)
        ).alias("tvd"),
        F.when(
            (F.col("tot_a") > 0) & (F.col("tot_b") > 0), F.round("jsd", 9)
        ).alias("jsd"),
        F.when(
            (F.col("tot_a") > 0) & (F.col("tot_b") > 0), F.round("psi", 9)
        ).alias("psi"),
    )
