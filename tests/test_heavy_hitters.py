"""Misra-Gries mergeable summary: state bound, merge composition, the
canonical error bound, and exactness vs the precise histogram at test scale
(reference APPROX_HISTOGRAM_K hybrid, SimpleAggregators.scala:458-600)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from chronon_spark.functions.heavy_hitters import (
    EST,
    mg_merge,
    mg_summarize,
    mg_topk,
)

CAP = 8


def _data(spark, seed=7, n=4000):
    """Zipf-ish value stream over two groups, chunked into 10 'tiles'."""
    rng = random.Random(seed)
    vals = [f"v{i}" for i in range(40)]
    weights = [1.0 / (i + 1) for i in range(40)]
    rows = [
        (g, rng.randint(0, 9), rng.choices(vals, weights)[0])
        for g in ("a", "b")
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "g string, tile int, v string")


def test_state_bound_and_underestimate(spark):
    df = _data(spark)
    s = mg_summarize(df, ["g"], "v", CAP)
    per_group = s.groupBy("g").count().collect()
    assert all(r["count"] <= CAP for r in per_group)
    exact = {(r["g"], r["v"]): r["n"] for r in
             df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in s.collect():
        assert 0 < r[EST] <= exact[(r["g"], r["v"])]


def test_merge_composition_error_bound(spark):
    """Per-tile summaries merged to the group level: every estimate within
    n/(cap+1) of truth, and every value above that bound is present."""
    df = _data(spark)
    tiles = mg_summarize(df, ["g", "tile"], "v", CAP)
    merged = mg_merge(tiles, ["g"], "v", CAP)
    exact = {(r["g"], r["v"]): r["n"] for r in
             df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_per_group = {r["g"]: r["n"] for r in
                   df.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {(r["g"], r["v"]): r[EST] for r in merged.collect()}
    for (g, v), true in exact.items():
        e = est.get((g, v), 0)
        bound = n_per_group[g] / (CAP + 1)
        assert e <= true, f"overestimate for {(g, v)}"
        assert true - e <= bound, f"error {true - e} > {bound} for {(g, v)}"
        if true > bound:
            assert (g, v) in est, f"guaranteed heavy hitter {(g, v)} missing"


def test_topk_matches_exact_on_separated_data(spark):
    """When the true top-k are separated by more than the error bound, MG
    top-k identification equals the exact histogram's."""
    df = _data(spark)
    k = 3
    tiles = mg_summarize(df, ["g", "tile"], "v", CAP)
    merged = mg_merge(tiles, ["g"], "v", CAP)
    got = {
        (r["g"], r["v"]) for r in mg_topk(merged, ["g"], "v", k).collect()
    }
    from pyspark.sql.window import Window as SW

    exact = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    w = SW.partitionBy("g").orderBy(F.col("n").desc(), F.col("v").desc())
    want = {
        (r["g"], r["v"])
        for r in exact.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).collect()
    }
    assert got == want
