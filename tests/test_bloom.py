"""Bloom semi-join: no false negatives, bounded false positives, and the
bloom-accelerated branch of semi_join_reduce stays EXACT."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.operators.skew import bloom_filter_reduce, semi_join_reduce


def test_bloom_superset_and_fpp(spark):
    left = spark.range(0, 2000).select(F.col("id").alias("k"))
    right = spark.range(0, 20000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    reduced = bloom_filter_reduce(right, left, ["k"])
    got = {r["k"] for r in reduced.collect()}
    true = set(range(2000))
    assert true <= got  # never drops a real match
    fp = len(got) - len(true)
    # 8 bits/key, 5 hashes -> fpp ~2%; 18000 non-matching candidates
    assert fp < 18000 * 0.1, fp


def test_bloom_multi_key(spark):
    left = spark.range(0, 500).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b"), F.lit(1).alias("v")
    )
    reduced = bloom_filter_reduce(right, left, ["a", "b"])
    got = {(r["a"], r["b"]) for r in reduced.collect()}
    assert {(i, i % 7) for i in range(500)} <= got


def test_semi_join_reduce_bloom_branch_exact(spark):
    """Force the bloom branch with tiny thresholds: result must equal the
    plain LEFT SEMI join exactly (bloom false positives removed by the
    follow-up semi join)."""
    left = spark.range(0, 3000, 3).select(F.col("id").alias("k"))
    right = spark.range(0, 6000).select(F.col("id").alias("k"), (F.col("id") % 10).alias("v"))
    out = semi_join_reduce(right, left, ["k"], cutoff=10, broadcast_threshold=100)
    expect = right.join(left.distinct(), ["k"], "left_semi")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_semi_join_reduce_small_mode_still_inlist(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.where(F.col("user_id") < 5).select("user_id")
    reduced = semi_join_reduce(ev, left, ["user_id"])
    plan = reduced._sc._jvm.PythonSQLUtils.explainString(
        reduced._jdf.queryExecution(), "formatted"
    )
    # small mode = a literal IN filter, never a join (the pushdown itself is
    # asserted in test_plans; here the scan may be cache-substituted)
    assert "Join" not in plan
    assert "user_id" in plan and "IN" in plan or "isin" in plan.lower()


def test_null_safe_join_outer_keeps_right_keys(spark):
    """full/right outer: unmatched right rows keep their key values (the
    keys previously lived only in dropped renamed columns)."""
    from chronon_spark.operators.skew import null_safe_join

    l = spark.createDataFrame([(1, "a"), (None, "n")], "k int, lv string")
    r = spark.createDataFrame([(1, "x"), (5, "y"), (None, "z")], "k int, rv string")
    out = null_safe_join(l, r, ["k"], how="full")
    rows = {(row["k"], row["lv"], row["rv"]) for row in out.collect()}
    assert (5, None, "y") in rows  # unmatched right row keeps k=5
    assert (1, "a", "x") in rows
    assert (None, "n", "z") in rows  # NULL <=> NULL matched
