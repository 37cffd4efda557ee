"""Drift/consistency metrics: edit distance semantics + compare_metrics
counters against hand-computed values."""

from __future__ import annotations

from pyspark.sql import functions as F

from chronon_spark.operators.drift import compare_metrics, edit_distance


def test_edit_distance_cases(spark):
    rows = [
        (["a", "b", "c"], ["a", "b", "c"], 0, 0),  # identical
        (["a", "b", "c"], ["a", "c"], 1, 0),  # insert 'b' into right
        (["a", "c"], ["a", "b", "c"], 0, 1),  # delete 'b' from right
        (["a", "b"], ["c", "d"], 2, 2),  # disjoint
        ([], ["x", "y"], 0, 2),  # left empty
        (["x", "y"], [], 2, 0),  # right empty
        (None, ["x"], 0, 1),  # null = empty (reference early-exit)
        (["a", "x", "b", "y"], ["x", "q", "y"], 2, 1),  # LCS = [x, y]
    ]
    df = spark.createDataFrame(
        [(i, a, b, ins, d) for i, (a, b, ins, d) in enumerate(rows)],
        "i int, a array<string>, b array<string>, exp_ins int, exp_del int",
    )
    got = df.select("i", "exp_ins", "exp_del", edit_distance(F.col("a"), F.col("b")).alias("ed"))
    for r in got.collect():
        assert r["ed"]["insert"] == r["exp_ins"], r
        assert r["ed"]["delete"] == r["exp_del"], r
        assert r["ed"]["total"] == r["exp_ins"] + r["exp_del"]


def test_compare_metrics_counters_and_percentiles(spark):
    left = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0), (5, None)], "k int, v double"
    )
    right = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (3, 30.0), (4, None), (5, None)], "k int, v double"
    )
    row = compare_metrics(left, right, ["k"], exact_percentiles=True).first()
    assert row["v_total"] == 5
    assert row["v_both_null"] == 1
    assert row["v_left_null"] == 1
    assert row["v_right_null"] == 1
    assert row["v_mismatch"] == 1  # only (20, 25)
    # smape: (10,10)->0; (20,25)->2*5/45; null operands -> 0.0 via the
    # reference's otherwise(0.0), so the mean is over ALL 5 rows
    assert abs(row["v_smape"] - (2 * 5 / 45) / 5) < 1e-9
    assert row["v_diff_p50"] == -2.5  # diffs: [0, -5] -> median -2.5


def test_compare_metrics_array_column(spark):
    left = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["x"])], "k int, s array<string>"
    )
    right = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["x", "y", "z"])], "k int, s array<string>"
    )
    row = compare_metrics(left, right, ["k"]).first()
    assert row["s_mismatch_length"] == 1
    # distances [0, 2]: approx-percentile returns an actual element at the
    # target rank, either is a valid median here
    assert row["s_edit_p50"] in (0, 2)
