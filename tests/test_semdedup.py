"""SemDeDup (similarity.semdedup): deterministic integer-quantized k-means +
within-cluster cosine-eps drop — DuckDB full-fit oracle differential,
partitioning invariance, keep-the-outlier rule semantics, degenerate shapes."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.similarity import semdedup


def _vectors(seed: int, n: int = 60, dim: int = 8) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, base))
        # plant a near-identical copy for every 10th vector
        if i % 10 == 0:
            rows.append((i + 5000, [x + rng.uniform(-1e-4, 1e-4) for x in base]))
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def _oracle(pdf: pd.DataFrame, eps: float, k: int, iters: int) -> pd.DataFrame:
    from chronon_spark.driver_contract import _sql_semdedup

    con = duckdb.connect()
    con.register("vecs_in", pdf)
    sql = _sql_semdedup(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM vecs_in",
        eps=eps, n_clusters=k, n_iters=iters,
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_semdedup_matches_duckdb_random(spark, seed):
    pdf = _vectors(seed)
    sdf = spark.createDataFrame(
        pdf.astype({"vec_id": "int64"}), "vec_id long, embedding array<double>"
    )
    out = semdedup(sdf, eps=0.95, n_clusters=4, n_iters=2).toPandas()
    duck = _oracle(pdf, eps=0.95, k=4, iters=2)
    cols = sorted(out.columns)
    assert cols == sorted(duck.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = duck[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_semdedup_drops_planted_keeps_outlier(spark):
    """Planted near-identical pairs lose exactly one member, and the
    dropped one is the member CLOSER to its centroid (ties -> larger id)."""
    pdf = _vectors(5)
    sdf = spark.createDataFrame(
        pdf.astype({"vec_id": "int64"}), "vec_id long, embedding array<double>"
    )
    out = (
        semdedup(sdf, eps=0.999, n_clusters=4, n_iters=2)
        .toPandas()
        .set_index("vec_id")
    )
    for i in range(0, 60, 10):
        pair = out.loc[[i, i + 5000]]
        assert pair["is_kept"].sum() == 1, (i, pair)
        kept = pair[pair["is_kept"]].iloc[0]
        dropped = pair[~pair["is_kept"]].iloc[0]
        # the kept member is farther from (less similar to) its centroid,
        # or tied with the smaller id winning
        assert (kept["centroid_sim"], kept.name) <= (
            dropped["centroid_sim"],
            dropped.name,
        ), (i, pair)


def test_semdedup_partitioning_invariant(spark):
    """Integer-exact fit + verdicts: identical output under different
    input partitionings."""
    pdf = _vectors(9)
    outs = []
    for parts in (1, 7):
        sdf = spark.createDataFrame(
            pdf.astype({"vec_id": "int64"}), "vec_id long, embedding array<double>"
        ).repartition(parts)
        outs.append(
            semdedup(sdf, eps=0.95, n_clusters=4, n_iters=2)
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_semdedup_fewer_points_than_clusters(spark):
    """k > N: empty clusters carry their seed centroid forward; every
    point still gets exactly one verdict row."""
    pdf = _vectors(2).head(3)
    sdf = spark.createDataFrame(
        pdf.astype({"vec_id": "int64"}), "vec_id long, embedding array<double>"
    )
    out = semdedup(sdf, eps=0.95, n_clusters=8, n_iters=2).toPandas()
    assert len(out) == 3
    assert out["is_kept"].all()  # distinct random vectors: nothing to drop
    duck = _oracle(pdf, eps=0.95, k=8, iters=2)
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = duck[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
