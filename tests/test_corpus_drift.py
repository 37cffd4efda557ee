"""Corpus distribution drift (drift.corpus_drift vs the single-sourced
DuckDB twin): randomized differential + the analytic boundary properties
(identical corpora -> 0 drift; disjoint vocabularies -> TVD 1, JSD ln 2)."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.drift import corpus_drift


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_corpus_drift_matches_duckdb_random(spark, seed):
    from chronon_spark.driver_contract import _sql_corpus_drift

    rng = random.Random(seed)
    vocab_a = [f"tok{i}" for i in range(60)]
    vocab_b = vocab_a[20:] + [f"new{i}" for i in range(25)]  # partial overlap

    def corpus(vocab, n):
        return pd.DataFrame(
            [
                (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 30))))
                for i in range(n)
            ],
            columns=["doc_id", "text"],
        )

    pa, pb = corpus(vocab_a, 25), corpus(vocab_b, 30)
    da = spark.createDataFrame(pa.astype({"doc_id": "int64"}))
    db = spark.createDataFrame(pb.astype({"doc_id": "int64"}))
    out = corpus_drift(da, db)

    con = duckdb.connect()
    con.register("ca", pa)
    con.register("cb", pb)
    res = con.execute(
        _sql_corpus_drift("SELECT text FROM ca", "SELECT text FROM cb")
    )
    duck_cols = [d[0] for d in res.description]
    (drow,) = res.fetchall()
    (srow,) = out.collect()
    duck = dict(zip(duck_cols, drow))
    got = srow.asDict()
    assert set(got) == set(duck)
    for k in got:
        assert _norm(got[k]) == _norm(duck[k]), (k, got[k], duck[k])


def test_corpus_drift_boundaries(spark):
    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    r0 = corpus_drift(same, same).collect()[0]
    assert r0["tvd"] == 0.0 and r0["jsd"] == 0.0
    # identical corpora: p == q in every bucket, every PSI term is ln(1)*0
    assert r0["psi"] == 0.0
    assert r0["n_shared_buckets"] == r0["n_active_buckets"]

    a = spark.createDataFrame([(1, "aaa bbb ccc")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "xxx yyy zzz")], "doc_id long, text string")
    r1 = corpus_drift(a, b).collect()[0]
    assert r1["tvd"] == 1.0
    # disjoint supports: JSD = ln 2 up to quantization resolution
    assert abs(r1["jsd"] - math.log(2)) < 1e-5
    assert r1["n_shared_buckets"] == 0
    # PSI on fully drifted corpora clears the conventional 0.25 "major
    # shift" bar (finite because smoothed); and PSI is symmetric — (p-q)
    # and ln(p/q) flip sign together
    assert r1["psi"] > 0.25
    r1r = corpus_drift(b, a).collect()[0]
    assert r1r["psi"] == r1["psi"]


def test_corpus_drift_bounded_output(spark):
    """The summary is one row and the bucket count never exceeds the
    hashed-vocabulary bound regardless of corpus vocabulary size."""
    big = spark.createDataFrame(
        [(i, " ".join(f"u{i}w{j}" for j in range(40))) for i in range(200)],
        "doc_id long, text string",
    )
    rows = corpus_drift(big, big, n_buckets=64).collect()
    assert len(rows) == 1
    assert rows[0]["n_active_buckets"] <= 64


def test_corpus_drift_empty_side_is_null_not_zero(spark):
    """Drift against an empty corpus is undefined — metrics come back NULL
    (never a misleading 0), and the plan stays lazily safe under ANSI
    division semantics."""
    a = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id long, text string")
    empty = spark.createDataFrame([], "doc_id long, text string")
    r = corpus_drift(a, empty).collect()[0]
    assert r["tot_b"] == 0
    assert r["tvd"] is None and r["jsd"] is None and r["psi"] is None
