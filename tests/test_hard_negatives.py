"""Hard-negative triplet mining (similarity.hard_negatives) — the
DPR/SimCSE contrastive data-prep step: planted near-dup twins become
positives, the most-similar below-threshold vectors become negatives."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from chronon_spark.operators.similarity import hard_negatives


def _vectors(spark, n=40, dim=8, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    # plant twins for every 10th id under id+1000 (exact duplicates)
    rows += [(i + 1000, v) for i, v in rows if i % 10 == 0]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return round(d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6)


def test_planted_twin_is_positive_and_negatives_ranked(spark):
    rows, df = _vectors(spark)
    out = hard_negatives(df, anchors=df.where(F.col("vec_id") < 40), k_neg=3, pos_eps=0.99)
    by_anchor = {}
    for r in out.collect():
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    vecs = dict(rows)
    for aid, rs in by_anchor.items():
        pos = [r for r in rs if r["kind"] == "positive"]
        negs = sorted((r for r in rs if r["kind"] == "negative"), key=lambda r: r["rank"])
        if aid % 10 == 0:
            # twin planted: it IS the positive (identical vector, sim 1.0)
            assert len(pos) == 1 and pos[0]["neighbor_id"] == aid + 1000
            assert pos[0]["sim"] == 1.0
        else:
            assert pos == []  # natural max cosine of random vectors < 0.99
        assert 1 <= len(negs) <= 3
        # negatives are the true top-k below threshold, descending
        sims = [
            (_cos(vecs[aid], v), -i)
            for i, v in vecs.items()
            if i != aid and _cos(vecs[aid], v) < 0.99
        ]
        want = sorted(sims, reverse=True)[: len(negs)]
        got = [(r["sim"], -r["neighbor_id"]) for r in negs]
        assert got == want


def test_candidate_pairs_scale_path(spark):
    """With a candidate frame, only candidates are scored — restricting
    candidates to the brute-force output reproduces it exactly."""
    _rows, df = _vectors(spark)
    anchors = df.where(F.col("vec_id") < 20)
    brute = hard_negatives(df, anchors=anchors, k_neg=2, pos_eps=0.99)
    cands = brute.select(F.col("anchor_id").alias("query_id"), "neighbor_id")
    via_cands = hard_negatives(
        df, anchors=anchors, k_neg=2, pos_eps=0.99, candidate_pairs=cands
    )
    key = lambda r: (r["anchor_id"], r["kind"], r["rank"])
    assert sorted(map(tuple, via_cands.collect()), key=repr) == sorted(
        map(tuple, brute.collect()), key=repr
    )
