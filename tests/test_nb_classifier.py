"""Supervised hashed-ngram NB classifier (curation.nb_classifier_train/score):
deterministic training contract, DuckDB oracle differential, label-recovery
sanity, and partitioning-invariance (integer scores are order-independent)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.curation import (
    nb_classifier_score,
    nb_classifier_train,
)

VOCABS = {
    "tech": ["kernel", "tensor", "shard", "compile", "vector", "cache", "the", "a"],
    "food": ["butter", "simmer", "roast", "flour", "saute", "glaze", "the", "a"],
    "law": ["statute", "motion", "appeal", "clause", "tort", "brief", "the", "a"],
}


def _doc(rng: random.Random, label: str) -> str:
    vocab = VOCABS[label]
    # mostly in-domain words with some shared noise
    return " ".join(
        rng.choice(vocab) if rng.random() < 0.8 else rng.choice(["on", "of", "is"])
        for _ in range(rng.randrange(5, 40))
    )


def _corpus(seed: int, n: int = 90) -> pd.DataFrame:
    rng = random.Random(seed)
    labels = sorted(VOCABS)
    rows = [
        (i, _doc(rng, labels[i % len(labels)]), labels[i % len(labels)])
        for i in range(n)
    ]
    rows.append((9000, "", labels[0]))  # empty doc: prior-only score
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang"])


def _sql_for(buckets: int) -> str:
    from chronon_spark.driver_contract import SQL_NB_CLASSIFIER

    assert buckets == 2048  # the oracle literal is built at 2048
    return SQL_NB_CLASSIFIER.replace("FROM documents", "FROM docs_in")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nb_matches_duckdb_random(spark, seed):
    pdf = _corpus(seed)
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    w, s = nb_classifier_train(sdf, label_col="lang", buckets=2048)
    out = nb_classifier_score(sdf, w, s, buckets=2048).toPandas()
    con = duckdb.connect()
    con.register("docs_in", pdf)
    duck = con.execute(_sql_for(2048)).fetchdf()
    cols = sorted(out.columns)
    assert cols == sorted(duck.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = duck[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_nb_recovers_generating_label(spark):
    """Self-scoring a separable synthetic corpus recovers the generating
    label for (nearly) every non-degenerate document."""
    pdf = _corpus(7, n=120)
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    w, s = nb_classifier_train(sdf, label_col="lang")
    out = nb_classifier_score(sdf, w, s).toPandas().set_index("doc_id")
    truth = pdf.set_index("doc_id")["lang"]
    nondeg = out[out["n_feats"] > 0]
    acc = (nondeg["predicted_label"] == truth.loc[nondeg.index]).mean()
    assert acc >= 0.95, acc
    # margins are positive wherever a runner-up label exists
    assert (nondeg["margin_q"] >= 0).all()


def test_nb_empty_doc_scores_by_prior(spark):
    """A doc with no features scores prior-only: predicted label is the
    max-prior (most frequent) label, n_feats == 0."""
    pdf = _corpus(3)
    # make 'food' the clear majority label so the prior argmax is unique
    extra = pd.DataFrame(
        [(8000 + i, "butter simmer roast", "food") for i in range(30)],
        columns=["doc_id", "text", "lang"],
    )
    pdf = pd.concat([pdf, extra], ignore_index=True)
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    w, s = nb_classifier_train(sdf, label_col="lang")
    out = nb_classifier_score(sdf, w, s).toPandas().set_index("doc_id")
    assert out.loc[9000, "n_feats"] == 0
    assert out.loc[9000, "predicted_label"] == "food"


def test_nb_partitioning_invariant(spark):
    """Integer-exact training/scoring: the model and every score are
    identical under a different input partitioning (the property float-SGD
    training cannot offer)."""
    pdf = _corpus(11)
    sdf1 = spark.createDataFrame(pdf.astype({"doc_id": "int64"})).coalesce(1)
    sdf2 = spark.createDataFrame(pdf.astype({"doc_id": "int64"})).repartition(13)
    outs = []
    for sdf in (sdf1, sdf2):
        w, s = nb_classifier_train(sdf, label_col="lang")
        outs.append(
            nb_classifier_score(sdf, w, s)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_classifier_select_stage(spark):
    """The curate-pipeline stage keeps exactly the docs the standalone
    classifier predicts into keep_labels with sufficient margin."""
    from chronon_spark.operators.curation import build_stages, curate_pipeline

    pdf = _corpus(17)
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    stages = build_stages(
        [("classifier_select", {"label_col": "lang", "keep_labels": ["tech"]})]
    )
    out, report = curate_pipeline(sdf, stages)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    w, s = nb_classifier_train(sdf, label_col="lang")
    expect = {
        r["doc_id"]
        for r in nb_classifier_score(sdf, w, s)
        .where("predicted_label = 'tech' and margin_q >= 0")
        .collect()
    }
    assert kept == expect
    assert report[0]["rows_in"] == len(pdf)
    assert report[0]["rows_out"] == len(kept)
    # unknown-param fail-fast
    with pytest.raises(ValueError):
        build_stages([("classifier_select", {"keep_labels": ["x"], "bogus": 1})])
    with pytest.raises(ValueError):
        build_stages([("classifier_select", {})])


def test_nb_single_label_margin_zero(spark):
    """With one label in the corpus there is no runner-up: margin_q == 0
    for every document."""
    pdf = _corpus(5)
    pdf["lang"] = "tech"
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    w, s = nb_classifier_train(sdf, label_col="lang")
    out = nb_classifier_score(sdf, w, s).toPandas()
    assert (out["margin_q"] == 0).all()
    assert (out["predicted_label"] == "tech").all()
