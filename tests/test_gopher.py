"""Gopher quality-rule battery (text_ops.gopher_filter vs the single-sourced
DuckDB twin driver_contract._sql_gopher): randomized differential over seeded
synthetic corpora + targeted rule-semantics cases (Rae et al. 2021 §A1.1)."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.text_ops import GOPHER_THRESHOLDS, gopher_filter


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) if not math.isnan(v) else "NaN"
    return v


def _compare(spark_df, pdf_in, oracle_sql):
    con = duckdb.connect()
    con.register("docs_in", pdf_in)
    res = con.execute(oracle_sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    s_idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_idx = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s = sorted([tuple(_norm(r[i]) for i in s_idx) for r in spark_rows], key=repr)
    d = sorted([tuple(_norm(r[i]) for i in d_idx) for r in duck_rows], key=repr)
    mism = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mism, f"{len(mism)} differing rows; first: {mism[0]}"


def _random_text(rng: random.Random) -> str:
    vocab = ["the", "cat", "sat", "on", "mat", "of", "and", "zebra", "quark",
             "be", "to", "that", "have", "with", "x", "#tag", "longishword"]
    parts = []
    for _ in range(rng.randrange(0, 8)):
        n = rng.randrange(1, 15)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.2:
            words.insert(0, rng.choice(["-", "*"]))
        sent = " ".join(words)
        if rng.random() < 0.15:
            sent += "..."
        parts.append(sent)
        # planted repetition: sometimes repeat the sentence verbatim
        if rng.random() < 0.3:
            parts.append(sent)
    return ". ".join(parts)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("strategy,gram_group", [("local", "raw"), ("shuffle", "md5")])
def test_gopher_matches_duckdb_random(spark, seed, strategy, gram_group):
    from chronon_spark.driver_contract import _sql_gopher

    rng = random.Random(seed)
    rows = [(i, _random_text(rng)) for i in range(40)]
    rows.append((9000, ""))  # degenerate: empty doc
    rows.append((9001, "word"))  # one word, no grams
    rows.append((9002, "word " * 80))  # pure repetition
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    out = gopher_filter(sdf, strategy=strategy)
    _compare(out, pdf, _sql_gopher("SELECT doc_id, text FROM docs_in", gram_group))


@pytest.mark.parametrize("seed", [0, 1])
def test_gopher_local_equals_shuffle(spark, seed):
    """The two physical strategies (zero-shuffle mapInPandas counts vs the
    all-native explode/groupBy plan) produce row-identical batteries —
    including on whitespace-edge and repetition-planted docs."""
    rng = random.Random(100 + seed)
    rows = [(i, _random_text(rng)) for i in range(30)]
    rows.append((9100, "  \t mixed   WHITESPACE runs \t "))
    rows.append((9101, "- bullet line. - bullet line. * star... the end"))
    rows.append((9102, ("five gram phrase repeats here " * 12) + "tail words"))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype({"doc_id": "int64"})
    )
    a = {r["doc_id"]: tuple(r) for r in gopher_filter(sdf, strategy="local").collect()}
    b = {r["doc_id"]: tuple(r) for r in gopher_filter(sdf, strategy="shuffle").collect()}
    assert a == b


def test_gopher_rule_semantics(spark):
    """Targeted verdicts: a clean passing doc keeps; specific violations
    flip specific metrics past their thresholds."""
    th = GOPHER_THRESHOLDS
    # 60 distinct-ish words, stopwords present, mean word length in range
    good_words = []
    fillers = ["apple", "river", "stone", "cloud", "light", "paper", "sound",
               "grass", "field", "mount", "plain", "track"]
    for i in range(60):
        good_words.append(fillers[i % len(fillers)] + str(i))
    good = "the quick brown fox jumps with vigor and grace. " + " ".join(good_words)
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "short text"),  # word-count fail
            (3, good + " ##### ##### ##### ##### ##### ##### ##### #####"),  # symbols
            (4, ("repeat me now five times. " * 10) + good),  # dup lines
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in gopher_filter(df).collect()}
    assert out[1]["gopher_keep"] is True, dict(out[1].asDict())
    assert out[2]["gopher_keep"] is False
    assert out[2]["n_words"] < th["min_words"]
    assert out[3]["symbol_word_ratio"] > th["max_symbol_word_ratio"]
    assert out[3]["gopher_keep"] is False
    assert out[4]["dup_line_frac"] > th["max_dup_line_frac"]
    assert out[4]["gopher_keep"] is False


def test_gopher_coverage_bounded(spark):
    """dup-n-gram coverage fractions are true fractions (<= 1) even on
    degenerate fully-repetitive documents."""
    df = spark.createDataFrame(
        [(1, "word " * 100), (2, ("the same phrase again and " * 20))],
        "doc_id int, text string",
    )
    for r in gopher_filter(df).collect():
        for n in range(5, 11):
            v = r[f"dup{n}gram_frac"]
            assert 0.0 <= v <= 1.0, (r["doc_id"], n, v)
