"""Conversation-level transcript quality (sessionize.transcript_quality vs
the single-sourced DuckDB twin driver_contract._sql_transcript_quality):
randomized differential over seeded conversations + targeted rule semantics
+ the one-shuffle plan claim."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.sessionize import (
    TRANSCRIPT_QUALITY_PARAMS,
    transcript_quality,
)


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) if not math.isnan(v) else "NaN"
    return v


def _compare(spark_df, pdf_in, oracle_sql):
    con = duckdb.connect()
    con.register("turns_in", pdf_in)
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


def _random_conversations(rng: random.Random, n_convs: int = 30) -> pd.DataFrame:
    texts = ["hello there", "how can i help", "tell me about spark",
             "the answer is 42", "As an AI I decline to speculate",
             "I can't help with that", "  ", "same same same"]
    rows = []
    for c in range(n_convs):
        n = rng.randrange(1, 12)
        start_role = rng.choice(["user", "assistant"])
        for i in range(n):
            if rng.random() < 0.8:  # mostly alternating
                role = ("user", "assistant")[(i + (start_role == "assistant")) % 2]
            else:
                role = rng.choice(["user", "assistant"])
            text = rng.choice(texts)
            if rng.random() < 0.05:
                text = None  # NULL text behaves as empty
            rows.append((f"conv_{c:03d}", i, role, text))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_transcript_quality_matches_duckdb_random(spark, seed):
    from chronon_spark.driver_contract import _sql_transcript_quality

    pdf = _random_conversations(random.Random(seed))
    sdf = spark.createDataFrame(pdf.astype({"turn_idx": "int64"}))
    out = transcript_quality(sdf)
    _compare(
        out, pdf,
        _sql_transcript_quality("SELECT conv_id, turn_idx, role, text FROM turns_in"),
    )


def test_transcript_quality_rule_semantics(spark):
    p = TRANSCRIPT_QUALITY_PARAMS

    def conv(cid, turns):
        return [(cid, i, r, t) for i, (r, t) in enumerate(turns)]

    good = conv("good", [
        ("user", "hello"), ("assistant", "hi, how can i help"),
        ("user", "explain joins"), ("assistant", "sure: a join matches keys"),
    ])
    solo = conv("solo", [("user", "anyone?")])  # below min_turns, no assistant
    astart = conv("astart", [
        ("assistant", "welcome"), ("user", "thanks"), ("assistant", "sure"),
    ])
    refuser = conv("refuser", [
        ("user", "q1"), ("assistant", "i cannot help with that"),
        ("user", "q2"), ("assistant", "i can't help there either"),
    ])
    loops = conv("loops", [
        ("user", "same  same"), ("assistant", "Same Same"),
        ("user", "same same"), ("assistant", "same   same"),
    ])
    empty = conv("empty", [("user", "hello"), ("assistant", "   ")])

    df = spark.createDataFrame(
        good + solo + astart + refuser + loops + empty,
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {r["conv_id"]: r for r in transcript_quality(df).collect()}

    assert out["good"]["tq_keep"] is True
    assert out["good"]["alternation_frac"] == 1.0
    assert out["solo"]["tq_keep"] is False and out["solo"]["n_assistant_turns"] == 0
    assert out["astart"]["starts_with_user"] is False
    assert out["astart"]["tq_keep"] is False
    assert out["refuser"]["refusal_frac"] == 1.0 and out["refuser"]["tq_keep"] is False
    # all four turns normalize to one distinct string -> dup frac 3/4
    assert out["loops"]["dup_turn_frac"] == 0.75 and out["loops"]["tq_keep"] is False
    assert out["empty"]["n_empty_turns"] == 1 and out["empty"]["tq_keep"] is False


def test_conv_fingerprint_is_content_identity(spark):
    """Identical conversations (up to whitespace/case normalization)
    fingerprint identically across different conv ids; any content or
    order change breaks the match."""
    a = [("a", 0, "user", "Hello  World"), ("a", 1, "assistant", "hi")]
    b = [("b", 0, "user", "hello world"), ("b", 1, "assistant", "HI")]
    c = [("c", 0, "user", "hi"), ("c", 1, "assistant", "hello world")]
    df = spark.createDataFrame(
        a + b + c, "conv_id string, turn_idx int, role string, text string"
    )
    fp = {r["conv_id"]: r["conv_fingerprint"] for r in transcript_quality(df).collect()}
    assert fp["a"] == fp["b"]
    assert fp["a"] != fp["c"]


def test_transcript_quality_one_shuffle(spark):
    """The 100TB claim: lag window and groupBy ride ONE hash-partitioning
    of the conversation key."""
    df = spark.createDataFrame(
        [("a", 0, "user", "x"), ("a", 1, "assistant", "y")],
        "conv_id string, turn_idx int, role string, text string",
    )
    plan = transcript_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# --- turn_degeneration (same transcript-screening family) -------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_degeneration_matches_duckdb_random(spark, seed):
    from chronon_spark.driver_contract import _sql_turn_degeneration
    from chronon_spark.operators.sessionize import turn_degeneration

    rng = random.Random(seed)
    words = ["a", "b", "loop", "the", "x"]
    rows = []
    for c in range(20):
        for t in range(rng.randrange(1, 6)):
            n = rng.randrange(0, 25)
            txt = " ".join(rng.choice(words) for _ in range(n))
            if rng.random() < 0.1:
                txt = None
            rows.append((f"c{c}", t, rng.choice(["user", "assistant"]), txt))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    sdf = spark.createDataFrame(pdf.astype({"turn_idx": "int64"}))
    _compare(
        turn_degeneration(sdf), pdf,
        _sql_turn_degeneration("SELECT conv_id, turn_idx, role, text FROM turns_in"),
    )


def test_degeneration_semantics(spark):
    from chronon_spark.operators.sessionize import turn_degeneration

    df = spark.createDataFrame(
        [
            ("c", 0, "assistant", "a healthy varied reply with many words here"),
            ("c", 1, "assistant", "go go go go go go stop"),  # 6-run
            ("c", 2, "assistant", "spam spam spam ham spam spam spam spam"),  # collapse
            ("c", 3, "assistant", "ok ok ok ok ok"),  # 5-run at min_words
            ("c", 4, "assistant", "no no no"),  # short: never flagged
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {r["turn_idx"]: r for r in turn_degeneration(df).collect()}
    assert out[0]["degenerate"] is False
    assert out[1]["max_word_run"] == 6 and out[1]["degenerate"] is True
    assert out[2]["distinct_word_frac"] == 0.25 and out[2]["degenerate"] is True
    assert out[3]["max_word_run"] == 5 and out[3]["degenerate"] is True
    assert out[4]["max_word_run"] == 3 and out[4]["degenerate"] is False


def test_degeneration_zero_exchanges(spark):
    from chronon_spark.operators.sessionize import turn_degeneration

    df = spark.createDataFrame(
        [("c", 0, "assistant", "x y z")],
        "conv_id string, turn_idx int, role string, text string",
    )
    plan = turn_degeneration(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan
