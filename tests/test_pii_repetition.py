"""PII scrubbing + Gopher-style repetition signals: planted fixtures and a
naive Python oracle (Rae et al. 2021 §A1.1 semantics)."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.text_ops import (
    PII_PATTERNS,
    pii_counts,
    repetition_stats,
    scrub_pii,
)


def test_scrub_and_counts_on_planted_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.org or call +14155550123 now"),
            (2, "server at 10.0.255.7 and 192.168.1.1; version v1.2 stays"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    c = F.col("text")
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            *[e.alias(n) for n, e in pii_counts(c).items()],
            scrub_pii(c).alias("scrubbed"),
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 0)
    assert out[1]["scrubbed"] == "mail me at <EMAIL> or call <PHONE> now"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert out[2]["scrubbed"] == "server at <IPV4> and <IPV4>; version v1.2 stays"
    assert out[3]["scrubbed"] == "nothing sensitive here"
    assert all(v == 0 for k, v in out[3].items() if k.startswith("n_"))


def _py_repetition(text: str):
    lines = [s.strip() for s in text.split(".") if s.strip()]
    n_lines = len(lines)
    counts: dict[str, int] = {}
    for s in lines:
        counts[s] = counts.get(s, 0) + 1
    # excess-occurrence counting: a line seen c times contributes c-1
    # duplicates (the published Gopher semantics)
    dup_chars = sum((c - 1) * len(s) for s, c in counts.items() if c >= 2)
    line_chars = sum(c * len(s) for s, c in counts.items())
    norm = " ".join(text.lower().split())
    ws = norm.split(" ") if norm else []
    gcounts: dict[str, int] = {}
    for i in range(len(ws) - 1):
        g = " ".join(ws[i : i + 2])
        gcounts[g] = gcounts.get(g, 0) + 1
    top = max((c * len(g) for g, c in gcounts.items()), default=None)
    n_chars = len(text)
    return (
        n_lines,
        round((n_lines - len(counts)) / n_lines, 6) if n_lines else 0.0,
        round(dup_chars / line_chars, 6) if line_chars else 0.0,
        round(top / n_chars, 6) if (top is not None and n_chars) else 0.0,
    )


def test_repetition_planted_duplicates(spark):
    boiler = "all work and no play makes jack a dull boy"
    df = spark.createDataFrame(
        [
            (1, f"{boiler}. {boiler}. {boiler}. something else entirely"),
            (2, "unique one. unique two. unique three"),
            (3, "spam spam spam spam spam spam"),
            (4, ""),
            (5, "word"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_lines"], r["dup_line_frac"], r["dup_line_char_frac"],
            r["top2gram_char_frac"],
        )
        for r in repetition_stats(df).collect()
    }
    rows = {i: t for i, t in df.collect()}
    for i, text in rows.items():
        assert got[i] == _py_repetition(text), (i, got[i], _py_repetition(text))
    # sanity on direction: the boilerplate doc is much more repetitive
    assert got[1][1] == 0.5 and got[2][1] == 0.0  # (4-2)/4 dup lines vs none
    assert got[3][3] > 0.5  # "spam spam" dominates the characters
    assert got[4] == (0, 0.0, 0.0, 0.0)


@pytest.mark.parametrize("seed", [0, 1])
def test_repetition_random_differential(spark, seed):
    rng = random.Random(seed)
    words = ["aa", "bb", "cc", "dd"]
    rows = [
        (
            i,
            ". ".join(
                " ".join(rng.choice(words) for _ in range(rng.randint(0, 6)))
                for _ in range(rng.randint(0, 5))
            ),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["dup_line_frac"], r["dup_line_char_frac"],
            r["top2gram_char_frac"],
        )
        for r in repetition_stats(df).collect()
    }
    for i, text in rows:
        assert got[i] == _py_repetition(text), (i, text)


def test_pii_patterns_are_re2_safe():
    """The DuckDB oracle runs these under RE2: no backrefs/lookaround, and
    each compiles in Python's re as a sanity proxy."""
    for pat in PII_PATTERNS.values():
        assert "(?=" not in pat and "(?<" not in pat and "\\1" not in pat
        re.compile(pat)
