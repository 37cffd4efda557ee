"""C4 cleaning pipeline (text_ops.c4_clean vs the single-sourced DuckDB twin
driver_contract._sql_c4): randomized differential over seeded multi-line
corpora + targeted rule semantics (Raffel et al. 2020 §2.2)."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.text_ops import C4_PARAMS, c4_clean


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


def _random_doc(rng: random.Random) -> str:
    vocab = ["the", "cat", "sat", "on", "mat", "quick", "brown", "fox",
             "jumps", "over", "lazy", "dog", "data", "line"]
    lines = []
    for _ in range(rng.randrange(0, 10)):
        words = [rng.choice(vocab) for _ in range(rng.randrange(1, 9))]
        line = " ".join(words)
        r = rng.random()
        if r < 0.5:
            line += rng.choice([".", "!", "?", '"'])
        elif r < 0.6:
            line += "..."
        if rng.random() < 0.12:
            line = "Enable JavaScript " + line + "."
        if rng.random() < 0.1:
            line = "we use cookies here " + line + "."
        if rng.random() < 0.08:
            line = "   " + line + "  "  # whitespace padding survives trim
        lines.append(line)
    doc = "\n".join(lines)
    if rng.random() < 0.15:
        doc += "\nLorem Ipsum dolor."
    if rng.random() < 0.12:
        doc += "\nvar x = { a: 1 }."
    if rng.random() < 0.1:
        doc += "\nthis has badword inside."
    return doc


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_c4_matches_duckdb_random(spark, seed):
    from chronon_spark.driver_contract import _sql_c4

    rng = random.Random(seed)
    rows = [(i, _random_doc(rng)) for i in range(40)]
    rows.append((9000, ""))  # degenerate: empty doc
    rows.append((9001, "\n\n\n"))  # only empty lines
    rows.append((9002, "one good sentence here. " * 3))  # single line, no \n
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    out = c4_clean(sdf)
    _compare(out, pdf, _sql_c4("SELECT doc_id, text FROM docs_in"))


def test_c4_rule_semantics(spark):
    """Each rule drops exactly what the paper says it drops."""
    good_line = "the quick brown fox jumps over the lazy dog."
    doc_good = "\n".join([good_line] * 6)  # 6 sentences, all lines keepable
    df = spark.createDataFrame(
        [
            (1, doc_good),
            (2, doc_good + "\nno terminal punctuation here"),
            (3, doc_good + "\ntrailing off..."),
            (4, doc_good + "\ntoo short."),
            (5, doc_good + "\nplease enable javascript to continue."),
            (6, doc_good + "\nsee our privacy policy for details."),
            (7, doc_good + "\nLorem ipsum dolor sit amet."),
            (8, doc_good + "\nconfig = { nested }."),
            (9, doc_good + "\nthis line has badword inside."),
            (10, "only two sentences. here they are."),  # < min_sentences
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in c4_clean(df).collect()}

    assert out[1]["c4_keep"] is True
    assert out[1]["cleaned_text"] == doc_good
    assert out[1]["n_kept_lines"] == 6

    # line-level rules remove the offending line but keep the page
    assert out[2]["n_unterminated_lines"] == 1
    assert out[2]["n_kept_lines"] == 6 and out[2]["c4_keep"] is True
    assert out[3]["n_ellipsis_lines"] == 1 and out[3]["n_kept_lines"] == 6
    assert out[4]["n_short_lines"] == 1 and out[4]["n_kept_lines"] == 6
    assert out[5]["n_js_lines"] == 1 and out[5]["n_kept_lines"] == 6
    assert out[6]["n_policy_lines"] == 1 and out[6]["n_kept_lines"] == 6

    # page-level rules drop the whole doc regardless of surviving lines
    assert out[7]["has_lorem"] is True and out[7]["c4_keep"] is False
    assert out[8]["has_brace"] is True and out[8]["c4_keep"] is False
    assert out[9]["has_badword"] is True and out[9]["c4_keep"] is False
    assert out[10]["n_sentences"] < C4_PARAMS["min_sentences"]
    assert out[10]["c4_keep"] is False


def test_c4_reconstruction_order(spark):
    """Kept lines rejoin in original order with dropped lines excised."""
    doc = "first good line stays.\nbad one\nsecond good line stays.\nalso bad\nthird good line stays."
    df = spark.createDataFrame([(1, doc)], "doc_id int, text string")
    r = c4_clean(df).collect()[0]
    assert r["cleaned_text"] == (
        "first good line stays.\nsecond good line stays.\nthird good line stays."
    )
    assert r["n_lines"] == 5 and r["n_kept_lines"] == 3
    assert r["kept_line_frac"] == 0.6
