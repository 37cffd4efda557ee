"""Token-budgeted document chunking (curation.chunk_documents): randomized
differential vs the DuckDB twin, reconstruction invariants, and the
zero-shuffle plan claim."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from chronon_spark.operators.curation import chunk_documents


@pytest.mark.parametrize("seed,budget,overlap", [(0, 16, 4), (1, 8, 0), (2, 10, 5)])
def test_chunks_match_duckdb_random(spark, seed, budget, overlap):
    from chronon_spark.driver_contract import _sql_doc_chunks

    rng = random.Random(seed)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(0, 60))))
        for i in range(30)
    ]
    rows.append((900, ""))
    rows.append((901, None))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
    got = sorted(
        tuple(r) for r in chunk_documents(sdf, budget=budget, overlap=overlap).collect()
    )
    con = duckdb.connect()
    con.register("docs_in", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            _sql_doc_chunks("SELECT doc_id, text FROM docs_in", budget, overlap)
        ).fetchall()
    )
    assert got == want


def test_chunks_reconstruct_and_cover(spark):
    """With zero overlap, chunk texts concatenate back to the normalized
    document; with overlap, consecutive chunks share exactly `overlap`
    tokens until the tail."""
    text = " ".join(f"t{i}" for i in range(25))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    no_ov = sorted(
        chunk_documents(df, budget=10, overlap=0).collect(),
        key=lambda r: r["chunk_idx"],
    )
    assert " ".join(c["chunk_text"] for c in no_ov) == text
    assert [c["chunk_tokens"] for c in no_ov] == [10, 10, 5]
    assert [c["start_token"] for c in no_ov] == [0, 10, 20]

    ov = sorted(
        chunk_documents(df, budget=10, overlap=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    for a, b in zip(ov, ov[1:]):
        a_toks = a["chunk_text"].split(" ")
        b_toks = b["chunk_text"].split(" ")
        assert a_toks[-4:] == b_toks[:4]  # the shared overlap window
    # every token index covered exactly once modulo overlaps
    covered = set()
    for c in ov:
        covered |= set(range(c["start_token"], c["start_token"] + c["chunk_tokens"]))
    assert covered == set(range(25))


def test_chunks_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "single")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in chunk_documents(df).collect()}
    assert rows[(1, 0)]["chunk_tokens"] == 0 and rows[(1, 0)]["chunk_text"] == ""
    assert rows[(2, 0)]["chunk_tokens"] == 0
    assert rows[(3, 0)]["chunk_tokens"] == 1 and rows[(3, 0)]["chunk_text"] == "single"
    assert len(rows) == 3  # exactly one chunk each — no doc disappears


def test_chunks_invalid_overlap_raises(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, budget=8, overlap=8)


def test_chunks_zero_exchanges(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- shuffle_corpus (same file: the two corpus-layout preparation ops) ------


def test_shuffle_corpus_is_deterministic_permutation(spark):
    from chronon_spark.operators.curation import shuffle_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_corpus(docs, "s1").collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_corpus(docs, "s1").collect()}
    c = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_corpus(docs, "s2").collect()}
    assert a == b  # reproducible
    assert sorted(a.values()) == list(range(200))  # exact permutation
    assert a != c  # epoch reshuffle: a different seed moves rows
    # hash order is not id order (vanishingly unlikely for 200 rows)
    assert [a[i] for i in range(200)] != list(range(200))


def test_shuffle_corpus_no_single_partition_window(spark):
    """The scale claim: the permutation is computed with a window
    PARTITIONED BY the hash bucket — never a global-order window (which
    Spark executes on one partition)."""
    from chronon_spark.operators.curation import shuffle_corpus

    docs = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id long, text string"
    )
    plan = shuffle_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
