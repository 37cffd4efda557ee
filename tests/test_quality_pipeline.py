"""Quality filters composed end-to-end: the declarative curation pipeline
chaining C4 cleaning -> Gopher rules -> exact dedup with stage-true lineage,
and c4_clean running unmodified under Structured Streaming (its zero-shuffle
stateless plan is streaming-legal by construction)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.curation import curate_pipeline
from chronon_spark.operators.text_ops import c4_clean, gopher_filter


def _corpus(rng_seed: int = 7) -> pd.DataFrame:
    import random

    rng = random.Random(rng_seed)
    vocab = ["the", "cat", "sat", "on", "mat", "of", "and", "that", "have",
             "with", "river", "stone", "cloud", "light", "paper"]
    rows = []
    for i in range(60):
        lines = []
        for _ in range(rng.randrange(3, 9)):
            words = [rng.choice(vocab) for _ in range(rng.randrange(3, 12))]
            lines.append(" ".join(words) + rng.choice([".", ".", "!", ""]))
        text = "\n".join(lines)
        if i % 9 == 0:
            text += "\nlorem ipsum dolor sit amet."  # C4 page drop
        rows.append((i, text))
    # planted exact duplicates (survive the filters together, dedup to one)
    rows.append((1000, rows[2][1]))
    rows.append((1001, rows[2][1]))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_quality_pipeline_end_to_end(spark):
    """curate_pipeline chains the two filter batteries + exact dedup; each
    stage's survivor set is independently verified against the filters'
    DuckDB twins, and the lineage report counts are the truth of the run."""
    from chronon_spark.driver_contract import _sql_c4, _sql_gopher
    from chronon_spark.operators.dedup import normalize_text

    pdf = _corpus()
    docs = spark.createDataFrame(pdf.astype({"doc_id": "int64"}))

    def c4_stage(df):
        verdicts = c4_clean(df).where("c4_keep").select("doc_id")
        return df.join(verdicts, "doc_id")

    def gopher_stage(df):
        # loosened thresholds: the synthetic corpus is short-doc
        verdicts = (
            gopher_filter(df, thresholds={"min_words": 15, "min_stop_hits": 1})
            .where("gopher_keep")
            .select("doc_id")
        )
        return df.join(verdicts, "doc_id")

    def dedup_stage(df):
        keep = (
            df.groupBy(normalize_text(F.col("text")).alias("nt"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return df.join(keep, "doc_id")

    out, report = curate_pipeline(
        docs,
        [("c4", c4_stage), ("gopher", gopher_stage), ("dedup", dedup_stage)],
    )
    got_ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())

    # independent stagewise expectation via the DuckDB twins
    con = duckdb.connect()
    con.register("stage0", pdf)
    c4_ids = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({_sql_c4('SELECT doc_id, text FROM stage0')}) WHERE c4_keep"
        ).fetchall()
    }
    s1 = pdf[pdf.doc_id.isin(c4_ids)]
    con.register("stage1", s1)
    g_sql = _sql_gopher("SELECT doc_id, text FROM stage1")
    # replay the loosened thresholds in the twin
    g_sql = g_sql.replace("n_words >= 50", "n_words >= 15").replace(
        "stop_hits >= 2", "stop_hits >= 1"
    )
    g_ids = {
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({g_sql}) WHERE gopher_keep"
        ).fetchall()
    }
    s2 = s1[s1.doc_id.isin(g_ids)]
    norm = (
        s2.text.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)
    )
    expect_ids = sorted(s2.groupby(norm).doc_id.min())

    assert report[0]["rows_in"] == len(pdf)
    assert report[0]["rows_out"] == len(s1)
    assert report[1]["rows_out"] == len(s2)
    assert report[2]["rows_out"] == len(expect_ids)
    assert got_ids == expect_ids
    # the planted duplicate trio deduped to its lowest id
    if 2 in expect_ids:
        assert 1000 not in got_ids and 1001 not in got_ids


def test_c4_streaming_matches_batch(spark, tmp_path):
    """c4_clean is a stateless narrow plan (zero shuffles), so the SAME call
    runs under readStream: per-doc verdicts over micro-batches equal the
    batch run exactly."""
    import json

    pdf = _corpus(rng_seed=11)
    src = tmp_path / "src"
    src.mkdir()
    third = len(pdf) // 3
    for i in range(3):
        chunk = pdf.iloc[i * third : None if i == 2 else (i + 1) * third]
        p = os.path.join(str(src), f"part-{i}.json")
        with open(p, "w") as f:
            for _, r in chunk.iterrows():
                f.write(json.dumps({"doc_id": int(r.doc_id), "text": r.text}) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    got = []
    q = (
        c4_clean(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: got.extend(df.toPandas().to_dict("records")))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = [
        r.asDict()
        for r in c4_clean(
            spark.createDataFrame(pdf.astype({"doc_id": "int64"}))
        ).collect()
    ]
    key = lambda d: d["doc_id"]
    assert sorted(got, key=key) == sorted(batch, key=key)
