"""The `curate` CLI subcommand: declarative corpus curation as a platform
job — conf-driven stage specs over CURATION_STAGES, snapshot-table landing,
and the per-stage lineage report (CLI JSON + sidecar)."""

from __future__ import annotations

import json
import os

import pytest

from chronon_spark.__main__ import main


def _run(spark, argv, capsys):
    rc = main(argv, spark=spark)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def _doc(i: int) -> str:
    # every line is unique to (doc, line): no cross-doc shingle overlap, no
    # within-doc gram repetition — filters fire only where planted
    lines = [
        "the " + " ".join(f"w{i}x{j}t{t}" for t in range(7)) + "."
        for j in range(7)
    ]
    body = "\n".join(lines)
    if i % 6 == 0:
        body += "\nbad line no punctuation"
    return body


def _seed_docs(spark, path: str):
    rows = [(i, _doc(i)) for i in range(30)]
    # exact duplicates of doc 2 (normalize to the same text)
    rows.append((100, _doc(2)))
    rows.append((101, _doc(2).upper()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(path)


CONF = """
def source(spark):
    return spark.read.parquet({src!r})

curation_stages = [
    ("c4", {{"use_cleaned_text": True, "min_sentences": 3}}),
    ("gopher", {{"min_words": 15, "min_stop_hits": 1}}),
    ("dedup_exact", {{}}),
    ("decontaminate", {{"benchmark_where": "doc_id % 29 = 5", "n": 5}}),
]
name = "corpus"
snapshot_ds = "2024-06-01"
report_drift = True
"""


def test_cli_curate_end_to_end(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    _seed_docs(spark, src)
    conf = tmp_path / "curate_conf.py"
    conf.write_text(CONF.format(src=src))
    out_root = str(tmp_path / "out")

    rc, res = _run(
        spark, ["curate", "--conf", str(conf), "--out-root", out_root], capsys
    )
    assert rc == 0
    assert [s["stage"] for s in res["report"]] == [
        "c4", "gopher", "dedup_exact", "decontaminate",
    ]
    # lineage is chained and monotone non-increasing
    for a, b in zip(res["report"], res["report"][1:]):
        assert a["rows_out"] == b["rows_in"]
        assert a["rows_out"] <= a["rows_in"]
    assert res["rows_in"] == 32

    got = spark.read.option("basePath", res["output_table"]).parquet(
        res["output_table"]
    )
    rows = got.collect()
    assert len(rows) == res["rows_out"] > 0
    assert all(r["ds"] == "2024-06-01" for r in rows)

    # c4 ran with use_cleaned_text: every surviving line is terminal-marked
    for r in rows:
        for line in r["text"].split("\n"):
            assert line.rstrip()[-1:] in (".", "!", "?", '"'), line

    # dedup: the planted duplicate family collapsed to its lowest doc_id
    ids = {r["doc_id"] for r in rows}
    assert not ({2, 100, 101} <= ids)

    # decontaminate: the benchmark doc (id 5) contaminates exactly itself
    # (its shingles are unique to it), so it is the ONLY extra drop
    assert 5 not in ids
    assert res["rows_out"] == 29  # 32 - dup pair (100, 101) - benchmark 5

    # curation ships its own data-shift receipt: survivors lost the
    # bad-punctuation lines and three whole docs, so drift is nonzero
    drift = res["drift_vs_input"]
    assert drift["tot_a"] > drift["tot_b"] > 0
    assert drift["tvd"] > 0 and drift["jsd"] > 0

    # sidecar report written next to the data
    sidecar = os.path.join(res["output_table"], "_curation_report.json")
    assert os.path.exists(sidecar)
    assert json.load(open(sidecar)) == {
        "stages": res["report"], "drift_vs_input": drift,
    }


def test_cli_curate_unknown_stage_fails_fast(spark, tmp_path, capsys):
    src = str(tmp_path / "docs2")
    _seed_docs(spark, src)
    conf = tmp_path / "bad_conf.py"
    conf.write_text(
        "def source(spark):\n"
        f"    return spark.read.parquet({src!r})\n"
        "curation_stages = [('no_such_stage', {})]\n"
    )
    with pytest.raises(ValueError, match="no_such_stage"):
        main(
            ["curate", "--conf", str(conf), "--out-root", str(tmp_path / "o2")],
            spark=spark,
        )


def test_curate_transcript_stage(spark):
    """The transcript_quality stage filters turn-level frames by their
    conversation verdict (different shape from the doc stages)."""
    from chronon_spark.operators.curation import build_stages, curate_pipeline

    turns = spark.createDataFrame(
        [
            ("good", 0, "user", "hello"), ("good", 1, "assistant", "hi there"),
            ("bad", 0, "assistant", "i start"), ("bad", 1, "user", "odd"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    stages = build_stages([("transcript_quality", {})])
    out, report = curate_pipeline(turns, stages, id_col="conv_id")
    assert report[0]["rows_in"] == 4 and report[0]["rows_out"] == 2
    assert {r["conv_id"] for r in out.collect()} == {"good"}


def test_compile_validates_curation_confs(spark, tmp_path, capsys):
    """The repo-wide compile step understands curation confs: good ones land
    in the manifest with a stage list + semantic hash; an unknown stage or a
    missing source() fails the compile (CI gate)."""
    root = tmp_path / "confs"
    root.mkdir()
    src = str(tmp_path / "docs3")
    _seed_docs(spark, src)
    (root / "good_curate.py").write_text(
        "def source(spark):\n"
        f"    return spark.read.parquet({src!r})\n"
        "curation_stages = [('c4', {}), ('dedup_exact', {})]\n"
        "name = 'good_corpus'\n"
    )
    rc, res = _run(
        spark, ["compile", "--conf-root", str(root)], capsys
    )
    assert rc == 0 and res["ok"] == res["confs"] == 1
    manifest = json.load(open(res["manifest"]))
    (entry,) = [e for e in manifest["entries"] if e["conf"] == "good_curate.py"]
    assert entry["status"] == "ok" and entry["kinds"] == ["curation"]
    cur = entry["entities"]["curation"]
    assert cur["stages"] == ["c4", "dedup_exact"]
    assert len(cur["semantic_hash"]) == 64

    (root / "bad_curate.py").write_text(
        "def source(spark):\n"
        f"    return spark.read.parquet({src!r})\n"
        "curation_stages = [('not_a_stage', {})]\n"
    )
    rc2, res2 = _run(spark, ["compile", "--conf-root", str(root)], capsys)
    assert rc2 == 1
    manifest2 = json.load(open(res2["manifest"]))
    bad = [e for e in manifest2["entries"] if e["conf"] == "bad_curate.py"]
    assert bad[0]["status"] == "error"


def test_curate_scrub_pii_stage(spark):
    """The scrub_pii stage rewrites text in place (every row survives) and
    composes with filters downstream."""
    from chronon_spark.operators.curation import build_stages, curate_pipeline

    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com for the full dataset details."),
            (2, "no pii in this one at all, promise."),
        ],
        "doc_id long, text string",
    )
    out, report = curate_pipeline(docs, build_stages([("scrub_pii", {})]))
    assert report[0]["rows_in"] == report[0]["rows_out"] == 2
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert "alice@example.com" not in texts[1]
    assert "promise" in texts[2]
