"""BPE tokenizer (operators/tokenizer.py): training determinism, encoder
equivalence against an INDEPENDENT application algorithm, and the
distributed apply against a per-doc python oracle."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.tokenizer import (
    apply_bpe,
    seed_merges,
    segment_word,
    train_bpe_merges,
)


def _seq_apply(word: str, merges) -> list[str]:
    """Independent oracle: apply merges SEQUENTIALLY in training order
    (Sennrich et al.'s original formulation) — a different algorithm from
    segment_word's best-rank loop; for merges produced by training the two
    provably coincide."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_training_picks_most_frequent_pair_first():
    m = train_bpe_merges({"aaab": 10, "caab": 5, "xy": 1}, 3)
    assert m[0] == ("a", "a")  # 25 occurrences, the clear winner


def test_training_deterministic_under_dict_order():
    wf1 = {"abc": 3, "bcd": 2, "cde": 1}
    wf2 = dict(reversed(list(wf1.items())))
    assert train_bpe_merges(wf1, 10) == train_bpe_merges(wf2, 10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_encoder_matches_sequential_oracle(seed):
    rng = random.Random(seed)
    corpus = {
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 12))): rng.randint(1, 9)
        for _ in range(80)
    }
    merges = train_bpe_merges(corpus, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(corpus) + ["dddddddd", "abcabcabc", "x", ""]:
        got = segment_word(w, ranks)
        assert got == _seq_apply(w, merges), (w, got)
        assert "".join(got) == w  # lossless within the word


def test_apply_bpe_matches_python_oracle(spark):
    merges = seed_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    rows = [
        (1, "the quick brown fox"),
        (2, "Tokenization  SPLITS the LONGEST words"),
        (3, "zzz qqq"),
        (4, "turn turn turn"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in apply_bpe(docs).collect()}
    for i, text in rows:
        ws = " ".join(text.lower().split()).split(" ")
        toks = [t for w in ws for t in segment_word(w, ranks)]
        fp = hashlib.md5("\x1f".join(toks).encode()).hexdigest()
        assert (got[i]["n_words"], got[i]["n_bpe_tokens"], got[i]["tokens_fp"]) == (
            len(ws), len(toks), fp,
        ), (i, got[i])


def test_apply_bpe_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"streaming windows slide over turn {i}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, apply_bpe(docs).collect()))
    b = sorted(map(tuple, apply_bpe(docs.repartition(17)).collect()))
    assert a == b


def test_apply_udf_scales_with_vocab_not_corpus(spark):
    """The pandas UDF must sit on the DISTINCT-words frame — the plan's
    ArrowEvalPython operates after a distinct aggregate, never over the
    exploded corpus directly."""
    docs = spark.createDataFrame(
        [(i, "the same tiny vocabulary repeated") for i in range(100)],
        "doc_id long, text string",
    )
    plan = apply_bpe(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    pre, _, _ = plan.partition("ArrowEvalPython")
    # the UDF input subtree (printed AFTER/below the Arrow node in Spark's
    # tree) must contain the distinct HashAggregate; the doc explode feeds
    # the join, not the UDF
    _, _, sub = plan.partition("ArrowEvalPython")
    assert "HashAggregate" in sub and "w#" in sub
