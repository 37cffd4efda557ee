"""Byte-pair-encoding tokenizer: sample-trained merges, distributed apply.

Public algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units"): training greedily merges
the most frequent adjacent symbol pair; application re-plays merges by
rank. The production shape at 100TB is exactly this split — merges train
ONCE on a bounded deterministic sample (driver-side python, like every real
tokenizer), while application distributes:

- apply_bpe segments the corpus's DISTINCT words (vocabulary-sized, orders
  of magnitude smaller than the corpus) with ONE Arrow-batched pandas UDF
  pass, then equi-joins the word->tokens map back to the exploded corpus —
  the UDF cost scales with |vocab|, not corpus rows, and the join key is a
  word (narrow).
- per-word segmentation is the standard best-rank loop with a batch-level
  memo; token order per document is reassembled natively.

Determinism: the sample is md5-ordered, training tie-breaks are total
(count desc, pair lexical), so merges — and therefore every downstream
token — are a pure function of (corpus, num_merges).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_bpe_merges(word_freq: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over a {word: count} table: start from
    characters, repeatedly merge the globally most frequent adjacent pair.
    Tie-break: (count desc, pair lexicographic) — total order, so training
    is deterministic for any dict iteration order."""
    vocab = {tuple(w): c for w, c in word_freq.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing repeats: further merges memorize single words
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges by rank (lowest first, leftmost non-overlapping) — the
    standard BPE encoder loop."""
    sym = list(word)
    while len(sym) > 1:
        best_rank, best = None, None
        for p in zip(sym, sym[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        a, b = best
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


# Fixed seed corpus: merges trained on it are a compile-time constant, so
# the DuckDB oracle can inline the SAME merge table and replay application
# exactly (driver_contract.SQL for bpe_tokenize).
SEED_CORPUS = (
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
    "the theory of the business is that the best things repeat",
    "lowering the learning rate lowers the loss slowly and surely",
    "tokenization splits the longest words into the smallest pieces",
    "conversation transcripts contain turns tools and timestamps",
    "the assistant responded and the user replied in turn",
    "streaming windows slide over the event time axis",
)


@lru_cache(maxsize=None)
def seed_merges(num_merges: int = 120) -> tuple[tuple[str, str], ...]:
    wf: dict[str, int] = {}
    for line in SEED_CORPUS:
        for w in line.split():
            wf[w] = wf.get(w, 0) + 1
    return tuple(train_bpe_merges(wf, num_merges))


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]] | tuple = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with the given merges. Returns
    (id_col, n_words, n_bpe_tokens, tokens_fp) where tokens_fp is the md5
    of the document's full token stream (tokens joined by unit separator) —
    a compact equality witness for the whole segmentation."""
    from pyspark.sql.functions import pandas_udf

    from chronon_spark.operators.dedup import normalize_text

    # the UDF closure references module-level segment_word; cloudpickle
    # serializes module functions BY REFERENCE, which breaks on workers
    # that don't have this package importable (e.g. a driver launched from
    # another cwd with sys.path patched). Register this module by value so
    # the encoder ships inside the closure.
    try:
        import sys as _sys

        from pyspark import cloudpickle as _cp

        _cp.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: fall back to by-reference

    if merges is None:
        merges = seed_merges()
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    bc = docs.sparkSession.sparkContext.broadcast(ranks)

    @pandas_udf("array<string>")
    def seg_udf(words: pd.Series) -> pd.Series:
        r = bc.value
        memo: dict[str, list[str]] = {}

        def seg(w):
            t = memo.get(w)
            if t is None:
                t = segment_word(w, r)
                memo[w] = t
            return t

        return words.map(seg)

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(normalize_text(F.col(text_col)), " ")).alias("pos", "w"),
    ).where(F.length("w") > 0)
    vocab = toks.select("w").distinct().withColumn("wt", seg_udf(F.col("w")))
    joined = toks.join(vocab, "w")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("wt")).alias("n_bpe_tokens"),
            F.md5(
                F.array_join(
                    F.flatten(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("pos", "wt"))),
                            lambda s: s["wt"],
                        )
                    ),
                    "\x1f",
                )
            ).alias("tokens_fp"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_words").cast("long"),
            F.col("n_bpe_tokens").cast("long"),
            "tokens_fp",
        )
    )
