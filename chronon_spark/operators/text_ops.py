"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all native Column expressions (JVM-side).

Heuristics are intentionally simple and deterministic: the contract is
bit-reproducible plumbing at 100TB, not model accuracy. Where a marker-word
count is needed we use replace-length arithmetic (identical semantics in
every SQL engine, used by the DuckDB oracles too).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# marker words per language for the n-gram language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " que "],
}


def occurrence_count(col: Column, needle: str) -> Column:
    """# occurrences of ``needle`` via length arithmetic (engine-portable)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def token_count(col: Column) -> Column:
    """Whitespace token count: collapse runs, count separators + 1."""
    norm = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(
        occurrence_count(norm, " ") + 1
    )


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword estimate: word-piece regex split (letters runs,
    digit runs, single punctuation) — a deterministic proxy for tokenizer
    cost accounting at corpus scale."""
    pieces = F.regexp_extract_all(col, F.lit(r"[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces).cast("long")


def lang_id(col: Column, pad: bool = True) -> Column:
    """Argmax of marker-word counts; 'zh' if CJK chars present; 'und' if no
    marker hits. Deterministic tie-break: language name ascending."""
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" ")) if pad else F.lower(col)
    scores = [
        (lang, sum_cols([occurrence_count(padded, m) for m in markers]))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    has_cjk = F.length(F.regexp_replace(col, r"[^一-鿿]", "")) > 0
    best_score = F.greatest(*[s for _, s in scores])
    pick = F.lit("und")
    # reversed so earlier (alphabetically-first) language wins ties
    for lang, s in reversed(scores):
        pick = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(pick)
    return F.when(has_cjk, F.lit("zh")).otherwise(pick)


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_chars, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
    quality_score (0..1, length+structure heuristic)."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    n_tokens = token_count(c)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("long")
    stop = sum_cols(
        [occurrence_count(F.concat(F.lit(" "), F.lower(c), F.lit(" ")), f" {w} ")
         for w in ("the", "a", "and", "of", "to")]
    )
    avg_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens)
    score = (
        F.least(n_tokens.cast("double") / 64.0, F.lit(1.0)) * 0.5
        + F.when((avg_tok >= 3) & (avg_tok <= 12), 0.3).otherwise(0.0)
        + F.least(stop.cast("double") / F.greatest(n_tokens, F.lit(1)) * 4.0, F.lit(1.0)) * 0.2
    )
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", F.round(avg_tok, 4))
        .withColumn("punct_ratio", F.round(punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("stopword_ratio", F.round(stop / F.greatest(n_tokens, F.lit(1)), 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint of the normalized text (engine-portable md5)."""
    return F.md5(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "))


def rolling_fingerprint(col: Column, window: int = 16) -> Column:
    """Winnowing-style rolling fingerprint: min xxhash64 over ``window``-char
    substrings — robust to small edits (Spark-only; pytest-verified)."""
    n = F.length(col)
    subs = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (window - 1), F.lit(1))),
        lambda i: F.xxhash64(col.substr(i, F.lit(window))),
    )
    return F.array_min(subs)


# ---------------------------------------------------------------------------
# PII scrubbing + repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

# conservative patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB
# oracles): no backrefs, no lookaround
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{7,15}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII match counts — native regexp_extract_all."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }


def scrub_pii(col: Column) -> Column:
    """Redact every PII category to a <CATEGORY> tag. Order is fixed
    (email, phone, ipv4) so downstream fingerprints are reproducible;
    patterns are applied to the running result, matching what a streaming
    scrubber sees."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1,
    public): duplicate-line fraction, duplicate-line CHARACTER fraction, and
    the character fraction covered by the most frequent word 2-gram.

    Duplicate fractions use EXCESS-occurrence counting (the published
    semantics): a line appearing ``cnt`` times contributes ``cnt - 1``
    duplicate lines and ``(cnt - 1) * len(line)`` duplicate characters; the
    character denominator is the total characters across all line
    occurrences. "Lines" are sentence-ish units split on '.' (the corpus
    tables carry no newlines); empties drop after trimming. Plan shape: one
    explode per signal family + groupBy(id) — shuffles carry (id, unit)
    counts, never full documents, and the id grouping reuses one hash
    partitioning.
    """
    c = F.col(text_col)
    base = df.select(F.col(id_col).alias("id"), c.alias("t"), F.length(c).alias("n_chars"))

    lines = base.select(
        "id",
        F.explode(F.split(F.col("t"), r"\.")).alias("line"),
    ).select("id", F.trim("line").alias("line")).where(F.length("line") > 0)
    per_line = lines.groupBy("id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = per_line.groupBy("id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct_lines"),
        F.sum(F.when(F.col("cnt") >= 2, (F.col("cnt") - 1) * F.length("line")).otherwise(0)).alias("dup_chars"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
    )

    words = F.split(normalize_for_grams(F.col("t")), " ")
    grams = base.select(
        "id",
        "n_chars",
        F.explode(
            F.when(
                F.size(words) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(words) - 1),
                    lambda i: F.array_join(F.slice(words, i, 2), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    top_gram = (
        grams.groupBy("id", "n_chars", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id", "n_chars")
        .agg(F.max(F.col("cnt") * F.length("gram")).alias("top_gram_chars"))
    )

    return (
        base.select("id", "n_chars")
        .join(line_stats, "id", "left")
        .join(top_gram.drop("n_chars"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.round(
                F.when(
                    F.coalesce("n_lines", F.lit(0)) > 0,
                    (F.col("n_lines") - F.col("n_distinct_lines"))
                    / F.col("n_lines").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    F.coalesce("line_chars", F.lit(0)) > 0,
                    F.col("dup_chars") / F.col("line_chars").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("dup_line_char_frac"),
            F.round(
                F.when(
                    (F.col("n_chars") > 0) & F.col("top_gram_chars").isNotNull(),
                    F.col("top_gram_chars") / F.col("n_chars").cast("double"),
                ).otherwise(0.0),
                6,
            ).alias("top2gram_char_frac"),
        )
    )


#: the paper's required-stopword list (Rae et al. 2021 §A1.1): a document
#: must contain at least 2 of these to pass the stopword rule
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: published thresholds, overridable per call
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stop_hits": 2,
    "max_dup_line_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
    "max_top_gram_char_frac": {2: 0.20, 3: 0.18, 4: 0.16},
    "max_dup_gram_frac": {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10},
}


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
    strategy: str = "local",
) -> DataFrame:
    """The complete Gopher quality-rule battery (Rae et al. 2021 §A1.1,
    public paper): word-count bounds, mean word length, symbol-to-word
    ratio, bullet/ellipsis line fractions, alphabetic-word fraction,
    required-stopword presence, duplicate-line fractions, top-{2,3,4}-gram
    character fractions, and duplicate-{5..10}-gram coverage fractions —
    per-doc metrics plus one ``gopher_keep`` verdict.

    Exactness contract: every fraction is ONE division of two integers
    computed identically in Spark and DuckDB (IEEE-exact cross-engine — the
    repo-wide oracle pattern), and the rule booleans compare the UNROUNDED
    quotients, so verdicts are bit-stable. Adaptations for a corpus whose
    texts carry no newlines are documented inline: "lines" are the
    '.'-split sentence units repetition_stats already uses, and the
    ellipsis rule counts '...' occurrences against the line count (a
    '.'-split can never see a trailing ellipsis).

    Two physical strategies produce the identical counts frame (both feed
    one shared native finalizer, so fraction/rounding semantics cannot
    drift):

    - ``local`` (default): every metric in the battery is doc-local, so
      ONE Arrow-batched ``mapInPandas`` pass computes all integer counts
      per document with ZERO shuffles — the scan partitioning flows
      straight through. At 100TB this moves nothing over the network
      (the shuffle plan moves ~16 bytes x total-gram-count, i.e. ~9x the
      corpus word count); locally it replaces the 20M-row gram
      aggregation with embarrassingly parallel per-doc counting.
    - ``shuffle``: the all-native-JVM plan — word-level rules as pure
      expressions, ALL nine gram sizes riding ONE explode →
      groupBy(id, n, md5-hash) → groupBy(id) chain (one
      hash-partitioning of doc ids; shuffles carry hashed gram counts,
      never documents). Kept as the no-Python-boundary alternative and
      as the differential twin for the local path.
    """
    th = {**GOPHER_THRESHOLDS, **(thresholds or {})}
    top_ns = sorted(th["max_top_gram_char_frac"])
    dup_ns = sorted(th["max_dup_gram_frac"])
    all_ns = sorted({*top_ns, *dup_ns})
    if strategy not in ("local", "shuffle"):
        raise ValueError(f"unknown gopher strategy {strategy!r}")
    if strategy == "local":
        counts = _gopher_counts_local(df, text_col, id_col, top_ns, dup_ns, all_ns)
    else:
        counts = _gopher_counts_shuffle(df, text_col, id_col, top_ns, dup_ns, all_ns)
    return _gopher_finalize(counts, th, top_ns, dup_ns, id_col)


def _gopher_counts_shuffle(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: list,
    dup_ns: list,
    all_ns: list,
) -> DataFrame:
    """All-native counts plan: see gopher_filter ``shuffle`` strategy."""
    c = F.col(text_col)
    norm = normalize_for_grams(c)
    base = df.select(
        F.col(id_col).alias("id"),
        c.alias("t"),
        norm.alias("nt"),
        F.split(norm, " ").alias("ws"),
    )

    # -- word-level metrics: native expressions, zero shuffle --------------
    n_words = F.when(F.length("nt") > 0, F.size("ws")).otherwise(F.lit(0))
    # norm is single-space-joined, so total word chars = len - (n_words - 1)
    word_chars = F.length("nt") - (n_words - 1)
    n_alpha = F.size(F.filter(F.col("ws"), lambda w: w.rlike("[a-z]")))
    ct = F.col("t")
    n_symbols = occurrence_count(ct, "#") + occurrence_count(ct, "...")
    padded = F.concat(F.lit(" "), F.col("nt"), F.lit(" "))
    stop_hits = sum_cols(
        [
            F.when(padded.contains(f" {w} "), F.lit(1)).otherwise(F.lit(0))
            for w in GOPHER_STOPWORDS
        ]
    )
    lvl = base.select(
        "id",
        F.length("nt").alias("n_chars"),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_symbols.alias("n_symbols"),
        stop_hits.alias("stop_hits"),
        occurrence_count(ct, "...").alias("n_ellipsis"),
    )

    # -- line-level: the '.'-split sentence units (corpus has no newlines) --
    lines = (
        base.select("id", F.explode(F.split(F.col("t"), r"\.")).alias("line"))
        .select("id", F.trim("line").alias("line"))
        .where(F.length("line") > 0)
    )
    per_line = lines.groupBy("id", "line").agg(F.count(F.lit(1)).alias("cnt"))
    line_stats = per_line.groupBy("id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct_lines"),
        F.sum(
            F.when(F.col("cnt") >= 2, (F.col("cnt") - 1) * F.length("line")).otherwise(0)
        ).alias("dup_line_chars"),
        F.sum(F.col("cnt") * F.length("line")).alias("line_chars"),
        F.sum(
            F.col("cnt")
            * F.when(F.substring("line", 1, 1).isin("-", "*", "•"), 1).otherwise(0)
        ).alias("n_bullet_lines"),
    )

    # -- ONE gram pass for every n: explode(n) then posexplode(grams_of_n) --
    # top-n-gram: count * gram-chars (the common executable reading of the
    # paper's rule — can exceed 1 on degenerate one-word docs, which only
    # strengthens rejection). dup-n-gram: COVERAGE — distinct word positions
    # inside any n-gram occurring >= 2 times, so the fraction is the paper's
    # "fraction contained in duplicates" (word granularity, overlap counted
    # once, always <= 1).
    with_n = base.select(
        "id", "ws", F.explode(F.array(*[F.lit(n) for n in all_ns])).alias("n")
    )
    grams = with_n.select(
        "id",
        "n",
        F.posexplode(
            F.when(
                F.size("ws") >= F.col("n"),
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - F.col("n") + 1),
                    lambda i: F.array_join(
                        F.slice(F.col("ws"), i, F.col("n")), " "
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "gram"),
    )
    # Shuffle HASHES, not gram strings: grams reduce to a 60-bit md5-derived
    # key + their length before any exchange, so the groupBy and the
    # coverage join move ~16 bytes/row instead of up-to-70-byte strings.
    # md5 is bit-identical in DuckDB, so the oracle groups by the SAME hash
    # — even a collision collides identically in both engines, keeping the
    # comparison exact. (A collect_list variant that avoided the second
    # join was measured SLOWER: it forces ObjectHashAggregate and loses
    # whole-stage codegen on the 20M-row aggregation — BENCH appendix.)
    ghashed = grams.select(
        "id",
        "n",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("gh"),
        F.length("gram").alias("glen"),
    )
    per_gram = ghashed.groupBy("id", "n", "gh").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("glen").alias("glen")
    )
    top_per_n = per_gram.groupBy("id", "n").agg(
        F.max(F.col("cnt") * F.col("glen")).alias("top_chars")
    )
    dup_cov = (
        ghashed.join(
            per_gram.where((F.col("cnt") >= 2) & (F.col("n").isin(*dup_ns))).select(
                "id", "n", "gh"
            ),
            ["id", "n", "gh"],
        )
        .select(
            "id",
            "n",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("wpos"),
        )
        .groupBy("id", "n")
        .agg(F.count_distinct("wpos").alias("covered_words"))
    )
    gram_wide = (
        top_per_n.groupBy("id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("top_chars"))).alias(
                    f"top{n}_chars"
                )
                for n in top_ns
            ]
        )
        .join(
            dup_cov.groupBy("id").agg(
                *[
                    F.max(
                        F.when(F.col("n") == n, F.col("covered_words"))
                    ).alias(f"dup{n}_covered")
                    for n in dup_ns
                ]
            ),
            "id",
            "left",
        )
    )

    return (
        lvl.join(line_stats, "id", "left")
        .join(gram_wide, "id", "left")
        .na.fill(
            {
                "n_lines": 0,
                "n_distinct_lines": 0,
                "dup_line_chars": 0,
                "line_chars": 0,
                "n_bullet_lines": 0,
                **{f"top{n}_chars": 0 for n in top_ns},
                **{f"dup{n}_covered": 0 for n in dup_ns},
            }
        )
    )


def _gopher_counts_local(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: list,
    dup_ns: list,
    all_ns: list,
) -> DataFrame:
    """Zero-shuffle counts plan: one Arrow-batched ``mapInPandas`` pass
    computes every integer count per document (all metrics in the battery
    are doc-local). Python-side semantics replicate the native expressions
    EXACTLY — ASCII ``\\s`` class (Java's), space-only trim, non-overlapping
    '...' counting — and the counts are handed back to the shared native
    finalizer, so the two strategies cannot diverge on rounding or rule
    evaluation. Grams are counted as interned-int tuples (no hashing
    scheme at all — exact string grouping, which the DuckDB oracle
    replicates by grouping raw gram strings).
    """
    import pandas as pd

    from chronon_spark.operators.dedup import _spread_by_id

    id_field = df.schema[id_col]
    top_cols = [f"top{n}_chars" for n in top_ns]
    dup_cols = [f"dup{n}_covered" for n in dup_ns]
    count_cols = [
        "n_chars", "n_words", "word_chars", "n_alpha_words", "n_symbols",
        "stop_hits", "n_ellipsis", "n_lines", "n_distinct_lines",
        "dup_line_chars", "line_chars", "n_bullet_lines", *top_cols, *dup_cols,
    ]
    out_schema = T.StructType(
        [T.StructField("id", id_field.dataType)]
        + [T.StructField(n, T.LongType()) for n in count_cols]
    )
    # closure-captured constants (shipped by value — workers never import)
    stopwords = GOPHER_STOPWORDS
    ws_re = re.compile(r"\s+", re.ASCII)  # Java \s == ASCII \s here
    alpha_re = re.compile(r"[a-z]")
    top_set, dup_set = set(top_ns), set(dup_ns)

    def doc_counts(t):
        t = t if isinstance(t, str) else ""
        nt = ws_re.sub(" ", t.lower().strip(" "))
        ws = nt.split(" ") if nt else []
        n_words = len(ws)
        rec = {
            "n_chars": len(nt),
            "n_words": n_words,
            "word_chars": len(nt) - (n_words - 1),
            "n_alpha_words": sum(1 for w in ws if alpha_re.search(w)),
            "n_symbols": t.count("#") + t.count("..."),
            "stop_hits": sum(1 for w in stopwords if f" {w} " in f" {nt} "),
            "n_ellipsis": t.count("..."),
        }
        line_cnt = {}
        for raw in t.split("."):
            line = raw.strip(" ")
            if line:
                line_cnt[line] = line_cnt.get(line, 0) + 1
        rec["n_lines"] = sum(line_cnt.values())
        rec["n_distinct_lines"] = len(line_cnt)
        rec["dup_line_chars"] = sum(
            (c - 1) * len(l) for l, c in line_cnt.items() if c >= 2
        )
        rec["line_chars"] = sum(c * len(l) for l, c in line_cnt.items())
        rec["n_bullet_lines"] = sum(
            c for l, c in line_cnt.items() if l[0] in "-*•"
        )
        # intern words to small ints: tuple-of-int keys hash ~3x faster
        # than tuple-of-str and gram lengths become table lookups
        idx: dict = {}
        wid = [idx.setdefault(w, len(idx)) for w in ws]
        wlen = [0] * len(idx)
        for w, i in idx.items():
            wlen[i] = len(w)
        for n in all_ns:
            top_key, dup_key = f"top{n}_chars", f"dup{n}_covered"
            if n_words < n:
                if n in top_set:
                    rec[top_key] = 0
                if n in dup_set:
                    rec[dup_key] = 0
                continue
            grams = list(zip(*(wid[i:] for i in range(n))))
            cnt = {}
            for g in grams:
                cnt[g] = cnt.get(g, 0) + 1
            if n in top_set:
                rec[top_key] = max(
                    c * (sum(wlen[i] for i in g) + n - 1) for g, c in cnt.items()
                )
            if n in dup_set:
                dup = {g for g, c in cnt.items() if c >= 2}
                if dup:
                    cov = bytearray(n_words)
                    one = b"\x01" * n
                    for i, g in enumerate(grams):
                        if g in dup:
                            cov[i : i + n] = one
                    rec[dup_key] = sum(cov)
                else:
                    rec[dup_key] = 0
        return rec

    def compute(batches):
        for pdf in batches:
            recs = [doc_counts(t) for t in pdf[text_col].tolist()]
            out = pd.DataFrame(
                {"id": pdf[id_col].values}
                | {c: [r[c] for r in recs] for c in count_cols}
            )
            yield out

    return _spread_by_id(df.select(id_col, text_col), id_col).mapInPandas(
        compute, schema=out_schema
    )


def _gopher_finalize(
    out: DataFrame, th: dict, top_ns: list, dup_ns: list, id_col: str
) -> DataFrame:
    """Shared fraction/rule evaluation over the integer counts frame —
    native expressions only, so both counts strategies finalize through
    the identical arithmetic."""
    nw = F.col("n_words").cast("double")
    nc = F.col("n_chars").cast("double")
    nl = F.col("n_lines").cast("double")
    mean_wl = F.when(F.col("n_words") > 0, F.col("word_chars") / nw)
    sym_ratio = F.when(F.col("n_words") > 0, F.col("n_symbols") / nw)
    alpha_frac = F.when(F.col("n_words") > 0, F.col("n_alpha_words") / nw)
    bullet_frac = F.when(F.col("n_lines") > 0, F.col("n_bullet_lines") / nl)
    ellipsis_frac = F.when(F.col("n_lines") > 0, F.col("n_ellipsis") / nl)
    dup_line_frac = F.when(
        F.col("n_lines") > 0, (F.col("n_lines") - F.col("n_distinct_lines")) / nl
    )
    dup_line_cf = F.when(
        F.col("line_chars") > 0,
        F.col("dup_line_chars") / F.col("line_chars").cast("double"),
    )
    top_fracs = {
        n: F.when(F.col("n_chars") > 0, F.col(f"top{n}_chars") / nc) for n in top_ns
    }
    # coverage fraction: distinct duplicated-gram word positions / words
    dup_fracs = {
        n: F.when(F.col("n_words") > 0, F.col(f"dup{n}_covered") / nw) for n in dup_ns
    }

    rules = [
        F.col("n_words") >= th["min_words"],
        F.col("n_words") <= th["max_words"],
        F.coalesce(mean_wl, F.lit(0.0)) >= th["min_mean_word_len"],
        F.coalesce(mean_wl, F.lit(0.0)) <= th["max_mean_word_len"],
        F.coalesce(sym_ratio, F.lit(0.0)) <= th["max_symbol_word_ratio"],
        F.coalesce(bullet_frac, F.lit(0.0)) <= th["max_bullet_line_frac"],
        F.coalesce(ellipsis_frac, F.lit(0.0)) <= th["max_ellipsis_line_frac"],
        F.coalesce(alpha_frac, F.lit(0.0)) >= th["min_alpha_word_frac"],
        F.col("stop_hits") >= th["min_stop_hits"],
        F.coalesce(dup_line_frac, F.lit(0.0)) <= th["max_dup_line_frac"],
        F.coalesce(dup_line_cf, F.lit(0.0)) <= th["max_dup_line_char_frac"],
        *[
            F.coalesce(top_fracs[n], F.lit(0.0)) <= th["max_top_gram_char_frac"][n]
            for n in top_ns
        ],
        *[
            F.coalesce(dup_fracs[n], F.lit(0.0)) <= th["max_dup_gram_frac"][n]
            for n in dup_ns
        ],
    ]
    n_failed = sum_cols([F.when(~r, F.lit(1)).otherwise(F.lit(0)) for r in rules])

    return out.select(
        F.col("id").alias(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.round(F.coalesce(mean_wl, F.lit(0.0)), 6).alias("mean_word_len"),
        F.round(F.coalesce(sym_ratio, F.lit(0.0)), 6).alias("symbol_word_ratio"),
        F.round(F.coalesce(alpha_frac, F.lit(0.0)), 6).alias("alpha_word_frac"),
        F.col("stop_hits").cast("long").alias("stop_hits"),
        F.round(F.coalesce(bullet_frac, F.lit(0.0)), 6).alias("bullet_line_frac"),
        F.round(F.coalesce(ellipsis_frac, F.lit(0.0)), 6).alias("ellipsis_line_frac"),
        F.round(F.coalesce(dup_line_frac, F.lit(0.0)), 6).alias("dup_line_frac"),
        F.round(F.coalesce(dup_line_cf, F.lit(0.0)), 6).alias("dup_line_char_frac"),
        *[
            F.round(F.coalesce(top_fracs[n], F.lit(0.0)), 6).alias(
                f"top{n}gram_char_frac"
            )
            for n in top_ns
        ],
        *[
            F.round(F.coalesce(dup_fracs[n], F.lit(0.0)), 6).alias(
                f"dup{n}gram_frac"
            )
            for n in dup_ns
        ],
        n_failed.cast("long").alias("n_rules_failed"),
        (n_failed == 0).alias("gopher_keep"),
    )


def normalize_for_grams(col: Column) -> Column:
    """THE dedup normal form (operators/dedup.normalize_text), re-exported
    under a gram-flavored name so repetition grams and dedup shingles can
    never drift apart."""
    from chronon_spark.operators.dedup import normalize_text

    return normalize_text(col)


#: C4 cleaning parameters (Raffel et al. 2020 §2.2, public paper, plus the
#: two line rules its released pipeline code added: ellipsis-terminated and
#: policy-boilerplate lines). ``badwords`` defaults to an obvious
#: placeholder pair — production swaps in the public LDNOOBW list.
C4_PARAMS = {
    "min_words_per_line": 3,
    "min_sentences": 5,
    "end_marks": (".", "!", "?", '"'),
    "policy_substrings": (
        "terms of use",
        "privacy policy",
        "cookie policy",
        "uses cookies",
        "use of cookies",
        "use cookies",
    ),
    "badwords": ("badword", "obscenity"),
}


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    params: dict | None = None,
) -> DataFrame:
    """The C4 cleaning pipeline (Raffel et al. 2020 §2.2, public paper):
    line-level filtering that RECONSTRUCTS the cleaned document, plus the
    page-level drop rules — per-doc reason counters, ``cleaned_text``, and
    one ``c4_keep`` verdict.

    Line rules (a line survives iff ALL hold, on the whitespace-trimmed
    line): ends in a terminal punctuation mark; does not end in an
    ellipsis; has at least ``min_words_per_line`` words; does not mention
    "javascript"; carries no policy-boilerplate substring. Page rules
    (drop the whole doc): contains "lorem ipsum"; contains a curly
    bracket; contains a bad word (word-boundary match on the dedup normal
    form); or the CLEANED text has fewer than ``min_sentences`` sentences
    (sentence count = terminal-mark characters in the cleaned text — the
    deterministic cross-engine proxy for the original's sentence
    tokenizer, documented divergence).

    Exactness contract: counters are integers, ``kept_line_frac`` is one
    integer/integer division (IEEE-exact cross-engine), and
    ``cleaned_text`` is compared as an exact string — the DuckDB twin
    rebuilds it with the same split/trim/filter/join.

    Plan shape (100TB): ZERO shuffles. Lines never explode — the whole
    battery is native array higher-order functions (split → transform →
    filter → array_join) evaluated per input row, so the operator is
    embarrassingly parallel and preserves the scan partitioning. HOFs are
    interpreted rather than codegen'd (BENCH §7), but they beat the
    alternative explode → groupBy(doc) → collect_list reconstruction,
    which would shuffle every surviving byte of the corpus.
    """
    p = {**C4_PARAMS, **(params or {})}
    marks = list(p["end_marks"])
    c = F.col(text_col)

    # trimmed, non-empty lines in original order
    tls = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )

    def n_words(l: Column) -> Column:
        return F.size(F.split(l, r"\s+"))

    def ends_mark(l: Column) -> Column:
        return F.substring(l, -1, 1).isin(*marks)

    def ellipsis_end(l: Column) -> Column:
        return l.endswith("...")

    def mentions_js(l: Column) -> Column:
        return F.lower(l).contains("javascript")

    def policy(l: Column) -> Column:
        out = F.lit(False)
        for s in p["policy_substrings"]:
            out = out | F.lower(l).contains(s)
        return out

    def keeps(l: Column) -> Column:
        return (
            ends_mark(l)
            & ~ellipsis_end(l)
            & (n_words(l) >= p["min_words_per_line"])
            & ~mentions_js(l)
            & ~policy(l)
        )

    kept = F.filter(tls, keeps)
    cleaned = F.array_join(kept, "\n")
    n_sentences = F.length(cleaned) - F.length(
        F.regexp_replace(cleaned, "[.!?]", "")
    )
    padded = F.concat(F.lit(" "), normalize_for_grams(c), F.lit(" "))
    has_badword = F.lit(False)
    for w in p["badwords"]:
        has_badword = has_badword | padded.contains(f" {w} ")
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")

    n_lines = F.size(tls)
    n_kept = F.size(kept)
    base = df.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        F.size(F.filter(tls, lambda l: n_words(l) < p["min_words_per_line"]))
        .cast("long")
        .alias("n_short_lines"),
        F.size(F.filter(tls, lambda l: ~ends_mark(l)))
        .cast("long")
        .alias("n_unterminated_lines"),
        F.size(F.filter(tls, ellipsis_end)).cast("long").alias("n_ellipsis_lines"),
        F.size(F.filter(tls, mentions_js)).cast("long").alias("n_js_lines"),
        F.size(F.filter(tls, policy)).cast("long").alias("n_policy_lines"),
        F.round(
            F.when(n_lines > 0, n_kept / n_lines.cast("double")).otherwise(0.0), 6
        ).alias("kept_line_frac"),
        cleaned.alias("cleaned_text"),
        n_sentences.cast("long").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_badword.alias("has_badword"),
    )
    return base.withColumn(
        "c4_keep",
        ~F.col("has_lorem")
        & ~F.col("has_brace")
        & ~F.col("has_badword")
        & (F.col("n_sentences") >= p["min_sentences"]),
    )
