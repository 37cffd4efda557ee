"""Training-corpus curation operators: benchmark decontamination,
deterministic hash splits, and sequence packing.

These are the last-mile ops a 100TB pretraining pipeline runs after dedup
(operators/dedup.py) and quality scoring (operators/text_ops.py):

- decontaminate:  flag corpus documents sharing any n-gram with an eval
                  benchmark set. The benchmark side is tiny by construction
                  (eval sets are KBs against a 100TB corpus), so its distinct
                  shingle set is BROADCAST — the corpus never shuffles for
                  candidate generation; only the per-doc hit counts (a small
                  fraction of the corpus) hit a groupBy exchange.
- hash_split:     deterministic train/val/test assignment from md5(key):
                  stable under repartitioning, resharding, and re-runs —
                  membership is a pure function of the key, never of row
                  order or partition layout.
- pack_sequences: concatenate-and-split sequence packing (the standard
                  pretraining dataloader layout): documents are laid
                  end-to-end in a deterministic global order and cut every
                  `budget` tokens. The global token prefix-sum is computed
                  distributed: per-range-bucket subtotals -> bounded
                  driver-side exclusive offsets (one tiny collect, like the
                  reference's own cutoff probes) -> broadcast back ->
                  within-bucket window cumsum partitioned by bucket. No
                  single-partition global window anywhere.

All hash derivations are md5-based so DuckDB oracles replicate them
bit-for-bit (same trick as operators/dedup.py simhash / similarity.py LSH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chronon_spark.operators.dedup import shingles
from chronon_spark.operators.text_ops import token_count


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark-overlap report: (id_col, n_hits, contaminated).

    A document is contaminated iff it shares >= 1 normalized n-word shingle
    with any benchmark document; n_hits counts its distinct leaking shingles.
    Plan shape at 100TB: corpus shingling is a map-side explode; the distinct
    benchmark shingle set is broadcast into the join (no corpus shuffle for
    candidates); only per-doc hit counts shuffle.
    """
    bench_col = bench_text_col or text_col
    bench_sh = (
        shingles(benchmark, bench_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    corpus_sh = shingles(docs, text_col, id_col, n)
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_uniform(key, salt: str = "split"):
    """Deterministic uniform [0, 1) from md5(salt:key) — first 8 hex chars
    over 2^32. Engine-portable: DuckDB computes the identical value."""
    h = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(float(2**32))


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column assigning each row to a named fraction of the
    keyspace. Assignment is a pure function of (salt, key): stable across
    re-runs, repartitions, and corpus growth (existing keys never move when
    new data arrives — the property that keeps eval sets frozen).

    weights need not sum to 1; they are normalized. Iteration order of the
    dict defines the threshold ladder, so pass an ordered mapping.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    u = split_uniform(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights.items())
    for name, w in names[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def split_case_sql(
    key_sql: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> str:
    """ANSI-SQL CASE expression computing exactly hash_split's assignment —
    thresholds are accumulated by the SAME Python float arithmetic, so both
    engines compare against bit-identical double literals."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    u = (
        f"(CAST(concat('0x', substr(md5('{salt}:' || CAST({key_sql} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) / 4294967296.0)"
    )
    names = list(weights.items())
    clauses, acc = [], 0.0
    for name, w in names[:-1]:
        acc += w / total
        clauses.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    if not clauses:
        return f"'{names[-1][0]}'"
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1][0]}' END"


def dedup_lines_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style cross-corpus duplicate-line removal (Raffel et al. 2020
    §2.2, public): every sentence-ish unit ("line", split on '.') is kept
    only at its FIRST occurrence across the whole corpus — first = lowest
    (doc_id, position) — and each document is reassembled from its
    surviving lines in order. Returns (id_col, text, n_lines, n_dropped);
    the reassembled text joins survivors with '. ' (normalized separators —
    the C4 transform is lossy by construction).

    Shuffle shape at 100TB: first-occurrence detection is a map-side-
    combinable min(struct) aggregate over a NARROW frame
    (md5(line), doc_id, pos) — hot boilerplate lines partially aggregate
    before the shuffle — and winners join back to the exploded lines on
    the same key, so full line text never rides the ranking shuffle and
    both stages share one partitioning.
    """
    from chronon_spark.operators.dedup import normalize_text

    lines = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\.")).alias("pos", "line"),
        )
        .select("id", "pos", F.trim("line").alias("line"))
        .where(F.length("line") > 0)
        .withColumn("h", F.md5(normalize_text(F.col("line"))))
    )
    # first-occurrence detection via a combinable min(struct) aggregate
    # rather than a row_number window — a boilerplate line duplicated
    # millions of times would hot-spot one window partition, while this
    # partially aggregates map-side (same rationale as dedup_spans_corpus)
    winners = lines.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("w")
    ).select("h", F.col("w.id").alias("id"), F.col("w.pos").alias("pos"))
    kept = lines.join(winners, ["h", "id", "pos"])
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            ". ",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Concatenate-and-split packing: documents ordered by `id_col` are laid
    end-to-end and cut into fixed `budget`-token training sequences. Returns
    one row per document: its global token offset, the pack it starts in,
    its offset inside that pack, and how many packs it spans.

    Distributed prefix-sum (no global-order window, which would collapse to
    ONE partition): docs are range-bucketed on id, per-bucket token subtotals
    are collected (n_buckets rows — a bounded driver action, the repo's
    semi_join_reduce precedent), exclusive bucket offsets are broadcast back,
    and the within-bucket cumsum runs as a window PARTITIONED BY bucket.
    At 100TB raise n_buckets with the data; the collect stays tiny.

    With a sparse/skewed id space the floor-width bucketing is uneven but
    still correct — production would feed repartitionByRange boundaries in
    as explicit bucket edges.
    """
    toks = (F.col(tokens_col) if tokens_col else token_count(F.col(text_col))).cast("long")
    base = docs.select(F.col(id_col).alias("__id"), toks.alias("n_tokens"))

    lo, hi, n_null = base.agg(
        F.min("__id"),
        F.max("__id"),
        F.sum(F.col("__id").isNull().cast("long")),
    ).first()
    if n_null:
        raise ValueError(
            f"pack_sequences: {n_null} row(s) with NULL {id_col!r} — the "
            f"global document order is keyed on {id_col!r}, so every row "
            f"needs a non-null id"
        )
    if lo is None:
        return base.select(
            F.col("__id").alias(id_col), "n_tokens",
            F.lit(0).cast("long").alias("global_start"),
            F.lit(0).cast("long").alias("pack_first"),
            F.lit(0).cast("long").alias("pack_last"),
            F.lit(0).cast("long").alias("offset_in_pack"),
        )
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)
    # persisted: token_count is the dominant map-side cost at corpus scale
    # and the lineage is evaluated twice (subtotal collect + final select);
    # released via the plan-cache registry at the caller's next safe point
    bucketed = base.withColumn(
        "__b", ((F.col("__id") - F.lit(int(lo))) / F.lit(width)).cast("long")
    ).persist()
    from chronon_spark.plans import cache as _plan_cache

    _plan_cache.register(bucketed)

    subtotals = sorted(
        bucketed.groupBy("__b").agg(F.sum("n_tokens").alias("__t")).collect(),
        key=lambda r: r["__b"],
    )
    offsets, acc = [], 0
    for r in subtotals:
        offsets.append((r["__b"], acc))
        acc += int(r["__t"])
    off_df = docs.sparkSession.createDataFrame(offsets, "__b long, __boff long")

    w = Window.partitionBy("__b").orderBy("__id")
    within = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    start = (F.col("__boff") + within).cast("long")
    end_tok = start + F.greatest(F.col("n_tokens"), F.lit(1)) - 1
    return (
        bucketed.join(F.broadcast(off_df), "__b")
        .select(
            F.col("__id").alias(id_col),
            "n_tokens",
            start.alias("global_start"),
            F.floor(start / budget).cast("long").alias("pack_first"),
            F.floor(end_tok / budget).cast("long").alias("pack_last"),
            (start % budget).cast("long").alias("offset_in_pack"),
        )
    )


def dedup_spans_corpus(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicated-span removal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", public —
    their suffix-array EXACTSUBSTR keeps ONE copy of any sufficiently long
    repeated substring). Spark-native equivalent at k-token granularity: a
    token is REMOVED iff it is covered by some k-token window whose
    normalized content occurs more than once corpus-wide and whose
    (doc, start) is NOT the global first occurrence of that content
    (first = lowest (doc_id, start)). A verbatim duplicated span of length
    L >= k is therefore kept in its earliest document and removed in full
    from every later one; spans shorter than k never trigger. Documents
    reassemble from surviving tokens in order (normalized whitespace — the
    transform is lossy by construction, like the C4 line dedup above).

    Returns (id_col, text, n_tokens, n_dropped).

    Shuffle shape at 100TB: first-occurrence detection is a map-side-
    combinable min(struct)/count aggregate over a NARROW frame
    (md5(k-gram), doc_id, start) — hot boilerplate grams partially
    aggregate before the shuffle and the duplicate-marking equi-join is
    AQE-skew-splittable; only DUPLICATED non-first windows (sparse by
    construction in a deduplicated corpus) shuffle back, aggregated to ONE
    bad-start array per affected doc. Document text never rides any shuffle: docs join the
    sparse bad-array frame on their key and reassembly is a native
    array filter — no token explode, no groupBy rebuild. Gram hashes are
    md5 over the joined token slice so a DuckDB oracle replicates them
    bit-for-bit.
    """
    from chronon_spark.operators.dedup import normalize_text

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("ts"),
    )

    starts = F.when(
        F.size("ts") >= k, F.sequence(F.lit(1), F.size("ts") - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "id",
        F.explode(
            F.transform(
                starts,
                lambda s: F.struct(
                    s.alias("s"),
                    F.md5(F.array_join(F.slice("ts", s, k), " ")).alias("h"),
                ),
            )
        ).alias("g"),
    ).select("id", F.col("g.s").alias("s"), F.col("g.h").alias("h"))

    # global-first detection as a map-side-combinable aggregate, NOT a
    # row_number window: a boilerplate k-gram duplicated millions of times
    # would concentrate one window partition (windows cannot AQE-split),
    # while min(struct)/count partially aggregate before the shuffle and
    # the remaining equi-join is AQE-skew-splittable
    firsts = grams.groupBy("h").agg(
        F.min(F.struct("id", "s")).alias("first"), F.count(F.lit(1)).alias("c")
    )
    bad = (
        grams.join(firsts.where(F.col("c") > 1), "h")
        .where((F.col("id") != F.col("first.id")) | (F.col("s") != F.col("first.s")))
        .select("id", "s")
    )
    # one sorted bad-start array per AFFECTED doc (sparse frame)
    bad_per_doc = bad.groupBy("id").agg(F.array_sort(F.collect_set("s")).alias("bads"))

    # doc-level reassembly: token at 1-based position p survives iff no bad
    # window start b covers it (b <= p <= b+k-1) — a native array filter,
    # so the token text never shuffles
    joined = toks.join(bad_per_doc, "id", "left")
    # split() tokens are never null, so a dropped token can be marked null
    kept_arr = F.when(F.col("bads").isNull(), F.col("ts")).otherwise(
        F.filter(
            F.transform(
                "ts",
                lambda x, i: F.when(
                    ~F.exists(
                        "bads", lambda b: (b <= i + 1) & (i + 1 <= b + F.lit(k - 1))
                    ),
                    x,
                ),
            ),
            lambda x: x.isNotNull(),
        )
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(kept_arr, " ").alias("text"),
        F.size("ts").cast("long").alias("n_tokens"),
        (F.size("ts") - F.size(kept_arr)).cast("long").alias("n_dropped"),
    )


def _gram_frame(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, gram) with multiplicity: word unigrams + bigrams over normalized
    tokens — the DSIR feature space (Xie et al. 2023 §3.2, public)."""
    from chronon_spark.operators.dedup import normalize_text

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("ts"),
    )
    n = F.size("ts")
    unigrams = F.col("ts")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("ts", 1, n - 1),
            F.slice("ts", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("id", F.explode(F.concat(unigrams, bigrams)).alias("g"))


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 4096,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """DSIR-style importance weighting for target-domain data selection
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling", public): hashed n-gram (unigram+bigram) bucket counts give
    Laplace-smoothed target (p) and raw (q) distributions; each document's
    importance weight is sum over its grams of log(p[b]/q[b]).

    Exactness contract: the per-bucket log-ratio is QUANTIZED to an integer
    (round(quant * ln(p/q))) so per-doc weights are INTEGER sums —
    order-independent and bit-identical in any engine, unlike float sums
    whose value depends on Spark's nondeterministic reduce order. Returns
    (id_col, n_grams, weight_q, selected) where weight_q is the quantized
    log-weight and selected marks the greedy top-k by (weight_q desc, id) —
    the paper's top-k variant; for the Gumbel-resampling variant see
    gumbel_topk().

    Shuffle shape at 100TB: gram rows are NARROW (id, 32-bit bucket); the
    distribution fit groupBys onto <= `buckets` rows (bounded, broadcast
    back into the scoring join — the corpus never shuffles for the ratio
    table); scoring is one groupBy(id) integer sum. Bucket hashing is
    md5-based so a DuckDB oracle replicates weights bit-for-bit.
    """
    b32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % buckets
    raw_g = _gram_frame(docs, text_col, id_col).withColumn("b", b32(F.col("g")))
    tgt_g = _gram_frame(target, text_col, id_col).withColumn("b", b32(F.col("g")))

    raw_b = raw_g.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt_b = tgt_g.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    raw_tot = raw_b.agg(F.sum("cr").alias("tot_cr"))
    tgt_tot = tgt_b.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tot_ct"))

    # p = (ct+1)/(CT+B), q = (cr+1)/(CR+B); only buckets with cr >= 1 can
    # ever be hit by a corpus gram, so the raw-bucket frame is the domain.
    lr = (
        raw_b.join(tgt_b, "b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            F.round(
                F.lit(float(quant))
                * (
                    F.log((F.coalesce("ct", F.lit(0)) + 1).cast("double"))
                    - F.log((F.col("tot_ct") + buckets).cast("double"))
                    - F.log((F.col("cr") + 1).cast("double"))
                    + F.log((F.col("tot_cr") + buckets).cast("double"))
                )
            )
            .cast("long")
            .alias("lr_q"),
        )
    )

    scored = (
        raw_g.join(F.broadcast(lr), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lr_q").alias("weight_q"),
        )
    )
    # exact distributed top-k, no global-order window (which would pull
    # every doc into ONE partition): the global top-k is always a subset of
    # the union of per-partition top-ks, so rank locally first, then rank
    # the bounded (num_partitions x k) candidate set, then broadcast the
    # winning ids back. Result is layout-invariant — the final top-k under
    # the total order (weight desc, id asc) is unique.
    local_w = Window.partitionBy("__pid").orderBy(F.desc("weight_q"), F.asc("id"))
    cand = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(local_w))
        .where(F.col("__rn") <= k)
        .select("id", "weight_q")
    )
    glob_w = Window.orderBy(F.desc("weight_q"), F.asc("id"))
    winners = (
        cand.withColumn("__rn", F.row_number().over(glob_w))
        .where(F.col("__rn") <= k)
        .select(F.col("id").alias("__win_id"))
    )
    return (
        scored.join(
            F.broadcast(winners), scored["id"] == winners["__win_id"], "left"
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long"),
            F.col("weight_q").cast("long"),
            F.col("__win_id").isNotNull().alias("selected"),
        )
    )


def gumbel_topk(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "weight_q",
    quant: int = 1_000_000,
    salt: str = "gumbel",
) -> DataFrame:
    """DSIR's Gumbel-top-k resampling (sample k docs without replacement
    with probability proportional to their importance weight): score =
    log w + Gumbel noise, noise derived DETERMINISTICALLY from md5(salt:id)
    so re-runs and resharding select the identical sample. Float scores are
    for ORDERING only (never summed), so cross-engine determinism holds
    everywhere except exact ties, which the id tiebreak settles."""
    u32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (u32 + 0.5) / float(1 << 32)
    g = -F.log(-F.log(u))
    score = F.col(weight_col).cast("double") / quant + g
    # same two-phase exact top-k as dsir_weights: the gumbel score is a
    # pure per-row function, so per-partition ranking is sound and no
    # global-order window is needed
    base = scored.withColumn("__score", score)
    local_w = Window.partitionBy("__pid").orderBy(F.desc("__score"), F.asc(id_col))
    cand = (
        base.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(local_w))
        .where(F.col("__rn") <= k)
        .drop("__pid", "__rn")
    )
    glob_w = Window.orderBy(F.desc("__score"), F.asc(id_col))
    return (
        cand.withColumn("gumbel_rank", F.row_number().over(glob_w))
        .where(F.col("gumbel_rank") <= k)
        .drop("__score")
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5-derived
    uniform (a pure function of (salt, id) — stable under resharding,
    re-runs and corpus growth, the hash_split contract) falls below the
    stratum's fraction. Unlike df.sample(), membership never depends on
    partition layout, so backfills and incremental runs agree forever."""
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (u32 + 0.5) / float(1 << 32)
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == k
        frac = F.when(cond, F.lit(float(v))) if frac is None else frac.when(cond, F.lit(float(v)))
    frac = F.lit(float(default_fraction)) if frac is None else frac.otherwise(
        F.lit(float(default_fraction))
    )
    return docs.where(u < frac)


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Static data mixing (the Pile / DoReMi-static recipe, public): build a
    training corpus whose per-source token counts match ``weights`` at
    ``token_budget`` total tokens. Each source's sampling RATE is
    budget*w_s / tokens_s; rates above 1 repeat the source for
    floor(rate) full epochs plus a deterministic fractional sample (the
    standard up-sampling of small high-quality sources). Returns the mixed
    corpus with an ``epoch`` column (0-based copy index) — one output row
    per (kept doc, epoch).

    Everything is deterministic and layout-invariant: per-source token
    totals are one bounded groupBy (sources are few), rates broadcast back,
    and membership of the fractional epoch is an md5-threshold test salted
    with the epoch index. At 100TB nothing shuffles except the
    source-count aggregate — selection is a map-side filter.
    """
    toks = (F.col(tokens_col) if tokens_col else token_count(F.col(text_col))).cast(
        "long"
    )
    base = docs.withColumn("__nt", toks)
    totals = {
        r[strata_col]: r["t"]
        for r in base.groupBy(strata_col).agg(F.sum("__nt").alias("t")).collect()
    }
    unknown = set(weights) - set(totals)
    if unknown:
        raise ValueError(f"mix_corpus: weights for absent strata {sorted(unknown)}")
    rates = {
        s: (float(token_budget) * w / float(totals[s])) if totals[s] else 0.0
        for s, w in weights.items()
    }

    rate = None
    for s, r in rates.items():
        cond = F.col(strata_col) == s
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(0.0) if rate is None else rate.otherwise(F.lit(0.0))

    max_epochs = int(max(rates.values(), default=0.0)) + 1
    epochs = F.sequence(F.lit(0), F.least(F.floor(rate), F.lit(max_epochs)))
    out = base.withColumn("__rate", rate).where(F.col("__rate") > 0)
    out = out.withColumn("epoch", F.explode(epochs))
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (u32 + 0.5) / float(1 << 32)
    # epochs below floor(rate) are full copies; the last is fractional
    return out.where(
        (F.col("epoch") < F.floor("__rate")) | (u < F.col("__rate") - F.floor("__rate"))
    ).drop("__nt", "__rate")


def lm_perplexity(
    docs: DataFrame,
    reference: DataFrame,
    buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    public: documents are ranked by the perplexity of a small LM trained on
    a trusted reference corpus). Scalable form: a HASHED-vocabulary bigram
    LM with add-1 smoothing — tokens hash to ``buckets`` ids (md5, bounding
    LM state regardless of vocabulary growth), the reference fits
    p(b2|b1) = (c2(b1,b2)+1)/(c1(b1)+B), and each document scores the sum
    of its bigrams' log-probs. Per-bigram log-probs are QUANTIZED to
    integers (round(quant*lp)) so document scores are order-independent
    integer sums — bit-identical in any engine (the dsir_weights contract).

    Returns (id_col, n_bigrams, logprob_q); perplexity ~
    exp(-logprob_q / (quant * n_bigrams)), monotone in the returned score —
    filter on logprob_q / n_bigrams.

    Shuffle shape at 100TB: unigram counts are <= B rows (broadcast);
    bigram counts bound at B^2 but are corpus-sparse — they join the
    document bigram frame on (b1, b2), a NARROW equi-join of int pairs;
    scoring is one groupBy(id) integer sum.
    """
    b32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % buckets

    def bigram_frame(d: DataFrame) -> DataFrame:
        from chronon_spark.operators.dedup import normalize_text

        toks = d.select(
            F.col(id_col).alias("id"),
            F.transform(
                F.split(normalize_text(F.col(text_col)), " "), lambda t: b32(t)
            ).alias("tb"),
        )
        n = F.size("tb")
        pairs = F.when(
            n >= 2,
            F.zip_with(
                F.slice("tb", 1, n - 1),
                F.slice("tb", 2, n - 1),
                lambda a, b: F.struct(a.alias("b1"), b.alias("b2")),
            ),
        ).otherwise(F.array().cast("array<struct<b1:long,b2:long>>"))
        return toks.select("id", F.explode(pairs).alias("p")).select(
            "id", F.col("p.b1").alias("b1"), F.col("p.b2").alias("b2")
        )

    ref_big = bigram_frame(reference)
    c2 = ref_big.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = ref_big.groupBy("b1").agg(F.count(F.lit(1)).alias("c1"))

    corpus = bigram_frame(docs)
    lp_q = F.round(
        F.lit(float(quant))
        * (
            F.log((F.coalesce("c2", F.lit(0)) + 1).cast("double"))
            - F.log((F.coalesce("c1", F.lit(0)) + buckets).cast("double"))
        )
    ).cast("long")
    scored = (
        corpus.join(c2, ["b1", "b2"], "left")
        .join(F.broadcast(c1), "b1", "left")
        .withColumn("lp_q", lp_q)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp_q").alias("logprob_q"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("logprob_q", F.lit(0)).cast("long").alias("logprob_q"),
        )
    )


def _nb_features(
    d: DataFrame, text_col: str, id_col: str, buckets: int
) -> DataFrame:
    """Hashed unigram + bigram feature occurrences per document (the
    fastText ``wordNgrams=2`` feature space, Joulin et al. 2016): tokens
    hash to ``buckets`` unigram ids, adjacent-token pairs to a second
    ``buckets``-sized band offset by ``buckets`` — total feature space
    2*buckets regardless of vocabulary. One native pass, one explode."""
    from chronon_spark.operators.dedup import normalize_text

    b32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % buckets
    toks = d.select(
        F.col(id_col).alias("id"),
        F.when(
            F.length(normalize_text(F.col(text_col))) > 0,
            F.split(normalize_text(F.col(text_col)), " "),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("tk"),
    )
    n = F.size("tk")
    uni = F.transform(F.col("tk"), lambda t: b32(t))
    big = F.when(
        n >= 2,
        F.zip_with(
            F.slice("tk", 1, n - 1),
            F.slice("tk", 2, n - 1),
            lambda a, b: F.lit(buckets) + b32(F.concat(a, F.lit(" "), b)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return toks.select("id", F.explode(F.concat(uni, big)).alias("f"))


def nb_classifier_train(
    docs: DataFrame,
    label_col: str = "lang",
    buckets: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Train a fastText-style supervised linear text classifier — the
    quality/domain classifier slot of a pre-training pipeline (GPT-3 /
    LLaMA-style "looks like the reference corpus" filters; Joulin et al.
    2016) — as a multinomial Naive Bayes over hashed unigram+bigram
    features with add-1 smoothing. NB instead of SGD because training is
    then pure integer counting: per-(label, feature) counts and label
    totals are exact under ANY aggregation order, and the per-feature
    log-weights round(quant*(ln(c+1) - ln(T+2B))) are bit-identical in
    every engine (the lm_perplexity / dsir_weights contract) — so the
    trained model itself is deterministic and SQL-replicable, which no
    float-SGD trainer can promise.

    Returns ``(weights, label_stats)``: weights = (label, f, weight_q);
    label_stats = (label, default_q, prior_q) where default_q is the
    unseen-feature weight for that label and prior_q the quantized
    log-prior. Both frames are bounded (L x 2*buckets and L rows) —
    broadcastable at any corpus scale.
    """
    feats = _nb_features(docs, text_col, id_col, buckets)
    labeled = feats.join(
        docs.select(F.col(id_col).alias("id"), F.col(label_col).alias("label")),
        "id",
    )
    cnt = labeled.groupBy("label", "f").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("label").agg(F.sum("c").alias("t"))
    denom = F.log((F.col("t") + 2 * buckets).cast("double"))
    weights = cnt.join(tot, "label").select(
        "label",
        "f",
        F.round(F.lit(float(quant)) * (F.log((F.col("c") + 1).cast("double")) - denom))
        .cast("long")
        .alias("weight_q"),
    )
    n_docs = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    n_total = docs.count()
    label_stats = tot.join(n_docs, "label").select(
        "label",
        F.round(-F.lit(float(quant)) * denom).cast("long").alias("default_q"),
        F.round(
            F.lit(float(quant))
            * (F.log(F.col("nl").cast("double")) - F.log(F.lit(float(n_total))))
        )
        .cast("long")
        .alias("prior_q"),
    )
    return weights, label_stats


def nb_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    label_stats: DataFrame,
    buckets: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a trained NB classifier: per-label score =
    prior_q + sum(matched feature weights) + (unmatched occurrences) x
    default_q — an INTEGER per (doc, label), so the argmax and margin are
    exact. Ties break to the lexicographically smallest label.

    Returns (id_col, n_feats, predicted_label, best_q, margin_q); margin_q
    is best minus runner-up (0 when only one label exists) — the
    classifier-confidence column a selection stage thresholds on.

    Shuffle shape at 100TB: the model (L x 2B weights + L stats) is
    BROADCAST; the feature explode never leaves its scan partitions until
    one groupBy(id, label) of narrow int rows; the label grid is
    |docs| x L. No corpus-sized sort, no window over the corpus.
    """
    feats = _nb_features(docs, text_col, id_col, buckets)
    nf = feats.groupBy("id").agg(F.count(F.lit(1)).alias("n_feats"))
    matched = (
        feats.join(F.broadcast(weights), "f")
        .groupBy("id", "label")
        .agg(F.sum("weight_q").alias("mq"), F.count(F.lit(1)).alias("n_m"))
    )
    grid = docs.select(F.col(id_col).alias("id")).crossJoin(
        F.broadcast(label_stats)
    )
    scores = (
        grid.join(nf, "id", "left")
        .join(matched, ["id", "label"], "left")
        .select(
            "id",
            "label",
            (
                F.col("prior_q")
                + F.coalesce("mq", F.lit(0))
                + (
                    F.coalesce("n_feats", F.lit(0)) - F.coalesce("n_m", F.lit(0))
                )
                * F.col("default_q")
            ).alias("score_q"),
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        )
    )
    best = scores.groupBy("id").agg(F.max("score_q").alias("best_q"))
    j = scores.join(best, "id")
    pred = j.groupBy("id").agg(
        F.min(F.when(F.col("score_q") == F.col("best_q"), F.col("label"))).alias(
            "predicted_label"
        ),
        F.max("best_q").alias("best_q"),
        F.max("n_feats").alias("n_feats"),
    )
    second = (
        j.join(pred.select("id", "predicted_label"), "id")
        .where(F.col("label") != F.col("predicted_label"))
        .groupBy("id")
        .agg(F.max("score_q").alias("second_q"))
    )
    return pred.join(second, "id", "left").select(
        F.col("id").alias(id_col),
        F.col("n_feats").cast("long").alias("n_feats"),
        "predicted_label",
        F.col("best_q").cast("long").alias("best_q"),
        (F.col("best_q") - F.coalesce("second_q", F.col("best_q")))
        .cast("long")
        .alias("margin_q"),
    )


def curate_pipeline(
    docs: DataFrame,
    stages: list[tuple],
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[dict]]:
    """Declarative corpus-curation pipeline: apply ``stages`` — a list of
    (name, callable) where each callable maps DataFrame -> DataFrame (rows
    it returns survive) — and return (final_df, report). The report has one
    {stage, rows_in, rows_out, dropped} entry per stage: the per-stage
    lineage a production corpus job records next to its output (the
    backfill-metrics contract of sources/tableio.py applied to curation).

    Counting strategy: each stage boundary is counted ONCE via a real
    action and the boundary frame is localCheckpoint()ed, so (a) the
    lineage numbers are the truth of THIS run, not a recomputation, and
    (b) stage N+1's plan starts from materialized stage-N output instead
    of re-running the whole prefix — the standard iterative-pipeline
    pattern (cf. dedup_components). At 100TB each boundary would be a
    partitioned table write (tableio) instead; the composition and report
    are identical.
    """
    report: list[dict] = []
    cur = docs.localCheckpoint()
    n = cur.count()
    for name, fn in stages:
        out = fn(cur).localCheckpoint()
        m = out.count()
        report.append(
            {"stage": name, "rows_in": n, "rows_out": m, "dropped": n - m}
        )
        cur, n = out, m
    return cur, report


def bm25_retrieve(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    quant: int = 1_000_000,
) -> DataFrame:
    """BM25 retrieval of the top-k corpus documents per query (Robertson &
    Zaragoza 2009, public) — the retrieval primitive behind RAG corpus
    prep and retrieval-based decontamination. Classic scoring:
    score(q, d) = sum over shared terms of idf(t) * tf_norm(t, d) with
    idf = ln((N - df + 0.5)/(df + 0.5) + 1) and
    tf_norm = tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)).

    Exactness contract: each (term, doc) contribution is QUANTIZED to an
    integer (round(quant * idf * tf_norm)) so per-pair scores are integer
    sums — order-independent, bit-identical cross-engine (the dsir/lm
    pattern); ranking ties break on doc id.

    Shuffle shape at 100TB: corpus term frequencies are one groupBy over
    narrow (doc, term) rows; document-frequency and avgdl aggregates are
    bounded; the QUERY term set is tiny by construction (queries are a
    benchmark/eval set) and BROADCASTS into the scoring join, so the
    corpus never shuffles for candidates — only per-(query, doc) integer
    partial scores hit the final exchange. Top-k per query is a bounded
    window (k neighbors per query).
    """
    from chronon_spark.operators.dedup import normalize_text

    def terms(d: DataFrame, idc: str, txt: str, out_id: str) -> DataFrame:
        return d.select(
            F.col(idc).alias(out_id),
            F.explode(F.split(normalize_text(F.col(txt)), " ")).alias("t"),
        ).where(F.length("t") > 0)

    corpus_t = terms(docs, id_col, text_col, "did")
    tf = corpus_t.groupBy("did", "t").agg(F.count(F.lit(1)).alias("tf"))
    dl = corpus_t.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))

    q_t = terms(queries, query_id_col, query_text_col, "qid").distinct()

    scored_terms = (
        tf.join(F.broadcast(q_t), "t")
        .join(F.broadcast(df_t.join(F.broadcast(q_t.select("t").distinct()), "t")), "t")
        .join(dl, "did")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = F.round(F.lit(float(quant)) * idf * tf_norm).cast("long")
    pair = (
        scored_terms.withColumn("c_q", contrib)
        .groupBy("qid", "did")
        .agg(F.sum("c_q").alias("score_q"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_q"), F.asc("did"))
    return (
        pair.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("did").alias(id_col),
            F.col("score_q").cast("long"),
            F.col("rank").cast("int"),
        )
    )


# --- declarative stage registry (the CLI `curate` subcommand's vocabulary) ---
# Each factory takes a plain params dict (JSON-able, straight from a conf
# module) and returns a DataFrame -> DataFrame stage for curate_pipeline.
# Text columns default to the documents-table shape (doc_id, text).


def _stage_c4(params: dict):
    from chronon_spark.operators.text_ops import c4_clean

    p = dict(params)
    id_col = p.pop("id_col", "doc_id")
    text_col = p.pop("text_col", "text")
    use_cleaned = p.pop("use_cleaned_text", True)

    def stage(df: DataFrame) -> DataFrame:
        scored = c4_clean(df, text_col=text_col, id_col=id_col, params=p or None)
        kept = scored.where("c4_keep").select(id_col, "cleaned_text")
        if use_cleaned:
            # train on what survived the line filter, not the raw page
            cols = [
                F.col("cleaned_text").alias(text_col) if c == text_col else F.col(c)
                for c in df.columns
            ]
            return df.drop(text_col).join(kept, id_col).select(*cols)
        return df.join(kept.select(id_col), id_col)

    return stage


def _stage_gopher(params: dict):
    from chronon_spark.operators.text_ops import gopher_filter

    p = dict(params)
    id_col = p.pop("id_col", "doc_id")
    text_col = p.pop("text_col", "text")

    def stage(df: DataFrame) -> DataFrame:
        kept = (
            gopher_filter(df, text_col=text_col, id_col=id_col, thresholds=p or None)
            .where("gopher_keep")
            .select(id_col)
        )
        return df.join(kept, id_col)

    return stage


def _stage_dedup_exact(params: dict):
    from chronon_spark.operators.dedup import normalize_text

    id_col = params.get("id_col", "doc_id")
    text_col = params.get("text_col", "text")

    def stage(df: DataFrame) -> DataFrame:
        keep = (
            df.groupBy(normalize_text(F.col(text_col)).alias("__nt"))
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        return df.join(keep, id_col)

    return stage


def _stage_decontaminate(params: dict):
    id_col = params.get("id_col", "doc_id")
    text_col = params.get("text_col", "text")
    where = params["benchmark_where"]  # e.g. "doc_id % 37 = 0"
    n = params.get("n", 8)
    max_hits = params.get("max_hits", 0)

    def stage(df: DataFrame) -> DataFrame:
        bench = df.where(where)
        deco = decontaminate(df, bench, n=n, id_col=id_col, text_col=text_col)
        return df.join(
            deco.where(F.col("n_hits") <= max_hits).select(id_col), id_col
        )

    return stage


def _stage_transcript_quality(params: dict):
    from chronon_spark.operators.sessionize import transcript_quality

    p = dict(params)
    conv_col = p.pop("conv_col", "conv_id")
    turn_col = p.pop("turn_col", "turn_idx")
    role_col = p.pop("role_col", "role")
    text_col = p.pop("text_col", "text")

    def stage(df: DataFrame) -> DataFrame:
        kept = (
            transcript_quality(
                df, conv_col=conv_col, turn_col=turn_col,
                role_col=role_col, text_col=text_col, params=p or None,
            )
            .where("tq_keep")
            .select(conv_col)
        )
        return df.join(kept, conv_col)

    return stage


def _stage_scrub_pii(params: dict):
    """Text REWRITE stage (like c4's cleaned-text mode): every row survives,
    emails/phones/IPs in the text column are redacted in place."""
    from chronon_spark.operators.text_ops import scrub_pii

    text_col = params.get("text_col", "text")

    def stage(df: DataFrame) -> DataFrame:
        return df.withColumn(text_col, scrub_pii(F.col(text_col)))

    return stage


def _stage_classifier(params: dict):
    """Supervised classifier selection (the GPT-3/LLaMA quality-classifier
    stage): train the NB classifier on the incoming frame's ``label_col``,
    self-score, and keep documents predicted into ``keep_labels`` with
    margin >= ``min_margin``."""
    p = dict(params)
    id_col = p.pop("id_col", "doc_id")
    text_col = p.pop("text_col", "text")
    label_col = p.pop("label_col", "lang")
    keep_labels = p.pop("keep_labels", None)
    if not keep_labels:
        raise ValueError("classifier_select stage requires keep_labels")
    min_margin = int(p.pop("min_margin", 0))
    buckets = int(p.pop("buckets", 2048))
    if p:
        raise ValueError(f"unknown classifier_select params: {sorted(p)}")

    def stage(df: DataFrame) -> DataFrame:
        w, s = nb_classifier_train(
            df, label_col=label_col, buckets=buckets, text_col=text_col, id_col=id_col
        )
        scored = nb_classifier_score(
            df, w, s, buckets=buckets, text_col=text_col, id_col=id_col
        )
        kept = scored.where(
            F.col("predicted_label").isin(list(keep_labels))
            & (F.col("margin_q") >= min_margin)
        ).select(id_col)
        return df.join(kept, id_col)

    return stage


CURATION_STAGES = {
    "scrub_pii": _stage_scrub_pii,
    "c4": _stage_c4,
    "gopher": _stage_gopher,
    "dedup_exact": _stage_dedup_exact,
    "decontaminate": _stage_decontaminate,
    "transcript_quality": _stage_transcript_quality,
    "classifier_select": _stage_classifier,
}


def build_stages(specs: list) -> list:
    """Resolve a declarative stage list — [(name, params_dict), ...] from a
    conf module — into curate_pipeline's (label, callable) form. Unknown
    names fail fast with the available vocabulary."""
    out = []
    for spec in specs:
        name, params = (spec, {}) if isinstance(spec, str) else spec
        if name not in CURATION_STAGES:
            raise ValueError(
                f"unknown curation stage '{name}'; available: "
                f"{sorted(CURATION_STAGES)}"
            )
        out.append((name, CURATION_STAGES[name](dict(params or {}))))
    return out


def chunk_documents(
    docs: DataFrame,
    budget: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budgeted document chunking with overlap — the inverse of
    ``pack_sequences``: long documents split into windows of ``budget``
    whitespace tokens, each chunk re-starting ``overlap`` tokens before the
    previous one ended (the standard pretraining/RAG context-window prep).

    Returns one row per (doc, chunk): (id_col, chunk_idx, chunk_text,
    chunk_tokens, start_token). The last chunk may be short; a document
    shorter than ``budget`` yields exactly one chunk; an empty document
    yields one empty chunk (chunk_tokens = 0) so no document silently
    disappears from the corpus.

    Plan shape (100TB): ZERO shuffles — chunk windows derive from the
    word array with native HOFs (sequence -> slice -> array_join) and a
    posexplode; rows multiply, data never moves between executors, scan
    partitioning is preserved.
    """
    if overlap >= budget:
        raise ValueError(f"overlap {overlap} must be < budget {budget}")
    step = budget - overlap
    from chronon_spark.operators.dedup import normalize_text

    nt = normalize_text(F.coalesce(F.col(text_col), F.lit("")))
    ws = F.when(F.length(nt) > 0, F.split(nt, " ")).otherwise(
        F.array().cast("array<string>")
    )
    base0 = docs.select(F.col(id_col), ws.alias("__ws"), F.size(ws).alias("__nw"))
    # chunk starts: 0, step, 2*step, ... while start < max(n_words, 1)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.col("__nw") - overlap) / F.lit(float(step))).cast("int"),
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * step, F.lit(step))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.array_join(F.slice(F.col("__ws"), s + 1, budget), " ").alias("txt"),
            F.least(F.lit(budget), F.col("__nw") - s).alias("ntok"),
        ),
    )
    base = base0.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c"))
    return base.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.txt").alias("chunk_text"),
        F.greatest(F.lit(0), F.col("c.ntok")).cast("long").alias("chunk_tokens"),
        F.col("c.start").cast("long").alias("start_token"),
    )


def shuffle_corpus(
    docs: DataFrame,
    seed: str = "shuffle",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training shuffle: every row receives a stable
    pseudorandom permutation position keyed on md5(seed:id) — the standard
    pre-training corpus shuffle (epoch reshuffles = change the seed),
    reproducible across runs and engines.

    No global-order window (which would collapse to ONE partition):
    the md5 key's first two hex chars split the corpus into 256 UNIFORM
    range-buckets whose lexicographic order matches the full-key order, so
    a bounded per-bucket count collect + exclusive prefix offsets
    broadcast back, and the within-bucket rank runs as a window
    PARTITIONED BY bucket — the pack_sequences prefix-sum pattern, with
    hash-uniform buckets instead of id-range ones (no skew by
    construction). Ties (duplicate ids) break on the id itself.

    Returns the input columns + (shuffle_key, shuffle_pos); positions are
    exactly 0..N-1.
    """
    from pyspark.sql.window import Window as _W

    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    bucket = F.conv(F.substring(key, 1, 2), 16, 10).cast("long")
    bucketed = docs.select(
        "*", key.alias("shuffle_key"), bucket.alias("__b")
    ).persist()
    from chronon_spark.plans import cache as _plan_cache

    _plan_cache.register(bucketed)

    counts = {
        r["__b"]: r["c"]
        for r in bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    run = 0
    offsets = []
    for b in range(256):
        offsets.append((b, run))
        run += counts.get(b, 0)
    spark = docs.sparkSession
    off_df = spark.createDataFrame(offsets, "__b long, __off long")

    w = _W.partitionBy("__b").orderBy("shuffle_key", id_col)
    return (
        bucketed.join(F.broadcast(off_df), "__b")
        .withColumn(
            "shuffle_pos", (F.col("__off") + F.row_number().over(w) - 1).cast("long")
        )
        .drop("__b", "__off")
    )
