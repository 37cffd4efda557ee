"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame plans (no Python in the hot path):

- exact:          hash-groupBy on normalized content
- ngram Jaccard:  shingle -> shared-shingle candidate join -> exact Jaccard
- MinHash + LSH:  shingle -> per-permutation min-hash -> band buckets ->
                  bucket join -> candidate pairs (verify with exact Jaccard)
- SimHash:        per-token 64-bit hashes -> bitwise majority -> banded
                  hamming candidate join

Scale notes: candidate generation is always a *bucket equi-join* (shuffle on
band/bucket key), never a cross join; the O(n^2) step only touches documents
sharing a bucket. Shingle/minhash tables explode ~L rows per doc — at 100TB
prefer 9-word shingles + 16 perms (4 bands x 4 rows) which keeps the
explosion linear in corpus token count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace — the canonical form for exact dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """One row per distinct content: canonical (min) id + duplicate count."""
    key = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.withColumn("__h", F.md5(key))
        .groupBy("__h")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .withColumnRenamed("__h", "content_hash")
    )


def _spread_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-spread the document frame by id before a CPU-heavy text explode.

    A compact parquet source (one file / few row groups) scans as a handful
    of partitions, which would pin the whole shingle/token explosion on a
    few cores. Repartitioning by id shuffles raw text ONCE — roughly n x
    cheaper than shuffling the exploded shingles — and the resulting
    HashPartitioning(id) is a subset of every downstream grouping key
    ((id, shingle) distinct, groupBy(id) signatures), so Catalyst inserts no
    further exchange. Inputs already wider than the session's parallelism
    (the 100TB case) pass through untouched.
    """
    parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parts:
        df = df.repartition(parts, id_col)
    return df


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 8) -> DataFrame:
    """(id, shingle) rows: n-word sliding windows over whitespace tokens."""
    df = _spread_by_id(df, id_col)
    words = F.split(normalize_text(F.col(text_col)), " ")
    # docs shorter than n words have no shingles: sequence(1, 0) would be the
    # DESCENDING array [1, 0] and slice(words, 0, n) then crashes the job
    sh = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share >=1 shingle.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from shingle-set
    sizes — one shuffle on shingle (candidate join) + one on the pair key.

    ``max_doc_freq``: the 100TB guard. A shingle appearing in d documents
    contributes d^2 candidate pairs inside ONE join group — boilerplate
    shingles (headers, license blocks) go quadratic. Capping drops shingles
    with document frequency > max_doc_freq from BOTH the candidate join and
    the set sizes, so jaccard stays a consistent metric over the capped
    shingle sets (near-dup pairs share plenty of low-DF shingles; the
    candidates lost to the cap are precisely the meaningless ones). None =
    exact/uncapped — correct at test scale, hazardous at web scale.
    """
    sh = shingles(df, text_col, id_col, n)
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    from chronon_spark.plans.cache import register

    sh = register(sh.cache())
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "shared", "sz_a", "sz_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def minhash_masks(num_perm: int) -> list[int]:
    """Fixed 60-bit XOR masks, one per permutation: int(md5("perm-i")[:15],
    16). Deterministic and renderable as literals in an oracle SQL."""
    import hashlib

    return [
        int(hashlib.md5(f"perm-{i}".encode()).hexdigest()[:15], 16)
        for i in range(num_perm)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    num_perm: int = 16,
) -> DataFrame:
    """(id, perm, minhash:bigint) — permutation i is a fixed 60-bit XOR mask
    over ONE md5-derived shingle hash: h = int(md5(shingle)[:15], 16),
    mh_i = h XOR mask_i. XOR by a constant is a bijection of the hash space,
    so each mask induces an independent min-wise permutation, and md5 +
    0x-cast + xor are bit-identical in DuckDB (oracle-checkable — same trick
    as simhash). Cost: one md5 per shingle instead of num_perm, and the
    num_perm minima are columns of a single groupBy(id) pass (no
    shingle x perm row explosion), unpivoted to rows afterwards."""
    sh = shingles(df, text_col, id_col, n)
    h = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("bigint")
    masks = minhash_masks(num_perm)
    agg = sh.withColumn("__h", h).groupBy("id").agg(
        *[
            F.min(F.col("__h").bitwiseXOR(F.lit(m))).alias(f"m{i}")
            for i, m in enumerate(masks)
        ]
    )
    stack_args = ", ".join(f"{i}, m{i}" for i in range(num_perm))
    return agg.selectExpr(
        "id", f"stack({num_perm}, {stack_args}) as (perm, minhash)"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    num_perm: int = 16,
    bands: int = 4,
    min_est_jaccard: float = 0.0,
) -> DataFrame:
    """LSH candidate pairs: signatures split into ``bands`` bands of
    num_perm/bands rows; docs sharing any band-key become candidates; the
    estimated Jaccard = fraction of agreeing permutations."""
    from pyspark.storagelevel import StorageLevel

    rows_per_band = num_perm // bands
    # the signature table feeds band-keying AND both sides of the estimate
    # join — persist it so the shingle x perm explosion runs once
    from chronon_spark.plans.cache import register

    sig = register(
        minhash_signatures(df, text_col, id_col, n, num_perm).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    sig = sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    # zero-pad the perm so lexicographic order == numeric order (keeps the
    # band key reproducible by a SQL oracle's ORDER BY perm)
    band_keys = sig.groupBy("id", "band").agg(
        F.md5(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(":", F.lpad(F.col("perm").cast("string"), 2, "0"), "minhash")
                    )
                ),
                ",",
            )
        ).alias("band_key")
    )
    a, b = band_keys.alias("a"), band_keys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # estimate jaccard = agreeing perms / num_perm
    sa = sig.select(F.col("id").alias("id_a"), "perm", F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col("id").alias("id_b"), "perm", F.col("minhash").alias("mh_b"))
    est = (
        cand.join(sa, "id_a")
        .join(sb, ["id_b", "perm"])
        .groupBy("id_a", "id_b")
        .agg((F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0)) / num_perm).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= min_est_jaccard)
    )
    return est.select("id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard"))


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: per-token md5-derived hash, bitwise weighted majority.

    The 64 token-hash bits come from the first 16 hex chars of md5 (two
    32-bit halves via base-16 conv) — md5 is bit-identical in Spark and
    DuckDB, so the whole pipeline is replicable by a SQL oracle (the same
    trick minhash_signatures uses). Plan shape: explode tokens -> one
    groupBy with ``bits`` conditional sums (all inside whole-stage codegen)
    -> bit assembly via bitwise ops.
    """
    words = F.split(normalize_text(F.col(text_col)), " ")
    tok = _spread_by_id(df, id_col).select(
        F.col(id_col).alias("id"), F.explode(words).alias("w")
    ).where(F.col("w") != "")
    md = F.md5(F.col("w"))
    hi = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
    sums = [
        F.sum(
            F.when(
                F.shiftright(lo if b < 32 else hi, b % 32).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("id").agg(*sums)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return agg.select("id", sig.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup candidates: 4x16-bit bands of the simhash as LSH buckets
    (any pair within hamming distance 3 shares at least one exact band by
    pigeonhole; wider distances are caught probabilistically), then exact
    hamming filter via bit_count(xor)."""
    s = simhash(df, text_col, id_col)
    bandcols = [
        F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias(f"band{i}")
        for i in range(4)
    ]
    sb = s.select("id", "simhash", *bandcols)
    pairs = None
    for i in range(4):
        a = sb.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"band{i}").alias("bk"))
        b = sb.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"band{i}").alias("bk"))
        p = a.join(b, "bk").where(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    out = (
        pairs.distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return out


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
    allow_partial: bool = False,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the step
    that turns pairwise matches into DEDUP GROUPS (keep min-id canonical,
    drop the rest). Returns (id, component_id) for every id in ``pairs``.

    Iterative min-label propagation: every node repeatedly adopts the
    minimum label in its neighborhood until a fixpoint. Each round is one
    equi-join + groupBy-min (all shuffles on the node id); rounds needed =
    graph diameter, and near-dup components are small cliques/chains, so
    this converges in a handful of rounds even at web scale. Each round is
    localCheckpoint()ed — iterative self-referencing plans otherwise grow
    their lineage (and re-resolve ambiguously) every round — and
    convergence is detected with one count per round: the standard Spark
    pattern for an iterative algorithm the DataFrame algebra cannot
    express in one query.

    If the graph has not converged after ``max_iterations`` rounds (diameter
    exceeds the budget — e.g. one very long dup chain), the result would
    silently contain SPLIT components, so this raises unless
    ``allow_partial=True`` (which logs a warning and returns the partial
    labels instead).

    ``checkpoint_dir``: on a real multi-executor cluster pass a reliable
    (HDFS/S3) path — localCheckpoint stores blocks on executors, so one
    executor loss kills every later round. With a dir set, each round uses a
    reliable ``checkpoint()`` into it instead (reference concern: long
    iterative lineage; Spark's standard GraphX-style pattern).
    """
    import warnings

    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else df.localCheckpoint()

    e = _ckpt(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = _ckpt(
        e.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component_id", F.col("id"))
    )
    changed = 0
    for _ in range(max_iterations):
        neigh = (
            e.join(labels.select(F.col("id").alias("dst"), "component_id"), "dst")
            .groupBy("src")
            .agg(F.min("component_id").alias("n_min"))
            .select(F.col("src").alias("id"), "n_min")
        )
        new_labels = _ckpt(
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component_id"), F.coalesce(F.col("n_min"), F.col("component_id"))
                ).alias("component_id"),
            )
        )
        changed = (
            new_labels.select("id", F.col("component_id").alias("new_c"))
            .join(labels, "id")
            .where(F.col("new_c") != F.col("component_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"dedup_components did not converge in {max_iterations} rounds "
            f"({changed} labels still changing): component ids would be split. "
            "Raise max_iterations (rounds needed = graph diameter)."
        )
        if not allow_partial:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning)
    return labels.select("id", "component_id")


def dedup_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: Column | None = None,
    **cc_kwargs,
) -> DataFrame:
    """Keep-best cluster dedup: turn the near-dup pair graph into dedup
    DECISIONS. Connected components label every matched doc; within each
    component the CANONICAL document is the argmax of ``quality_col``
    (default: document length — the keep-longest policy of public
    RefinedWeb/MassiveText-style pipelines; ties -> min id); docs in no
    pair are their own canonical. Returns one row per input doc:
    (id_col, component_id, canonical_id, is_canonical) — filtering
    ``is_canonical`` IS the dedup; the mapping rows are the lineage a
    100TB pipeline keeps for provenance.

    Shuffle shape: components come from dedup_components (pair-graph-sized,
    sparse); the quality argmax is one window per component over the
    matched docs only; the corpus joins the (id -> component) map on its
    key — singletons never enter the component shuffle.
    """
    quality = quality_col if quality_col is not None else F.length(F.col("text"))
    comp = dedup_components(pairs, **cc_kwargs)
    labeled = docs.select(F.col(id_col).alias("id"), quality.alias("__q")).join(
        comp, "id", "left"
    )
    labeled = labeled.withColumn(
        "component_id", F.coalesce("component_id", F.col("id"))
    )
    w = Window.partitionBy("component_id").orderBy(F.desc("__q"), F.asc("id"))
    return (
        labeled.withColumn(
            "canonical_id", F.first("id").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        )
        .select(
            F.col("id").alias(id_col),
            "component_id",
            "canonical_id",
            (F.col("id") == F.col("canonical_id")).alias("is_canonical"),
        )
    )
