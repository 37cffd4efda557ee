"""Similarity search over embedding columns (array<float>).

- ``brute_force_knn``: exact top-k by cosine — broadcast the (small) query
  side, dot products via zip_with/aggregate higher-order functions (JVM-side,
  no Python). The correctness baseline.
- ``lsh_knn``: random-hyperplane LSH — deterministic pseudo-random planes
  derived from xxhash64 (no RNG state to ship), sign-bit signatures, bucket
  equi-join + exact re-rank within buckets. The scale path: candidate
  generation is a shuffle on the bucket key, never a cross join.
- ``cosine_neardup_pairs``: embedding near-duplicate detection (pairs with
  cosine >= threshold) over LSH buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SW


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-spread a compact vector frame before CPU-heavy array work.

    Higher-order array expressions (zip_with / aggregate) are evaluated
    INTERPRETED — Spark never codegens them — so dot products and norms are
    the most expensive per-row work in this module by far. A small parquet
    source scans as one or two partitions, which would pin that interpreted
    evaluation on as many cores. One cheap row-shuffle by id fans it out;
    inputs already wider than the session's parallelism (the 100TB case)
    pass through untouched.
    """
    parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parts:
        df = df.repartition(parts, id_col)
    return df


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def brute_force_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query. queries must be broadcastable.

    Norms are computed ONCE per vector (before the pair join) rather than
    once per pair — same left-fold over the same array, so the rounded
    similarities are bit-identical, at 1/|pairs| of the interpreted-eval
    cost. The vector side is hash-spread so the per-pair dot products run
    on every core."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("__qv")
    )
    v = _spread(vectors, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    if metric == "cosine":
        q = q.withColumn("__qn", _norm(F.col("__qv")))
        v = v.withColumn("__vn", _norm(F.col("__v")))
    joined = v.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    if metric == "cosine":
        sim = _dot(F.col("__qv"), F.col("__v")) / (F.col("__qn") * F.col("__vn"))
    elif metric == "dot":
        sim = _dot(F.col("__qv"), F.col("__v"))
    else:
        raise ValueError(metric)
    scored = joined.withColumn("sim", F.round(sim, 6))
    w = SW.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _plane_component(plane: Column, dim: Column, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1].

    Components derive from md5 bits (first 15 hex chars -> non-negative
    60-bit long) rather than xxhash64: md5 is bit-identical in Spark and
    DuckDB, so a SQL oracle reproduces every signature — the same trick
    simhash uses (operators/dedup.py). Ref: quality of the hyperplane
    family only needs pairwise-independent uniform components."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", plane, dim, F.lit(seed))), 1, 15), 16, 10
    ).cast("long")
    return (F.pmod(h, F.lit(20011)).cast("double") / 10005.0) - 1.0


def rh_signature(
    df: DataFrame, vec_col: str, n_planes: int = 16, seed: int = 7
) -> DataFrame:
    """Random-hyperplane sign bits packed into one long column ``rh_sig``."""
    vec = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_component(F.lit(p), i, seed),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(2**p).cast("long")).otherwise(F.lit(0).cast("long")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn("rh_sig", sig)


def lsh_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int | None = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any signature band
    with the query; exact cosine re-rank within candidates. Recall grows
    with bands; cost stays ~ bucket sizes (shuffle join on band key).
    ``k=None`` returns ALL scored candidates unranked (no rank column) for
    threshold-style consumers."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        # spread first: the 16 interpreted plane-dots per row must not run
        # on a single scan partition; norm once per id, not per candidate
        s = rh_signature(_spread(df, id_col), vec_col, n_planes, seed).select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.col(vec_col).alias(f"{prefix}_v"),
            _norm(F.col(vec_col)).alias(f"{prefix}_norm"),
            "rh_sig",
        )
        bandrows = s.select(
            f"{prefix}_id",
            f"{prefix}_v",
            f"{prefix}_norm",
            F.explode(
                F.array(
                    *[
                        F.concat_ws(
                            ":",
                            F.lit(i),
                            F.shiftrightunsigned(F.col("rh_sig"), bits_per_band * i)
                            .bitwiseAND(F.lit(mask))
                            .cast("string"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("band_key"),
        )
        return bandrows

    qb = banded(queries, "q")
    vb = banded(vectors, "n")
    cand = (
        qb.join(vb, "band_key")
        .where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "q_v", "q_norm", "n_id", "n_v", "n_norm")
        .distinct()
    )
    sim = _dot(F.col("q_v"), F.col("n_v")) / (F.col("q_norm") * F.col("n_norm"))
    scored = cand.withColumn("sim", F.round(sim, 6))
    if k is None:
        # threshold-style callers filter on sim themselves — skip the per-key
        # ranking window entirely (a hot bucket would otherwise sort millions
        # of candidate pairs in one reducer just to keep them all)
        return scored.select(
            F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "sim"
        )
    w = SW.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("q_id").alias("query_id"), F.col("n_id").alias("neighbor_id"), "sim", "rank")
    )


def ivf_assign(
    vectors: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: fit KMeans (Spark MLlib, JVM-side) on the
    vectors (optionally a sample at 100TB), then assign every vector to its
    nearest centroid with native expressions (broadcast centroid table +
    min_by over squared distance — no Python in the path).

    Returns (assignments[id, list_id, vec], centroids[list_id, centroid]).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_src = vectors.sample(sample_fraction, seed=seed) if sample_fraction else vectors
    feats = fit_src.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_lists, seed=seed).fit(feats)
    spark = vectors.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        f"list_id int, centroid array<double>",
    )

    def _sqdist(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = _spread(vectors, id_col).crossJoin(F.broadcast(cents)).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.struct(
            _sqdist(F.col(vec_col), F.col("centroid")).alias("d"), F.col("list_id").alias("l")
        ).alias("dl"),
    )
    assign = scored.groupBy("id", "vec").agg(F.min_by(F.col("dl")["l"], F.col("dl")["d"]).alias("list_id"))
    return assign.select("id", "list_id", "vec"), cents


def ivf_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate kNN: probe the ``nprobe`` nearest inverted lists per
    query, exact-cosine re-rank candidates. ``nprobe == n_lists`` degrades
    gracefully to EXACT search (every list probed), which is the oracle
    gate; smaller nprobe trades recall for touching ~nprobe/n_lists of the
    data — the IVF scale shape (candidate generation is an equi-join on
    list_id, never a cross join against the full corpus).
    """
    assign, cents = ivf_assign(vectors, n_lists, id_col, vec_col, seed)

    def _sqdist(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    qprobe = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_v"))
        .crossJoin(F.broadcast(cents))
        .withColumn("d", _sqdist(F.col("q_v"), F.col("centroid")))
        .withColumn(
            "rnk",
            F.row_number().over(SW.partitionBy("q_id").orderBy(F.col("d"), F.col("list_id"))),
        )
        .where(F.col("rnk") <= nprobe)
        .select("q_id", "q_v", "list_id")
    )
    cand = (
        qprobe.withColumn("__qn", _norm(F.col("q_v")))
        .join(assign.withColumn("__n", _norm(F.col("vec"))), "list_id")
        .where(F.col("q_id") != F.col("id"))
    )
    sim = _dot(F.col("q_v"), F.col("vec")) / (F.col("__qn") * F.col("__n"))
    scored = cand.withColumn("sim", F.round(sim, 6))
    w = SW.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            "sim",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-duplicates: LSH-bucketed candidate pairs with exact
    cosine >= threshold. For the exact (small-scale / oracle) variant use a
    self brute_force_knn + filter."""
    res = lsh_knn(vectors, vectors, k=None, id_col=id_col, vec_col=vec_col,
                  n_planes=n_planes, bands=bands, seed=seed)
    return (
        res.where((F.col("sim") >= threshold) & (F.col("query_id") < F.col("neighbor_id")))
        .select(F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b"), "sim")
    )


def hard_negatives(
    vectors: DataFrame,
    anchors: DataFrame | None = None,
    k_neg: int = 3,
    pos_eps: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Contrastive-training triplet mining (the DPR / SimCSE / sentence-
    transformers data-prep step, public practice): per anchor, the single
    most-similar vector with cosine >= ``pos_eps`` is its POSITIVE (a
    near-duplicate / paraphrase), and the ``k_neg`` most-similar vectors
    BELOW ``pos_eps`` are its HARD NEGATIVES — similar enough to be
    informative, dissimilar enough to be wrong. Anchors without a positive
    still emit negatives (consumers pair them with in-batch positives).

    Output: (anchor_id, neighbor_id, sim, kind 'positive'|'negative',
    rank) — rank is per (anchor, kind), ties broken by neighbor_id, sim
    rounded to 6 (the knn_cosine cross-engine contract: Spark's aggregate
    left-fold and DuckDB's list_sum fold the same order, so the doubles
    are bit-identical).

    Scale shape: with ``candidate_pairs`` (a (query_id, neighbor_id) frame
    from lsh_knn / ivf_assign bucketing) only candidates are scored — the
    100TB path; without it, anchors broadcast into an exact brute-force
    scoring pass (the labeled baseline, same stance as brute_force_knn)."""
    a_df = vectors if anchors is None else anchors
    q = a_df.select(F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("__qv"))
    v = _spread(vectors, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
    )
    if candidate_pairs is not None:
        pairs = candidate_pairs.select(
            F.col("query_id").alias("anchor_id"), "neighbor_id"
        ).join(q, "anchor_id").join(v, "neighbor_id")
    else:
        pairs = v.crossJoin(F.broadcast(q))
    pairs = pairs.where(F.col("anchor_id") != F.col("neighbor_id"))
    q_n = _norm(F.col("__qv"))
    v_n = _norm(F.col("__v"))
    sim = F.round(_dot(F.col("__qv"), F.col("__v")) / (q_n * v_n), 6)
    scored = pairs.select("anchor_id", "neighbor_id", sim.alias("sim"))
    w = SW.partitionBy("anchor_id", "__kind").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.withColumn(
        "__kind", F.when(F.col("sim") >= pos_eps, "positive").otherwise("negative")
    ).withColumn("rank", F.row_number().over(w))
    keep = ((F.col("__kind") == "positive") & (F.col("rank") == 1)) | (
        (F.col("__kind") == "negative") & (F.col("rank") <= k_neg)
    )
    return ranked.where(keep).select(
        "anchor_id", "neighbor_id", "sim", F.col("__kind").alias("kind"), "rank"
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product over quantized (long) vectors — order-
    independent and bit-identical in any engine, unlike float folds."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def semdedup(
    vectors: DataFrame,
    eps: float = 0.9,
    n_clusters: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic deduplication by
    k-means clustering the embedding space, then dropping within-cluster
    pairs whose cosine exceeds ``eps`` — keeping, per the paper, the
    example FARTHEST from its cluster centroid (low centroid similarity =
    more informative outlier).

    Determinism contract (the repo-wide oracle pattern): components are
    QUANTIZED to integers (round(x*quant)), so every squared distance and
    dot product is an exact integer sum — order-independent and
    bit-identical in DuckDB; k-means runs a FIXED number of Lloyd rounds
    from deterministic seeds (the ``n_clusters`` vectors with smallest
    (md5(id), id)), with centroids rounded back to the integer grid each
    round (half-away-from-zero, both engines' round()); cosines divide
    integer dots under one round(x, 6). The fitted model and every
    keep/drop verdict are therefore reproducible bit-for-bit across
    engines and partitionings.

    Keep rule: a vector is dropped iff some same-cluster vector with
    strictly smaller (centroid_sim, id) has cosine >= eps with it — the
    non-iterative reading of the paper's keep-one-per-duplicate-set (a
    deterministic tournament rather than a sequential greedy, so it needs
    one self-join, not a per-cluster loop).

    Returns (id_col, cluster_id, centroid_sim, is_kept).

    Scale shape (100TB): the model is ``n_clusters`` centroids (broadcast,
    recomputed via an explode + groupBy of bounded k x dim rows per
    round); candidate pairs are WITHIN-CLUSTER self-joins on cluster_id —
    size sum_c (N_c^2), never the corpus square; choose n_clusters ~
    N/target_cluster_size so clusters stay bounded (the paper's regime),
    and the pair stage is an equi-join Spark shuffles by cluster.
    """
    spark = vectors.sparkSession
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * quant).cast("long")
    )
    q = _spread(
        vectors.select(F.col(id_col).alias("id"), qv.alias("qv")), "id"
    ).withColumn("nq", _int_dot(F.col("qv"), F.col("qv"))).localCheckpoint()

    seeds = (
        q.select("id", "qv", F.md5(F.col("id").cast("string")).alias("h"))
        .orderBy("h", "id")
        .limit(n_clusters)
        .collect()
    )
    cents = [(ci, list(r["qv"])) for ci, r in enumerate(seeds)]

    def _round_half_away(x: float) -> int:
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    def assign(cent_rows):
        cent_df = spark.createDataFrame(cent_rows, "cid int, cv array<long>")
        d = F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        scored = q.crossJoin(F.broadcast(cent_df)).select(
            "id", "qv", "nq", F.struct(d.alias("d"), F.col("cid").alias("cid")).alias("dc")
        )
        return scored.groupBy("id", "qv", "nq").agg(
            F.min("dc").getField("cid").alias("cid")
        )

    for _ in range(n_iters):
        a = assign(cents)
        sums = (
            a.select("cid", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict = {}
        for r in sums:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = (r["s"], r["n"])
        new_cents = []
        for ci, old in cents:
            comp = by_cid.get(ci)
            if comp is None:  # empty cluster: centroid carries forward
                new_cents.append((ci, old))
            else:
                new_cents.append(
                    (ci, [
                        _round_half_away(comp[p][0] / comp[p][1])
                        for p in range(len(old))
                    ])
                )
        cents = new_cents

    cent_df = spark.createDataFrame(cents, "cid int, cv array<long>").withColumn(
        "ncv", _int_dot(F.col("cv"), F.col("cv"))
    )
    final = (
        assign(cents)
        .join(F.broadcast(cent_df), "cid")
        .select(
            "id", "qv", "nq", "cid",
            F.round(
                _int_dot(F.col("qv"), F.col("cv")).cast("double")
                / (F.sqrt(F.col("nq").cast("double")) * F.sqrt(F.col("ncv").cast("double"))),
                6,
            ).alias("centroid_sim"),
        )
        .localCheckpoint()
    )
    x, y = final.alias("x"), final.alias("y")
    sim = F.round(
        _int_dot(F.col("x.qv"), F.col("y.qv")).cast("double")
        / (F.sqrt(F.col("x.nq").cast("double")) * F.sqrt(F.col("y.nq").cast("double"))),
        6,
    )
    pairs = (
        x.join(y, (F.col("x.cid") == F.col("y.cid")) & (F.col("x.id") < F.col("y.id")))
        .where(sim >= eps)
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.centroid_sim").alias("cs_a"),
            F.col("y.id").alias("id_b"),
            F.col("y.centroid_sim").alias("cs_b"),
        )
    )
    # the pair's LOSER (dropped side) is the one closer to its centroid;
    # ties break to the larger id
    loser = F.when(
        (F.col("cs_a") > F.col("cs_b"))
        | ((F.col("cs_a") == F.col("cs_b")) & (F.col("id_a") > F.col("id_b"))),
        F.col("id_a"),
    ).otherwise(F.col("id_b"))
    losers = pairs.select(loser.alias("id")).distinct()
    return (
        final.join(losers.withColumn("__drop", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("cid").cast("int").alias("cluster_id"),
            "centroid_sim",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("is_kept"),
        )
    )
