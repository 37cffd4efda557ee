"""FULL-scale curation-path scaling evidence: exact dedup -> MinHash-LSH ->
connected components -> keep-best canonical over a skew-planted document
corpus, run at two parallelism levels (the spark-submit-at-two-cluster-sizes
equivalent of bench_scaling.py, for the LLM-pipeline operators instead of
the as-of engine).

The corpus is deterministic and adversarial on purpose:

- a MEGA exact-duplicate family (error-page shape, ``MEGA_COPIES`` copies of
  one short text). All-pairs anything dies here; the pipeline handles it
  LINEARLY in dedup_exact (one md5 groupBy) so it never reaches LSH.
- hot BOILERPLATE header shared by ~20% of docs (hot shingles). Band keys
  hash the whole signature, so boilerplate alone must NOT create candidate
  pairs; this leg proves the bucketed design doesn't quadratically explode
  on shared prefixes.
- near-duplicate families of 4 (one variant token) — the content LSH must
  actually find, componentize, and canonicalize.
- the rest unique.

Usage:  python bench_curation_scale.py            # ladder (default 2,8)
        CURATION_N_DOCS=20000000 CURATION_LADDER=2,8,32 python bench_curation_scale.py
        CURATION_CORES=8 python bench_curation_scale.py --job   # one leg (subprocess form)

Appends a dated appendix to BENCH/BASELINE.md with rows/s per leg and
eff(N->4N), bracketed by the pure-CPU host calibration.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CORPUS_DIR = os.environ.get("CURATION_INPUT_DIR", "/tmp/chronon_curation_input")
N_DOCS = int(os.environ.get("CURATION_N_DOCS", "5000000"))
MEGA_COPIES = int(os.environ.get("CURATION_MEGA_COPIES", "100000"))
LADDER = [int(x) for x in os.environ.get("CURATION_LADDER", "2,8").split(",")]


def ensure_input() -> None:
    """Deterministic skew-planted corpus -> parquet (pure Column exprs, no
    Python row work). Layout per doc_id i over N = N_DOCS:
      i < MEGA_COPIES           -> one identical short error-page text
      else, bucket = i % 10:
        0,1  (20%)              -> hot boilerplate header + unique body
        2    (10%)              -> near-dup family of 4: body from i//4,
                                   one variant token carries i%4
        3..9 (70%)              -> unique body
    """
    if os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    from chronon_spark import get_spark

    spark = get_spark("curation_gen", master="local[32]")

    def words(seed_col, n, salt):
        # n pseudo-words derived from (seed, j, salt) — deterministic, JVM-side
        return F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda j: F.substring(
                    F.md5(F.concat_ws("_", seed_col.cast("string"), j.cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
            ),
            " ",
        )

    df = spark.range(N_DOCS).withColumnRenamed("id", "doc_id")
    bucket = F.col("doc_id") % 10
    mega = F.col("doc_id") < MEGA_COPIES
    header = "service unavailable please retry the request after some time"
    boiler = words(F.lit(0), 10, "boilerplate")  # identical hot header
    body_unique = words(F.col("doc_id"), 14, "body")
    # family docs share a 60-word base; ONE trailing variant token pollutes
    # the last 8 shingles -> true jaccard ~0.74, inside LSH recall at
    # 16 perms / 4 bands. Bucket-2 ids are 10 apart, so doc_id//40 groups
    # exactly 4 consecutive bucket-2 docs into one family and
    # (doc_id//10)%4 is the within-family variant index.
    fam_base = (F.col("doc_id") / 40).cast("long")
    body_family = F.concat_ws(
        " ",
        words(fam_base, 60, "fam"),
        F.concat(F.lit("variant"), ((F.col("doc_id") / 10) % 4).cast("long").cast("string")),
    )
    text = (
        F.when(mega, F.lit(header))
        .when(bucket < 2, F.concat_ws(" ", boiler, body_unique))
        .when(bucket == 2, body_family)
        .otherwise(body_unique)
    )
    df.select("doc_id", text.alias("text")).repartition(64, "doc_id").write.mode(
        "overwrite"
    ).parquet(CORPUS_DIR)
    spark.stop()


def run_leg() -> None:
    """One measured leg (fresh JVM): the full dedup pipeline, forced."""
    cores = int(os.environ.get("CURATION_CORES", "8"))
    from pyspark.sql import functions as F

    from chronon_spark import get_spark
    from chronon_spark.operators.dedup import (
        dedup_canonical,
        dedup_exact,
        minhash_lsh_pairs,
    )

    spark = get_spark(
        "curation_scale", master=f"local[{cores}]", shuffle_partitions=max(cores * 2, 16)
    )
    docs = spark.read.parquet(CORPUS_DIR)
    t0 = time.time()
    # stage 1: exact dedup (linear) — mega-families collapse here
    reps = dedup_exact(docs)  # (content_hash, canonical_id, n_dups)
    reps_docs = docs.join(
        reps.select(F.col("canonical_id").alias("doc_id")), "doc_id", "left_semi"
    )
    # stage 2: banded MinHash-LSH candidates on distinct content only
    pairs = minhash_lsh_pairs(
        reps_docs, n=8, num_perm=16, bands=4, min_est_jaccard=0.5
    )
    # stage 3+4: components + keep-best canonical over the whole corpus
    decisions = dedup_canonical(reps_docs, pairs, max_iterations=20)
    n_docs = docs.count()
    stats = decisions.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_canonical").cast("long")).alias("n_canonical"),
        F.count_distinct("component_id").alias("n_components"),
        F.avg(F.xxhash64("doc_id", "component_id", "canonical_id", "is_canonical")).alias("__force"),
    ).first()
    sec = time.time() - t0
    exact_dups = n_docs - stats["n"]
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "sec": round(sec, 2),
                "docs_per_sec": round(n_docs / sec, 1),
                "exact_dups_removed": exact_dups,
                "distinct_content": stats["n"],
                "canonical": stats["n_canonical"],
                "components": stats["n_components"],
            }
        )
    )
    spark.stop()


def run_job(cores: int) -> dict:
    env = dict(os.environ, CURATION_CORES=str(cores))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--job"],
        capture_output=True, text=True, env=env, timeout=14400,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"curation leg failed at {cores} cores (rc={out.returncode}):\n"
            f"{out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    from bench_scaling import cpu_calibration

    ensure_input()
    warm = run_job(max(LADDER))  # page cache + JIT; discarded
    results, calib = {}, {}
    for c in LADDER:
        calib[c] = round(cpu_calibration(c), 1)
        results[c] = run_job(c)
    pairs = [
        (LADDER[i], LADDER[j])
        for i in range(len(LADDER))
        for j in range(len(LADDER))
        if LADDER[j] == 4 * LADDER[i]
    ]
    effs = {
        f"{lo}->{hi}": round(
            results[hi]["docs_per_sec"] / ((hi / lo) * results[lo]["docs_per_sec"]), 3
        )
        for lo, hi in pairs
    }
    calib_effs = {
        f"{lo}->{hi}": round(calib[hi] / ((hi / lo) * calib[lo]), 3) for lo, hi in pairs
    }
    r0 = results[LADDER[0]]
    md = f"""

## Appendix: curation-path scaling ladder ({datetime.now(timezone.utc).date()})

Skew-planted corpus: **{r0['docs']:,} docs** at `{CORPUS_DIR}` — one
{MEGA_COPIES:,}-copy exact mega-family (error-page shape), ~20% sharing a
hot 10-word boilerplate header, ~10% in near-dup families of 4, rest
unique. Job (fresh JVM per leg, warm-up discarded): dedup_exact ->
MinHash-LSH (16 perms, 4 bands, est_jaccard >= 0.5, distinct content only)
-> connected components -> keep-best canonical, forced by a checksum over
every decision row. Removed {r0['exact_dups_removed']:,} exact dups
linearly before LSH; near-dup merges collapsed {r0['distinct_content']:,}
distinct-content docs to {r0['canonical']:,} canonical.

| master | sec | docs/sec | host calib (Mops/s) |
|---|---|---|---|
"""
    for c in LADDER:
        md += f"| local[{c}] | {results[c]['sec']} | {results[c]['docs_per_sec']:,} | {calib[c]} |\n"
    md += "\n| pair | curation job eff | host pure-CPU eff |\n|---|---|---|\n"
    for k in effs:
        md += f"| local[{k.replace('->', '] -> local[')}] | **{effs[k]}** | {calib_effs[k]} |\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(json.dumps({"results": results, "eff": effs, "calib_eff": calib_effs, "warmup": warm}))


if __name__ == "__main__":
    if "--job" in sys.argv:
        run_leg()
    else:
        main()
