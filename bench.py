"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec},
 "sf": ..., "rows_per_sec": ..., "feature_rows": ...}

The headline metric mirrors BASELINE.json: backfilled feature rows/sec for
the as-of join + window agg path. Scaling evidence across two parallelism
levels is produced by bench_scaling.py (writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")

    from chronon_spark import get_spark
    from chronon_spark.driver_contract import QUERIES

    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(cpus, 8))))
    spark = get_spark("bench", master=master, shuffle_partitions=shuffle)

    headline = [
        "transcripts_backfill",  # flagship: as-of + session + lag over transcripts
        "asof_window_agg",       # exact range-join estimator
        "asof_hops",             # cascade tile estimator
        "asof_sliding",          # sliding-tile estimator (the 100TB scale path)
        "asof_join_multi",       # multi-part join orchestration
        "snapshot_daily",        # daily snapshot GroupBy
        "sessionize",
        "lag_lead",
        "tpch_q1",
        "groupby_lifetime",
    ]
    # optional heavy data-pipeline queries (added as they land)
    for extra in (
        "dedup_minhash_lsh",
        "knn_cosine",
        "text_stats",
        "mutations_temporal",  # CDC temporal engine (round 2)
        "asof_join_snapshot",  # midnight-accuracy join part (round 2)
        "curation",            # decontaminate + split + pack (round 4)
        "dedup_spans",         # ExactSubstr span removal (round 4)
        "dsir_select",         # DSIR importance weighting (round 4)
        "bpe_tokenize",        # pandas-UDF BPE apply over distinct words (round 4)
        "multimodal_embed",    # mapInPandas embed -> brute-force ANN (round 4)
        "gopher_quality",      # full Gopher rule battery, one gram pass (round 4)
        "c4_clean",            # C4 line filtering, zero-shuffle HOF plan (round 4)
        "transcript_quality",  # conversation battery, one conv partitioning (round 4)
        "corpus_drift",        # hashed-histogram TVD/JSD/PSI summary (round 4)
        "doc_chunks",          # token-budget chunking, zero-shuffle (round 4)
        "time_decayed",        # recency-weighted aggs on cascade tiles (round 4)
    ):
        if extra in QUERIES:
            headline.append(extra)

    from pyspark.sql import functions as F

    def shape_hash(fn, df) -> str:
        """Semantic pin for longitudinal comparability: sha8 of the query
        function's SOURCE plus the resolved OUTPUT SCHEMA. A bench row is
        cross-round comparable iff its shape hash matches — query-definition
        growth (e.g. decayed columns joining a benched GroupBy mid-round,
        the r4 asof_sliding triage problem) changes the hash, while
        engine-internal plan changes do not."""
        import hashlib
        import inspect

        try:
            src = inspect.getsource(inspect.unwrap(fn))
        except (OSError, TypeError):
            src = getattr(fn, "__name__", repr(fn))
        return hashlib.sha256(
            (src + "\n--schema--\n" + df.schema.simpleString()).encode()
        ).hexdigest()[:8]

    def force(df):
        """count + checksum over all columns — defeats Catalyst column
        pruning so the timed work includes every feature value."""
        hashable = [
            f.name for f in df.schema.fields if f.dataType.typeName() not in ("map",)
        ]
        n, _ = df.select(
            F.count(F.lit(1)), F.avg(F.xxhash64(*[F.col(c) for c in hashable]))
        ).first()
        return n

    # JVM warm-up on SYNTHETIC data (codegen, shuffle, window machinery) so
    # the first timed query doesn't absorb cold-start; benchmark files stay
    # untouched (no unfair page-cache warming)
    from pyspark.sql.window import Window as SW

    warm = spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    warm.groupBy("k").agg(F.sum("v"), F.count(F.lit(1))).join(
        warm.withColumn("r", F.sum("v").over(SW.partitionBy("k").orderBy("v").rangeBetween(-10, -1))),
        "k",
    ).select(F.count(F.lit(1))).first()

    # Two timed passes per query; record the better one. The first execution
    # of a plan in a long-lived JVM pays Janino compilation + C2 JIT warmup
    # of its generated classes (measured: 3-6x on expression-heavy plans),
    # and that cost shifts with how many OTHER plans the session has already
    # loaded — it is session-history noise, not query cost. The warm number
    # is also the representative one: a production backfill re-executes the
    # same compiled plan per partition chunk. Data caches are still dropped
    # between runs (clearCache), so no run sees another's materialized data.
    # Pure-CPU host probe (no Spark): this VM's effective CPU oscillates ~4x
    # on multi-minute periods (BENCH/BASELINE.md §4). Bracketing the bench
    # with calibration makes each JSON line self-describing: clean phases
    # measure ~117-150 Mops/s on 8 procs, throttled phases 40-80 — timings
    # from different phases are not comparable.
    def calib() -> float:
        try:
            from bench_scaling import cpu_calibration

            return round(cpu_calibration(8, per_proc=4_000_000), 1)
        except Exception:
            return -1.0

    calib_pre = calib()
    timings: dict[str, float] = {}
    # per-query calibration bracket: one probe after every query, each
    # query labeled with the mean of its surrounding probes — so a
    # regression can be attributed to plan vs host phase PER QUERY instead
    # of inferring throttle exposure from run order (the r3 triage problem)
    marks: list[float] = [calib_pre]
    feature_rows = 0
    shapes: dict[str, str] = {}
    t_all = time.time()
    for name in headline:
        fn = QUERIES[name]
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            try:
                n = force(fn(spark, sf_dir))
            finally:
                # queries may persist intermediates (e.g. the prepared
                # transcript frame); drop them so no run warms another
                from chronon_spark.plans.cache import release_plan_caches

                release_plan_caches()  # also empties the plan-cache registry
                spark.catalog.clearCache()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        marks.append(calib())
        timings[name] = round(best, 3)
        # shape pin computed OUTSIDE the timed region (plan build only, no
        # execution) so timings stay comparable with pre-pin rounds
        try:
            shapes[name] = shape_hash(fn, fn(spark, sf_dir))
        finally:
            from chronon_spark.plans.cache import release_plan_caches

            release_plan_caches()
            spark.catalog.clearCache()
        if name in ("transcripts_backfill", "asof_window_agg", "asof_hops", "asof_sliding", "asof_join_multi"):
            feature_rows += n
    total = round(time.time() - t_all, 3)

    def _bracket(lo: float, hi: float) -> float:
        good = [m for m in (lo, hi) if m > 0]
        return round(sum(good) / len(good), 1) if good else -1.0

    queries_calib = {
        name: _bracket(marks[i], marks[i + 1]) for i, name in enumerate(headline)
    }

    asof_sec = sum(
        timings[q]
        for q in ("transcripts_backfill", "asof_window_agg", "asof_hops", "asof_sliding", "asof_join_multi")
    )
    rows_per_sec = round(feature_rows / asof_sec, 1) if asof_sec > 0 else 0.0
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline query wall time (warm, best of 2; backfill rows/sec in rows_per_sec)",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "runs_per_query": 2,
                "wall_total": total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "feature_rows": feature_rows,
                "rows_per_sec": rows_per_sec,
                "master": master,
                "host_calib_mops_pre": calib_pre,
                "host_calib_mops_post": marks[-1],
                "queries_calib_mops": queries_calib,
                "query_shapes": shapes,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
