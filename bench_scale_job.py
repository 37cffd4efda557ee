"""The scaling-evidence job: full feature backfill over a large synthetic
transcript table (read from parquet), identical at every parallelism level.

Work: hop-tile as-of windowed aggregates (count/sum 1d+7d, last_k roles) for
every assistant turn + gap sessionization + lag features — the north-rule
workload. Prints one JSON line {"rows": N, "sec": S, "rows_per_sec": T}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    input_dir = os.environ["SCALE_INPUT_DIR"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as SW

    from chronon_spark import Aggregation, GroupBy, Op, TimeUnit, Window, get_spark
    from chronon_spark.operators.groupby import temporal_events
    from chronon_spark.operators.sessionize import sessionize

    # SCALE_PROFILE_OUT=<path>: dump per-stage task-time/GC/shuffle metrics
    # from the status REST API after the run (the SparkListener-equivalent
    # evidence for attributing scaling-efficiency gaps to SMT vs GC vs
    # shuffle contention). UI server only spins up when profiling.
    profile_out = os.environ.get("SCALE_PROFILE_OUT")
    extra = {"spark.ui.enabled": "true"} if profile_out else None
    # 4x cores (round-5 profile finding): at 2x, 32 concurrent tasks shrank
    # the per-task memory share enough that the final window stage spilled
    # 54.8GB (memory) + 5.3GB (disk); at 4x the same stage spills ZERO and
    # the leg runs 25% faster (448.6s -> 336.8s, BENCH/profile_r5_*). The
    # cluster-form equivalent: size spark.sql.shuffle.partitions so a
    # task's sort footprint fits its unified-memory share.
    shuffle_parts = int(
        os.environ.get("SCALE_SHUFFLE_PARTITIONS", str(max(cpus * 4, 16)))
    )
    spark = get_spark(
        "scale_job", master=master, shuffle_partitions=shuffle_parts, extra_conf=extra
    )
    t = spark.read.parquet(input_dir)

    t0 = time.time()
    s = sessionize(t, ["conv_id"], ts_column="ts", gap="30 minutes", order_by=["ts", "turn_idx"])
    w = SW.partitionBy("conv_id").orderBy("ts", "turn_idx")
    s = s.withColumn("prev_role", F.lag("role").over(w)).withColumn(
        "gap_ms", F.unix_millis(F.col("ts").cast("timestamp")) - F.lag(F.unix_millis(F.col("ts").cast("timestamp"))).over(w)
    )
    left = s.where(F.col("role") == "assistant").select(
        "conv_id", "turn_idx", "ts", "session_id", "prev_role", "gap_ms"
    )
    gb = GroupBy(
        name="conv",
        keys=["conv_id"],
        aggregations=[
            Aggregation(Op.COUNT, "turn_idx", windows=(Window(1, TimeUnit.DAYS), Window(7, TimeUnit.DAYS))),
            Aggregation(Op.SUM, "turn_idx", windows=(Window(7, TimeUnit.DAYS),)),
        ],
    )
    out = temporal_events(left, t, gb, left_time_column="ts", tiebreak="turn_idx", strategy="sliding")
    # checksum over every output column: forces full feature materialization
    # (a bare count() lets Catalyst prune the aggregate columns and measures
    # only the join skeleton)
    n, _ = out.select(
        F.count(F.lit(1)), F.avg(F.xxhash64(*[F.col(c) for c in out.columns]))
    ).first()
    sec = time.time() - t0
    if profile_out:
        _dump_stage_profile(spark, profile_out, {"master": master, "sec": round(sec, 2)})
    print(json.dumps({"rows": n, "sec": round(sec, 2), "rows_per_sec": round(n / sec, 1)}))
    spark.stop()


def _dump_stage_profile(spark, out_path: str, run_meta: dict) -> None:
    """Per-completed-stage metrics via the status REST API: wall-clock-free
    aggregates (executorRunTime, executorCpuTime, jvmGcTime, shuffle
    read/write) that localize where scaling efficiency is lost."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    keep = (
        "stageId", "attemptId", "name", "numTasks", "executorRunTime",
        "executorCpuTime", "executorDeserializeTime", "jvmGcTime",
        "resultSerializationTime", "inputBytes", "inputRecords",
        "outputBytes", "shuffleReadBytes", "shuffleReadRecords",
        "shuffleWriteBytes", "shuffleWriteRecords", "shuffleFetchWaitTime",
        "shuffleWriteTime", "memoryBytesSpilled", "diskBytesSpilled",
        "peakExecutorMetrics",
    )
    rows = [{k: s.get(k) for k in keep if k in s} for s in stages]
    rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    totals = {
        k: sum(s.get(k) or 0 for s in rows)
        for k in (
            "executorRunTime", "executorCpuTime", "jvmGcTime", "shuffleReadBytes",
            "shuffleWriteBytes", "shuffleFetchWaitTime", "shuffleWriteTime",
            "memoryBytesSpilled", "diskBytesSpilled", "inputBytes",
        )
    }
    with open(out_path, "w") as f:
        json.dump({"run": run_meta, "totals": totals, "stages": rows}, f, indent=1)


if __name__ == "__main__":
    main()
