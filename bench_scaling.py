"""Two-parallelism scaling evidence for BASELINE.json's north rule.

1. Deterministically synthesizes a large transcript table to parquet once
   (seeded generator, includes 1000x hot-conversation skew).
2. Runs the identical backfill job (bench_scale_job.py) at local[8] and
   local[32] in fresh JVMs (mirrors spark-submit at two cluster sizes).
3. Reports throughput at both + eff = tput(32) / (4 x tput(8)) into
   BENCH/BASELINE.md, alongside the per-query bench.py numbers. Gate >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.abspath(__file__))
SCALE_DIR = os.environ.get("SCALE_INPUT_DIR", "/tmp/chronon_scale_input")
N_CONVS = int(os.environ.get("SCALE_N_CONVS", "30000"))
AVG_TURNS = int(os.environ.get("SCALE_AVG_TURNS", "60"))


def ensure_input() -> None:
    if os.path.exists(os.path.join(SCALE_DIR, "_SUCCESS")):
        return
    from chronon_spark import get_spark
    from chronon_spark.sources.transcripts import generate_transcripts

    spark = get_spark("scale_gen", master="local[32]")
    t = generate_transcripts(
        spark,
        n_conversations=N_CONVS,
        avg_turns=AVG_TURNS,
        n_days=30,
        hot_conversations=3,
        hot_multiplier=1000,
    )
    t.repartition(64).write.mode("overwrite").parquet(SCALE_DIR)
    spark.stop()


def run_job(cores: int) -> dict:
    env = dict(os.environ)
    env["SCALE_INPUT_DIR"] = SCALE_DIR
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_MASTER"] = f"local[{cores}]"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_scale_job.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"scale job failed at {cores} cores:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def run_bench(cores: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_MASTER"] = f"local[{cores}]"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ensure_input()
    j8 = run_job(8)
    j32 = run_job(32)
    eff = round(j32["rows_per_sec"] / (4 * j8["rows_per_sec"]), 3)
    b32 = run_bench(32)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    total_turns = "~" + str(N_CONVS * AVG_TURNS + 3 * AVG_TURNS * 1000)
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Generated {datetime.now(timezone.utc).isoformat()}.

## Scaling job (north-rule workload)

Input: deterministic synthetic transcripts ({total_turns} turns,
{N_CONVS} conversations + 3 hot conversations at 1000x turns), parquet at
`{SCALE_DIR}`. Job: gap sessionization + lag features + hop-tile as-of
windowed aggregates (1d/7d) for every assistant turn. Fresh JVM per run —
equivalent to `spark-submit --py-files ... --master local[N]`.

| master | backfilled feature rows | sec | feature rows/sec |
|---|---|---|---|
| local[8]  | {j8['rows']} | {j8['sec']} | {j8['rows_per_sec']} |
| local[32] | {j32['rows']} | {j32['sec']} | {j32['rows_per_sec']} |

**Scaling efficiency** `eff = tput(32) / (4 x tput(8))` = **{eff}**
(north-rule gate: >= 0.8).

## Per-query bench (sf0.1, local[32])

| query | sec |
|---|---|
"""
    for q, s in b32["queries"].items():
        md += f"| {q} | {s} |\n"
    md += f"\nRaw scale JSONs: `{json.dumps(j8)}` `{json.dumps(j32)}`\n"
    md += f"\nRaw bench JSON: `{json.dumps(b32)}`\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": eff, "tput8": j8["rows_per_sec"], "tput32": j32["rows_per_sec"]}))


if __name__ == "__main__":
    main()
