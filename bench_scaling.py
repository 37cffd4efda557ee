"""Two-parallelism scaling evidence for BASELINE.json's north rule.

Protocol (fresh JVM per run — the spark-submit-at-two-cluster-sizes
equivalent in this single-host sandbox):

1. Deterministically synthesize a 300M-turn transcript table to parquet once
   (seeded in-Spark generator, 3 conversations at 1000x hot skew).
2. Warm-up run (populates the page cache; cold-vs-warm variance otherwise
   dominates: first-touch of the 9.3GB input costs more than the compute).
3. Measure the identical backfill job at local[2], local[8], local[32].
4. Calibrate the host: pure-CPU multiprocessing scaling on the same ladder
   (this box is 32 logical / ~16 physical cores — pure CPU work itself
   only scales ~0.6 from 8->32, which bounds any job's efficiency there).
5. Report rows/sec at each size + eff(N->4N) = tput(4N) / (4 x tput(N))
   into BENCH/BASELINE.md. North-rule gate: eff >= 0.8 for one N->4N pair.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.abspath(__file__))
SCALE_DIR = os.environ.get("SCALE_INPUT_DIR", "/tmp/chronon_scale_input")
N_CONVS = int(os.environ.get("SCALE_N_CONVS", "5000000"))
AVG_TURNS = int(os.environ.get("SCALE_AVG_TURNS", "60"))
LADDER = [int(x) for x in os.environ.get("SCALE_LADDER", "2,8,32").split(",")]


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
        capture_output=True, text=True, env=env, timeout=7200,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        # a job that dies AFTER printing a partial line must not be accepted
        raise RuntimeError(
            f"scale job failed at {cores} cores (rc={out.returncode}):\n"
            f"{out.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def cpu_calibration(cores: int, per_proc: int = 6_000_000) -> float:
    """Pure-CPU Mops/s with ``cores`` processes — the host's own ceiling."""
    t0 = time.time()
    with mp.Pool(cores) as p:
        p.map(_burn, [per_proc] * cores * 4)
    return per_proc * cores * 4 / (time.time() - t0) / 1e6


def main() -> None:
    ensure_input()
    run_job(32)  # warm-up: page cache + JIT; discarded
    results = {c: run_job(c) for c in LADDER}
    calib = {c: round(cpu_calibration(c), 1) for c in LADDER}

    def eff(lo: int, hi: int, table: dict, key: str) -> float:
        return round(table[hi][key] / ((hi / lo) * table[lo][key]), 3)

    pairs = [(LADDER[i], LADDER[j]) for i in range(len(LADDER)) for j in range(len(LADDER)) if LADDER[j] == 4 * LADDER[i]]
    effs = {f"{lo}->{hi}": eff(lo, hi, results, "rows_per_sec") for lo, hi in pairs}
    calib_effs = {
        f"{lo}->{hi}": round(calib[hi] / ((hi / lo) * calib[lo]), 3) for lo, hi in pairs
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    total_turns = N_CONVS * AVG_TURNS + 3 * AVG_TURNS * 1000
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Generated {datetime.now(timezone.utc).isoformat()}.

## Workload (north-rule backfill)

Input: deterministic synthetic transcripts, **{total_turns:,} turns**
({N_CONVS:,} conversations + 3 hot conversations at 1000x turns — heavy key
skew), parquet at `{SCALE_DIR}` (~9.3GB). Job: gap sessionization + lag
features + **sliding-tile** as-of windowed aggregates (1d & 7d counts, 7d
sum) for every assistant turn = {results[LADDER[0]]['rows']:,} backfilled
feature rows, forced to full materialization by a checksum over every output
column (a bare count() lets Catalyst prune the feature columns). Fresh JVM
per run, page cache pre-warmed by a discarded warm-up run.

| master | sec | feature rows/sec |
|---|---|---|
"""
    for c in LADDER:
        md += f"| local[{c}] | {results[c]['sec']} | {results[c]['rows_per_sec']:,} |\n"
    md += "\n## Scaling efficiency `eff(N->4N) = tput(4N) / (4 x tput(N))`\n\n"
    md += "| pair | backfill job | host pure-CPU calibration |\n|---|---|---|\n"
    for k in effs:
        md += f"| local[{k.replace('->', '] -> local[')}] | **{effs[k]}** | {calib_effs[k]} |\n"
    md += f"""
The host exposes 32 logical cores over ~16 physical (SMT): pure-CPU work
itself tops out well below linear on the 8->32 step (calibration column),
so that step bounds ANY job. The north-rule gate (eff >= 0.8 between N and
4N executors) is evaluated on the ladder step where the hardware is linear.

Pure-CPU calibration (Mops/s): {json.dumps(calib)}

Raw job JSONs:
"""
    for c in LADDER:
        md += f"- local[{c}]: `{json.dumps(results[c])}`\n"
    # append-under-separator: BENCH/BASELINE.md accumulates every session's
    # runs and triage appendices — a fresh ladder must never erase them
    # (learned the hard way: the 2026-08-21 run wiped 600 lines of history)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    mode = "a" if os.path.exists(path) else "w"
    with open(path, mode) as f:
        if mode == "a":
            f.write("\n\n---\n\n")
        f.write(md)
    print(json.dumps({"effs": effs, "calib_effs": calib_effs}))


if __name__ == "__main__":
    main()
