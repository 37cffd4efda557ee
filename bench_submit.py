"""North-rule deployment form, literally: package the engine as a zip and run
the scaling job via ``spark-submit --py-files chronon_spark.zip`` at two
parallelism levels (local[2] vs local[8] — the sandbox's stand-in for N vs 4N
executors; the 2->8 step is SMT-free on this 32-logical/16-physical host).

The job file is COPIED OUT of the repo before submission, so the
``import chronon_spark`` inside it can only resolve through the --py-files
zip — proving the artifact is self-contained the way a real cluster submit
requires (no repo checkout on the executors).

Prints one JSON line per leg plus the summary; calibration brackets label
the host phase (this VM's effective CPU oscillates ~4x on minute scales —
see BENCH/BASELINE.md §4)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

from bench_scaling import cpu_calibration

REPO = os.path.dirname(os.path.abspath(__file__))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(os.path.abspath(__import__("pyspark").__file__)),
    "bin",
    "spark-submit",
)
INPUT = os.environ.get("SCALE_INPUT_DIR", "/tmp/chronon_scale_short")
LADDER = [int(x) for x in os.environ.get("SUBMIT_LADDER", "2,8").split(",")]


def build_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "chronon_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "chronon_spark")
        for dirpath, dirs, names in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for n in names:
                if n.endswith(".py"):
                    full = os.path.join(dirpath, n)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def submit(cores: int, zpath: str, job: str) -> dict:
    env = dict(os.environ)
    env["SCALE_INPUT_DIR"] = INPUT
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_MASTER"] = f"local[{cores}]"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", f"local[{cores}]",
            # on spark-submit the driver JVM launches BEFORE the job's
            # SparkSession.config lines run, so session.py's 48g default
            # never applies — without this flag the 8-core leg dies at the
            # 1g spark-submit default (exit 52, JVM OOM)
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
            "--py-files", zpath,
            "--conf", "spark.ui.showConsoleProgress=false",
            job,
        ],
        capture_output=True, text=True, env=env, timeout=7200,
        cwd=os.path.dirname(job),  # not the repo: imports resolve via the zip
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"spark-submit failed at {cores} cores (rc={out.returncode}):\n"
            f"{out.stderr[-3000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    stage = tempfile.mkdtemp(prefix="chronon_submit_")
    try:
        zpath = build_zip(stage)
        job = os.path.join(stage, "bench_scale_job.py")
        shutil.copy(os.path.join(REPO, "bench_scale_job.py"), job)
        legs = []
        for cores in LADDER:
            calib_pre = {c: round(cpu_calibration(c), 1) for c in LADDER}
            r = submit(cores, zpath, job)
            calib_post = {c: round(cpu_calibration(c), 1) for c in LADDER}
            leg = {
                "master": f"local[{cores}]",
                "deploy": "spark-submit --py-files",
                **r,
                "calib_pre": calib_pre,
                "calib_post": calib_post,
            }
            legs.append(leg)
            print(json.dumps(leg), flush=True)
        if len(legs) == 2:
            n, m = LADDER
            eff = legs[1]["rows_per_sec"] / (legs[0]["rows_per_sec"] * (m / n))
            print(json.dumps({
                "metric": f"spark-submit scaling eff({n}->{m})",
                "value": round(eff, 3),
                "rows": legs[0]["rows"],
            }), flush=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)


if __name__ == "__main__":
    main()
