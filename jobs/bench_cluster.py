"""Multi-executor scaling benchmark — N vs 4N EXECUTORS on the standalone
cluster (the sandbox's closest analog of the north rule's two cluster sizes).

Protocol (extends BENCH.md v2):
- jobs/cluster.py runs 4 workers, each taskset-pinned to a disjoint 4-core
  block, scratch on tmpfs;
- configs: 1 executor x 4 cores (spark.cores.max=4) vs 4 executors x 4
  cores (spark.cores.max=16).  ``spark.executor.cores=4`` forces whole
  4-core executors, so the scheduler cannot satisfy cores.max by spreading
  single cores across workers;
- each sample is a fresh ``spark-submit --py-files nerzo_spark.zip`` (fresh
  executor JVMs; the north rule's submit surface, not an in-process session);
- same pre-materialized tmpfs corpus for every run; generation excluded;
- quiet-window min-of-k: a sample only starts when 1-min loadavg < gate
  (external neighbor load only ADDS time, so per-config minima estimate
  machine capability; all raw samples are reported).

Usage:
  python jobs/cluster.py start          # once
  python jobs/bench_cluster.py --files 800000 --reps 4 [--loadavg-gate 2.0]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_URL = "spark://127.0.0.1:7077"
ZIP = "/dev/shm/nerzo_spark_pkg.zip"


def build_zip() -> str:
    with zipfile.ZipFile(ZIP, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "nerzo_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, REPO))
    return ZIP


def ensure_corpus(files: int) -> str:
    """Generate the fixture corpus parquet ONCE (local mode), reuse forever."""
    path = f"/dev/shm/nerzo_corpus_{files}"
    if os.path.exists(path):
        return path
    code = (
        "from nerzo_spark.session import get_spark\n"
        "from nerzo_spark.fixtures.distributed import corpus_df_distributed\n"
        f"s = get_spark('gen', master='local[16]', shuffle_partitions=32)\n"
        f"corpus_df_distributed(s, {files}, partitions=64)"
        f".write.mode('overwrite').parquet('{path}.tmp')\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)
    os.rename(path + ".tmp", path)
    return path


def wait_quiet(gate: float, timeout_s: float = 900) -> float:
    t0 = time.time()
    while True:
        la = os.getloadavg()[0]
        if la < gate or time.time() - t0 > timeout_s:
            return la
        time.sleep(15)


def run_sample(executors: int, corpus: str, files: int, stage: str,
               pyz: str, driver_cores: str | None) -> dict:
    submit = os.path.join(os.path.dirname(sys.executable), "spark-submit")
    if not os.path.exists(submit):
        import pyspark

        submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    cmd = [
        submit, "--master", MASTER_URL, "--py-files", pyz,
        "--conf", "spark.executor.cores=4",
        "--conf", "spark.executor.memory=8g",
        "--conf", f"spark.cores.max={4 * executors}",
        "--conf", "spark.driver.memory=6g",
        "--conf", f"spark.pyspark.python={sys.executable}",
        os.path.join(REPO, "jobs", "run_kg_bench.py"),
        "--corpus", corpus, "--files", str(files), "--stage", stage,
    ]
    if driver_cores:
        cmd = ["taskset", "-c", driver_cores] + cmd
    env = dict(os.environ)
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO, env=env)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=800_000)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--lo-execs", type=int, default=1)
    ap.add_argument("--hi-execs", type=int, default=4)
    ap.add_argument("--stage", default="full", choices=["full", "extract"])
    ap.add_argument("--loadavg-gate", type=float, default=2.0,
                    help="start a sample only when 1-min loadavg < gate")
    ap.add_argument("--driver-cores", default="16-19",
                    help="taskset range for the driver (off the worker "
                         "blocks 0-15); '' disables")
    args = ap.parse_args()

    pyz = build_zip()
    corpus = ensure_corpus(args.files)

    runs: dict[int, list[dict]] = {args.lo_execs: [], args.hi_execs: []}
    for rep in range(args.reps):
        for execs in (args.hi_execs, args.lo_execs):
            la = wait_quiet(args.loadavg_gate)
            r = run_sample(execs, corpus, args.files, args.stage, pyz,
                           args.driver_cores or None)
            r["loadavg_at_start"] = round(la, 2)
            runs[execs].append(r)
            print(json.dumps({"rep": rep, "want_execs": execs, **r}), flush=True)

    best = {e: min(rs, key=lambda r: r["sec"]) for e, rs in runs.items()}
    thr_lo, thr_hi = best[args.lo_execs]["tps"], best[args.hi_execs]["tps"]
    ratio = args.hi_execs / args.lo_execs
    print(json.dumps({
        "files": args.files, "stage": args.stage,
        "lo_executors": args.lo_execs, "lo_best_sec": best[args.lo_execs]["sec"],
        "lo_tps": thr_lo, "lo_stages": best[args.lo_execs]["stages"],
        "hi_executors": args.hi_execs, "hi_best_sec": best[args.hi_execs]["sec"],
        "hi_tps": thr_hi, "hi_stages": best[args.hi_execs]["stages"],
        "scaling_efficiency": round((thr_hi / thr_lo) / ratio, 3),
        "protocol": "min-of-%d, quiet-gated, fresh spark-submit per sample, "
                    "pinned standalone workers" % args.reps,
    }))


if __name__ == "__main__":
    main()
