"""Opportunistic scaling sampler for the shared-host sandbox.

Waits for quiet windows (1-min loadavg below --max-load with zero own Spark
processes), then fires ONE pinned run of the full KG pipeline at a given
core count, appending a JSON line to --log.  Pair it across core counts and
take min-of-k per config (BASELINE.md protocol): external neighbor load
only ever ADDS wall time, so the minimum over enough quiet-window samples
estimates machine capability with the least bias.

Usage:
  python jobs/bench_quiet.py --cores 16 --files 800000 --log bench_runs.jsonl
  python jobs/bench_quiet.py --cores 4  --files 800000 --log bench_runs.jsonl
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

from bench_scaling import RUNNER  # same pinned fresh-subprocess runner


def loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--files", type=int, default=800_000)
    ap.add_argument("--log", default="/tmp/bench_runs.jsonl")
    ap.add_argument("--max-load", type=float, default=2.0)
    ap.add_argument("--wait-sec", type=int, default=1800,
                    help="give up if no quiet window within this long")
    ap.add_argument("--stage", default="full", choices=["full", "extract"])
    args = ap.parse_args()

    t0 = time.time()
    while loadavg1() > args.max_load:
        if time.time() - t0 > args.wait_sec:
            print(json.dumps({"skipped": True, "load": loadavg1()}))
            return
        time.sleep(20)

    load_before = loadavg1()
    cmd = ["taskset", "-c", f"0-{args.cores - 1}", sys.executable, "-c",
           RUNNER, str(args.cores), str(args.files), args.stage]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd="/root/repo")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["load_before"] = load_before
    rec["load_after"] = loadavg1()
    rec["ts"] = time.time()
    with open(args.log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
