"""Local Spark STANDALONE cluster manager — the multi-executor evidence rig.

The north rule requires throughput at N and 4N EXECUTORS.  local[C] can only
vary task threads inside one JVM (one block manager, one GC, one scheduler —
exactly the components that are per-executor on a real cluster), so this
module runs a real standalone master + K workers on this host:

- each worker is ``taskset``-pinned to its OWN disjoint 4-core block, so a
  1-executor app genuinely gets 4 cores and a 4-executor app genuinely gets
  16 — the same resource split a cluster scheduler would give;
- executors are per-application JVMs launched by the workers (inheriting
  the worker's cpuset + env), so every sample starts from a fresh JVM and
  nothing leaks between configs;
- worker shuffle/scratch dirs live on tmpfs (/dev/shm) like the local-mode
  benches, so disk bandwidth is not the variable under test.

Usage:
    python jobs/cluster.py start [--workers 4] [--cores 4] [--mem 10g]
    python jobs/cluster.py stop
    python jobs/cluster.py status
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time
import urllib.request

BASE = "/tmp/nerzo-standalone"
MASTER_URL = "spark://127.0.0.1:7077"


def spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _env() -> dict[str, str]:
    env = dict(os.environ)
    env["SPARK_HOME"] = spark_home()
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    env["SPARK_MASTER_HOST"] = "127.0.0.1"
    env["SPARK_LOCAL_DIRS"] = "/dev/shm/nerzo-cluster-local"
    # BLAS single-threaded inside every executor/python worker (session.py
    # rationale: library threads oversubscribe against Spark task slots)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
        env[var] = "1"
    env["PYSPARK_PYTHON"] = sys.executable
    return env


def _spawn(name: str, cmd: list[str], env: dict[str, str]) -> int:
    os.makedirs(f"{BASE}/logs", exist_ok=True)
    log = open(f"{BASE}/logs/{name}.log", "w")
    p = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env,
                         cwd=BASE, start_new_session=True)
    with open(f"{BASE}/{name}.pid", "w") as f:
        f.write(str(p.pid))
    return p.pid


def start(workers: int, cores: int, mem: str, pin: bool) -> None:
    os.makedirs("/dev/shm/nerzo-cluster-local", exist_ok=True)
    env = _env()
    cls = f"{spark_home()}/bin/spark-class"
    _spawn("master", [cls, "org.apache.spark.deploy.master.Master",
                      "-h", "127.0.0.1", "-p", "7077", "--webui-port", "7080"], env)
    time.sleep(6)
    for i in range(workers):
        wenv = dict(env)
        wenv["SPARK_WORKER_DIR"] = f"{BASE}/worker{i}"
        cmd = [cls, "org.apache.spark.deploy.worker.Worker", MASTER_URL,
               "-c", str(cores), "-m", mem, "-h", "127.0.0.1",
               "--webui-port", str(7181 + i)]
        if pin:
            lo, hi = i * cores, (i + 1) * cores - 1
            cmd = ["taskset", "-c", f"{lo}-{hi}"] + cmd
        _spawn(f"worker{i}", cmd, wenv)
    deadline = time.time() + 60
    while time.time() < deadline:
        st = status(quiet=True)
        if st.get("alive_workers") == workers:
            print(json.dumps(st))
            return
        time.sleep(2)
    raise RuntimeError(f"workers failed to register; see {BASE}/logs")


def status(quiet: bool = False) -> dict:
    try:
        with urllib.request.urlopen("http://127.0.0.1:7080/json/", timeout=5) as r:
            j = json.load(r)
        st = {
            "master": MASTER_URL,
            "alive_workers": sum(1 for w in j["workers"] if w["state"] == "ALIVE"),
            "cores_total": j.get("cores"),
            "status": j.get("status"),
        }
    except Exception as e:  # master not up
        st = {"master": MASTER_URL, "status": f"DOWN ({e})"}
    if not quiet:
        print(json.dumps(st))
    return st


def stop() -> None:
    if not os.path.isdir(BASE):
        print(json.dumps({"status": "already stopped"}))
        return
    for f in sorted(os.listdir(BASE)):
        if f.endswith(".pid"):
            try:
                pid = int(open(f"{BASE}/{f}").read().strip())
                os.killpg(pid, signal.SIGTERM)
            except (ProcessLookupError, ValueError, PermissionError):
                pass
            os.unlink(f"{BASE}/{f}")
    time.sleep(2)
    shutil.rmtree("/dev/shm/nerzo-cluster-local", ignore_errors=True)
    print(json.dumps({"status": "stopped"}))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("start")
    s.add_argument("--workers", type=int, default=4)
    s.add_argument("--cores", type=int, default=4)
    s.add_argument("--mem", default="10g")
    s.add_argument("--no-pin", action="store_true",
                   help="skip taskset pinning (debug only; pinning is what "
                        "makes 1-vs-4-executor a fair 4-vs-16-core split)")
    sub.add_parser("stop")
    sub.add_parser("status")
    args = ap.parse_args()
    if args.cmd == "start":
        start(args.workers, args.cores, args.mem, pin=not args.no_pin)
    elif args.cmd == "stop":
        stop()
    else:
        status()


if __name__ == "__main__":
    main()
