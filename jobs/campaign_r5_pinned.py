"""Round-5 PINNED scaling campaign (the BENCH.md r5 headline tables).

Prerequisites: `python jobs/cluster.py start` (default pinned mode: four
workers taskset-pinned to disjoint 4-core cpusets, driver block 16-19)
and the pre-materialized tmpfs corpora (run_kg_bench.py generates them on
first use).  Phases: (A) one persist-tax `--stage detail` pair, (B) the
columnar-cache-compression conf A/B, the e1 warmup probe (VERDICT r4
task 2), then (C) quiet-gated full-pipeline 1-vs-4-executor pairs cycled
until the deadline, plus one local[C] control pair.  Every sample is a
fresh `spark-submit --py-files`; all samples land on stdout as JSON
lines (redirect to a log and pool per-config minima)."""
import json, os, subprocess, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + 4.2 * 3600
pyz = build_zip()  # v5.1: per-arm count + compact key + fused surface count
C16 = "/dev/shm/nerzo_corpus_1600000"
C32 = "/dev/shm/nerzo_corpus_3200000_p256"


def log(obj):
    print(json.dumps(obj), flush=True)


def sample(execs, corpus, files, stage, conf=None, gate=2.0):
    la = wait_quiet(gate, timeout_s=1800)
    if time.time() > DEADLINE:
        return None
    if conf:
        os.environ["NERZO_EXTRA_CONF"] = conf
    else:
        os.environ.pop("NERZO_EXTRA_CONF", None)
    try:
        r = run_sample(execs, corpus, files, stage, pyz, "16-19")
    except Exception as ex:
        log({"err": str(ex)[:400], "execs": execs, "files": files,
             "stage": stage, "conf": conf})
        return None
    r.update(loadavg_at_start=round(la, 2),
             loadavg_at_end=round(os.getloadavg()[0], 2),
             want=execs, conf=conf or "")
    log(r)
    return r


def e1_probe():
    code = (
        "import time, json\n"
        "from nerzo_spark.session import get_spark, warm_python_workers\n"
        "from __spark_entry__ import queries\n"
        "s = get_spark('e1probe', shuffle_partitions=32)\n"
        "s.sparkContext.setLogLevel('ERROR')\n"
        "warm_python_workers(s)\n"
        "q = queries()['e1_recall_at_k']\n"
        "ts = []\n"
        "for i in range(4):\n"
        "    t0 = time.time(); q(s, '/root/testdata/sf0.1').count()\n"
        "    ts.append(round(time.time() - t0, 3))\n"
        "print(json.dumps({'e1_probe_secs': ts}))\n"
    )
    la = wait_quiet(1.5, timeout_s=1800)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    log({"e1_probe": json.loads(line[-1]) if line else out.stderr[-300:],
         "loadavg_at_start": round(la, 2),
         "loadavg_at_end": round(os.getloadavg()[0], 2)})


def localc_pair():
    from bench_scaling import run_once
    for cores in (32, 8):
        la = wait_quiet(1.8, timeout_s=1800)
        if time.time() > DEADLINE:
            return
        try:
            r = run_once(cores, 1600000, "full")
        except subprocess.CalledProcessError as ex:
            log({"err": (ex.stderr or "")[-400:], "localc": cores})
            continue
        r.update(loadavg_at_start=round(la, 2),
                 loadavg_at_end=round(os.getloadavg()[0], 2), mode="localC")
        log(r)


# ---- phase A: persist-tax decomposition (decisive; once) ----
sample(4, C16, 1600000, "detail")
sample(1, C16, 1600000, "detail")
# ---- phase B: cache-build conf probe at the cheap config ----
sample(4, C16, 1600000, "full",
       conf="spark.sql.inMemoryColumnarStorage.compressed=false")
sample(4, C16, 1600000, "full")
e1_probe()
# ---- phase C: cycle full pairs for floors ----
extras = ["localc"]
cycle = 0
while time.time() < DEADLINE:
    cycle += 1
    sample(4, C16, 1600000, "full")
    sample(1, C16, 1600000, "full")
    sample(1, C32, 3200000, "full")
    sample(4, C32, 3200000, "full")
    if extras and time.time() < DEADLINE:
        ex = extras.pop(0)
        if ex == "localc":
            localc_pair()
log({"CAMPAIGN": "done", "cycles": cycle})
