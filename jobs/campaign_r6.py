"""Round-6 PINNED scaling campaign (VERDICT r5 tasks 1 and 5).

Prerequisites: `python jobs/cluster.py start` (pinned mode: four workers on
disjoint 4-core cpusets 0-3/4-7/8-11/12-15, driver taskset 16-19) and the
pre-materialized tmpfs corpora.

Phases:
  A. the 1-2-4-executor full-pipeline CURVE at 1.6M files — round 5's
     0.895 N->4N efficiency rests on two configuration points; a monotone
     three-point curve (eff(1->2) and eff(2->4)) closes the two-point-luck
     objection.  The 2-executor config is `spark.cores.max=8` with whole
     4-core executors, so the scheduler grants exactly two of the four
     pinned workers — same node type, two slices.
  B. the embedder-cache partitioning lever at 3.2M files, isolated at the
     extract stage: files/12500 partitions (256 row groups, per-task
     vocabulary fits the 262k-entry lru caches) vs files/50000 (64 row
     groups, vocabulary overflow — the measured 10.2k->6k mentions/s/core
     cliff), plus a 1.6M reference point on the same protocol.

Every sample is a fresh `spark-submit --py-files` gated on 1-min loadavg;
JSON lines on stdout (redirect to a log; pool per-config minima).
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + float(os.environ.get("R6_HOURS", "2.6")) * 3600
pyz = build_zip()
C16 = "/dev/shm/nerzo_corpus_1600000"
C32_FINE = "/dev/shm/nerzo_corpus_3200000_p256"  # partitions = files/12500
C32_COARSE = "/dev/shm/nerzo_corpus_3200000"     # partitions = 64 -> 50k files/task


def log(obj):
    print(json.dumps(obj), flush=True)


def sample(execs, corpus, files, stage, tag="", gate=2.0):
    la = wait_quiet(gate, timeout_s=1800)
    if time.time() > DEADLINE:
        return None
    try:
        r = run_sample(execs, corpus, files, stage, pyz, "16-19")
    except Exception as ex:
        log({"err": str(ex)[:400], "execs": execs, "files": files,
             "stage": stage, "tag": tag})
        return None
    r.update(loadavg_at_start=round(la, 2),
             loadavg_at_end=round(os.getloadavg()[0], 2),
             want=execs, tag=tag)
    log(r)
    return r


def curve_cycle():
    """One 4/2/1-executor full-pipeline cycle at 1.6M."""
    for execs in (4, 2, 1):
        sample(execs, C16, 1600000, "full", tag="curve16")


# ---- cycle 1 of the headline curve (rep0 is JIT-inflated; min-of-k) ----
curve_cycle()
# ---- phase B: partitioning lever, extract stage, 4 executors ----
for rep in range(2):
    sample(4, C32_FINE, 3200000, "extract", tag="part_fine")
    sample(4, C32_COARSE, 3200000, "extract", tag="part_coarse")
    sample(4, C16, 1600000, "extract", tag="part_ref16")
# ---- remaining time: more curve cycles + optional 3.2M 2-exec points ----
extras = [lambda: sample(2, C32_FINE, 3200000, "full", tag="curve32"),
          lambda: sample(2, C32_FINE, 3200000, "full", tag="curve32")]
cycle = 1
while time.time() < DEADLINE:
    cycle += 1
    curve_cycle()
    if cycle >= 3 and extras and time.time() < DEADLINE:
        extras.pop(0)()
log({"CAMPAIGN": "done", "cycles": cycle})
