"""Round-5 UNPINNED campaign: v5.1 code, cluster started with
`python jobs/cluster.py start --no-pin` — the protocol mode of round 4's
headline 0.653/0.706 figures, for apples-to-apples comparison
(campaign_r5_pinned.py ran PINNED: every executor in its own disjoint
4-core cpuset).  Cycles 3.2M and 1.6M full-pipeline pairs, quiet-gated,
fresh spark-submit per sample; JSON lines on stdout."""
import json, os, subprocess, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + 2.6 * 3600
pyz = build_zip()  # v5.1 + tripwire-anchor commit (no perf-path change)
C16 = "/dev/shm/nerzo_corpus_1600000"
C32 = "/dev/shm/nerzo_corpus_3200000_p256"


def log(obj):
    print(json.dumps(obj), flush=True)


def sample(execs, corpus, files, stage, gate=2.0):
    la = wait_quiet(gate, timeout_s=1800)
    if time.time() > DEADLINE:
        return None
    try:
        r = run_sample(execs, corpus, files, stage, pyz, "16-19")
    except Exception as ex:
        log({"err": str(ex)[:400], "execs": execs, "files": files,
             "stage": stage})
        return None
    r.update(loadavg_at_start=round(la, 2),
             loadavg_at_end=round(os.getloadavg()[0], 2),
             want=execs, mode="unpinned")
    log(r)
    return r


cycle = 0
while time.time() < DEADLINE:
    cycle += 1
    sample(4, C32, 3200000, "full")
    sample(1, C32, 3200000, "full")
    sample(4, C16, 1600000, "full")
    sample(1, C16, 1600000, "full")
log({"CAMPAIGN": "done", "cycles": cycle})
