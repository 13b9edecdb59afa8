"""Round-6 post-deadline top-up campaign: the tuned-1.6M linchpin plus a
DIRECT per-job-constant probe.

Two goals, both sharpening the round-6 BENCH.md story:

1. The tuned (p128) 1.6M curve's 1->4 efficiency sits at 0.703 with the
   4-exec floor at 71.14 s; the per-core-rate projection says a genuinely
   quiet window yields ~59-64 s (>= 0.79-0.86).  Oversample that config
   while the post-campaign host is quiet.
2. The "per-job constants ~14-18 s at 4 executors" claim in BENCH.md is
   currently a differencing estimate between the two scales' extract
   stages.  Measure it DIRECTLY: extract-only on the 50k corpus, where
   productive work is ~2 s at 4 exec (50k/1.6M of the 60.6 s fine floor)
   and ~7 s at 1 exec, so wall ~= constant + noise.  A handful of samples
   pins c4 and c1 without any model.

Protocol identical to campaign_r6{,b,c}: fresh pinned spark-submit per
sample, loadavg gate, min-of-k pooling via jobs/analyze_campaign.py.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + float(os.environ.get("R6D_HOURS", "1.5")) * 3600
pyz = build_zip()
C16_FINE = "/dev/shm/nerzo_corpus_1600000_p128"
C50K = "/dev/shm/nerzo_corpus_50000"


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


cycle = 0
while time.time() < DEADLINE:
    cycle += 1
    # linchpin first and twice: the whole tuned-curve claim hangs on it
    sample(4, C16_FINE, 1600000, "full", tag="curve16_fine")
    sample(4, C16_FINE, 1600000, "full", tag="curve16_fine")
    if cycle <= 3:  # constants probe converges fast (wall ~= constant)
        sample(4, C50K, 50000, "extract", tag="const50k")
        sample(1, C50K, 50000, "extract", tag="const50k")
    sample(1, C16_FINE, 1600000, "full", tag="curve16_fine")
log({"CAMPAIGN_R6D": "done", "cycles": cycle})
