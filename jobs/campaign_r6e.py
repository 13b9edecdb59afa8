"""Round-6 closing probe: FULL-pipeline per-job constants at 50k files.

campaign_r6d's extract-only 50k probe measured per-job constants of just
~2-3 s at the extract stage (4-exec wall 3.88 s vs ~1.8 s of steady-rate
work; 1-exec 7.99 s vs ~5.4 s) — refuting the 14-18 s additive-constant
model that BENCH.md had inferred by differencing the two scales.  But the
FULL pipeline adds the canonicalize + triples stages, whose per-job floor
(driver round-trips, small-stage scheduling) is exactly what sits on a
67-72 s 4-exec wall at 1.6M.  Measure it directly: full pipeline on the
50k corpus, where productive work is ~1/32 of the 1.6M job, so
wall ~= per-job floor + small work term, at both executor counts.

Protocol identical to campaign_r6{,b,c,d}: fresh pinned spark-submit per
sample, loadavg gate, pooled minima via jobs/analyze_campaign.py.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + float(os.environ.get("R6E_HOURS", "0.75")) * 3600
pyz = build_zip()
C50K = "/dev/shm/nerzo_corpus_50000"


def log(obj):
    print(json.dumps(obj), flush=True)


def sample(execs, stage, tag, gate=2.0):
    la = wait_quiet(gate, timeout_s=900)
    if time.time() > DEADLINE:
        return None
    try:
        r = run_sample(execs, C50K, 50000, stage, pyz, "16-19")
    except Exception as ex:
        log({"err": str(ex)[:400], "execs": execs, "stage": stage, "tag": tag})
        return None
    r.update(loadavg_at_start=round(la, 2),
             loadavg_at_end=round(os.getloadavg()[0], 2),
             want=execs, tag=tag)
    log(r)
    return r


cycle = 0
while time.time() < DEADLINE:
    cycle += 1
    sample(4, "full", "const50k_full")
    sample(1, "full", "const50k_full")
log({"CAMPAIGN_R6E": "done", "cycles": cycle})
