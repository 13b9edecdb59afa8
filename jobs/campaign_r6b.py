"""Round-6 follow-up PINNED campaign: full-pipeline 1-2-4-executor curves
at BOTH scales (1.6M and 3.2M files), cycled quiet-gated into the
early-morning quiet window, plus the fine-partitioned 1.6M extract
reference for the embedder-partitioning lever.

Rationale (from the first r6 campaign): per-config minima keep improving
as quieter windows arrive — the 3.2M curve against round-5 floors already
reads eff(1->2) ~0.93, eff(2->4) ~1.0, so this round measures the full
three-point curve at the LARGER scale in one protocol, not stitched
across rounds.  Corpora: nerzo_corpus_1600000 (p64, round-5 continuity)
and nerzo_corpus_3200000_p256 (partitions = files/12500).
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + float(os.environ.get("R6B_HOURS", "3.2")) * 3600
pyz = build_zip()
C16 = "/dev/shm/nerzo_corpus_1600000"
C16_FINE = "/dev/shm/nerzo_corpus_1600000_p128"  # partitions = files/12500
C32 = "/dev/shm/nerzo_corpus_3200000_p256"


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


# clean partitioning-lever reference: 1.6M at files/12500 row groups (the
# p64 corpus puts 25k files/task — itself above the 12.5k cache-fit line)
extras = [
    lambda: sample(4, C16_FINE, 1600000, "extract", tag="part_ref16_fine"),
    lambda: sample(4, C16_FINE, 1600000, "extract", tag="part_ref16_fine"),
]
cycle = 0
while time.time() < DEADLINE:
    cycle += 1
    for execs in (4, 2, 1):
        sample(execs, C16, 1600000, "full", tag="curve16")
    for execs in (4, 2, 1):
        sample(execs, C32, 3200000, "full", tag="curve32")
    if extras and time.time() < DEADLINE:
        extras.pop(0)()
log({"CAMPAIGN_R6B": "done", "cycles": cycle})
