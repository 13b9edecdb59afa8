"""Clean persist-tax decomposition pair (BENCH.md r5 loose end): the
1-exec `--stage detail` sample was storm-crossed; retry quiet-gated until
a sample's END load shows no neighbor hit (own load: 1-exec ~4-5,
4-exec ~16), pinned cluster, 1.6M corpus.  Up to N attempts per config."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + 2.0 * 3600
pyz = build_zip()
C16 = "/dev/shm/nerzo_corpus_1600000"


def log(obj):
    print(json.dumps(obj), flush=True)


def attempt(execs, clean_end):
    la = wait_quiet(1.5, timeout_s=2400)
    if time.time() > DEADLINE:
        return None
    try:
        r = run_sample(execs, C16, 1600000, "detail", pyz, "16-19")
    except Exception as ex:
        log({"err": str(ex)[:300], "execs": execs})
        return None
    end = os.getloadavg()[0]
    r.update(loadavg_at_start=round(la, 2), loadavg_at_end=round(end, 2),
             want=execs, mode="pinned", clean=end < clean_end)
    log(r)
    return r


for _ in range(4):
    r = attempt(1, clean_end=6.0)
    if r and r["clean"]:
        break
for _ in range(3):
    r = attempt(4, clean_end=18.0)
    if r and r["clean"]:
        break
log({"DONE": True})
