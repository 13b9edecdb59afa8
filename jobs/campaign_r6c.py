"""Round-6 final PINNED campaign — floor-chasing the under-sampled configs
plus the tuned-partitioning curve.

Motivation (pooled r6+r6b state): the 1-exec floors are well-settled
(1.6M: 224.5 s over 9 samples), but the 4-exec configs have not seen a
genuinely quiet window this round (1.6M: 83.0 vs the consistency-implied
~65-70; 3.2M: 159.7 vs round 5's proven 117.6), so per-config minima are
asymmetrically storm-biased AGAINST the scaling claim.  This cycle
oversamples exactly the configs whose floors are known-contaminated, and
adds the full 1-2-4 curve on the fine-partitioned 1.6M corpus
(partitions = files/12500, the embedder-cache-fit lever of
embed/embedder.py — the configuration the engine itself documents as
correct, on which extract already measured ~10% faster at 4 exec).

Every sample is still the same protocol: fresh spark-submit, pinned
4-core executors, loadavg-gated start, min-of-k pooling.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo/jobs")
os.chdir("/root/repo")
from bench_cluster import build_zip, run_sample, wait_quiet

DEADLINE = time.time() + float(os.environ.get("R6C_HOURS", "3.4")) * 3600
pyz = build_zip()
C16 = "/dev/shm/nerzo_corpus_1600000"
C16_FINE = "/dev/shm/nerzo_corpus_1600000_p128"
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


cycle = 0
while time.time() < DEADLINE:
    cycle += 1
    # the 4-exec fine sample is the 1.6M curve's linchpin (per-core rates
    # at p256/3.2M predict ~59-64 s quiet): give it the freshest window
    sample(4, C16_FINE, 1600000, "full", tag="curve16_fine")
    sample(4, C16, 1600000, "full", tag="curve16")
    sample(4, C32, 3200000, "full", tag="curve32")
    sample(2, C16_FINE, 1600000, "full", tag="curve16_fine")
    # 3.2M curve interior + tail (r6 floors rest on 1-2 samples each)
    sample(2, C32, 3200000, "full", tag="curve32")
    sample(1, C32, 3200000, "full", tag="curve32")
    sample(1, C16_FINE, 1600000, "full", tag="curve16_fine")
log({"CAMPAIGN_R6C": "done", "cycles": cycle})
