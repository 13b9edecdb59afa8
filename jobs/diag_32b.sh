#!/bin/bash
# Concurrency-saturation probe at 3.2M, extract-only:
#   (a) 16 slots with NERZO_SKIP_WARM=1  — minimal python worker pool
#       (does pool-size-driven cache fragmentation explain the slowdown?)
#   (b) 8 slots (2 executors x 4 cores)  — mid point of the saturation curve
# Compare against the measured 214-241 s at 16 slots and ~350 s at 4 slots.
set -e
cd /root/repo
python - <<'EOF'
import json, os, sys
sys.path.insert(0, "jobs")
from bench_cluster import build_zip, run_sample, wait_quiet

pyz = build_zip()
corpus = "/dev/shm/nerzo_corpus_3200000"

os.environ["NERZO_SKIP_WARM"] = "1"
la = wait_quiet(2.0)
r = run_sample(4, corpus, 3200000, "extract", pyz, "16-19")
print(json.dumps({"variant": "16slots_skipwarm", "la": round(la, 2), **r}), flush=True)
del os.environ["NERZO_SKIP_WARM"]

la = wait_quiet(2.0)
r = run_sample(2, corpus, 3200000, "extract", pyz, "16-19")
print(json.dumps({"variant": "8slots_2exec", "la": round(la, 2), **r}), flush=True)
EOF
