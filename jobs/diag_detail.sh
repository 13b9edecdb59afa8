#!/bin/bash
# One-off diagnostic sequence: per-stage decomposition + extract-only at
# 1.6M, 4-exec and 1-exec, serially, fresh zip.  Output: one JSON line each.
set -e
cd /root/repo
python - <<'EOF'
import json, subprocess, sys, os, time
sys.path.insert(0, "jobs")
from bench_cluster import build_zip, run_sample, wait_quiet

pyz = build_zip()
corpus = "/dev/shm/nerzo_corpus_1600000"
for stage in ("detail", "extract"):
    for execs in (4, 1):
        la = wait_quiet(2.0)
        r = run_sample(execs, corpus, 1600000, stage, pyz, "16-19")
        r["loadavg_at_start"] = round(la, 2)
        print(json.dumps({"want_execs": execs, **r}), flush=True)
EOF
