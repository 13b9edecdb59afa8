#!/bin/bash
# Diagnostic: why does the 4-exec full pipeline blow up super-linearly at
# 3.2M files (262s extract_link_persist vs 62.8s at 1.6M) while 1-exec
# stays linear?  Decompose: extract-only then detail, 4-exec first.
set -e
cd /root/repo
python - <<'EOF'
import json, sys
sys.path.insert(0, "jobs")
from bench_cluster import build_zip, run_sample, wait_quiet

pyz = build_zip()
corpus = "/dev/shm/nerzo_corpus_3200000"
for stage, execs in (("extract", 4), ("detail", 4), ("extract", 1)):
    la = wait_quiet(2.0)
    r = run_sample(execs, corpus, 3200000, stage, pyz, "16-19")
    r["loadavg_at_start"] = round(la, 2)
    print(json.dumps({"want_execs": execs, **r}), flush=True)
EOF
