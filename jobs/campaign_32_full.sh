#!/bin/bash
# Full-pipeline 1-vs-4-executor campaign at 3.2M files on the
# 256-partition corpus (production-shaped bounded per-task working sets),
# v4.2 code (canonicalize fix + minimal worker pool + Arrow-path driver
# tables).  3 reps, quiet-gated min-of-k, alternating hi/lo.
set -e
cd /root/repo
python - <<'EOF'
import json, sys
sys.path.insert(0, "jobs")
from bench_cluster import build_zip, run_sample, wait_quiet

pyz = build_zip()
corpus = "/dev/shm/nerzo_corpus_3200000_p256"
runs = {1: [], 4: []}
for rep in range(3):
    for execs in (4, 1):
        la = wait_quiet(2.0)
        r = run_sample(execs, corpus, 3200000, "full", pyz, "16-19")
        r["loadavg_at_start"] = round(la, 2)
        runs[execs].append(r)
        print(json.dumps({"rep": rep, "want_execs": execs, **r}), flush=True)

best = {e: min(rs, key=lambda r: r["sec"]) for e, rs in runs.items()}
print(json.dumps({
    "files": 3200000, "corpus": "p256", "code": "v4.2",
    "lo_best_sec": best[1]["sec"], "lo_tps": best[1]["tps"],
    "hi_best_sec": best[4]["sec"], "hi_tps": best[4]["tps"],
    "scaling_efficiency": round((best[4]["tps"] / best[1]["tps"]) / 4, 3),
}))
EOF
