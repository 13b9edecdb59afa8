#!/bin/bash
# Working-set theory test: the 3.2M corpus written with 64 partitions has 64
# row groups -> 64 data tasks of ~50k files each; per-task surface/context
# vocab (~400k) overflows the 262k-entry per-worker lru caches and extraction
# goes super-linear.  Regenerate the SAME corpus as 256 partitions (12.5k
# files/task, working set fits) and re-measure extract-only at 16 slots.
set -e
cd /root/repo
python - <<'EOF'
import json, os, subprocess, sys
sys.path.insert(0, "jobs")
from bench_cluster import build_zip, run_sample, wait_quiet

path = "/dev/shm/nerzo_corpus_3200000_p256"
if not os.path.exists(path):
    code = (
        "from nerzo_spark.session import get_spark\n"
        "from nerzo_spark.fixtures.distributed import corpus_df_distributed\n"
        "s = get_spark('gen', master='local[16]', shuffle_partitions=32)\n"
        "corpus_df_distributed(s, 3200000, partitions=256)"
        f".write.mode('overwrite').parquet('{path}.tmp')\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")
    os.rename(path + ".tmp", path)

pyz = build_zip()
for execs in (4, 1):
    la = wait_quiet(2.0)
    r = run_sample(execs, path, 3200000, "extract", pyz, "16-19")
    print(json.dumps({"variant": f"p256_{execs}exec", "la": round(la, 2), **r}), flush=True)
EOF
