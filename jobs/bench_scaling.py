"""Scaling-efficiency harness (BASELINE.md protocol): run the KG pipeline at
N and 4N cores on the SAME pre-materialized input, several repetitions,
report per-config minimum (the sandbox shares a host — external neighbor
load only ever ADDS time, so min-of-k is the least-biased estimator of
machine capability) and the efficiency (thr_4N / thr_N) / 4.

Usage: python jobs/bench_scaling.py --files 800000 --reps 3 --lo 4 --hi 16
Each (cores, rep) runs in a fresh taskset-pinned subprocess so JVM/worker
state never leaks between configs.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

RUNNER = r"""
import sys, time, json
from nerzo_spark.session import get_spark, warm_python_workers
from nerzo_spark.fixtures.corpus import anchor_rows_for
from nerzo_spark.fixtures.distributed import corpus_df_distributed
from nerzo_spark.pipeline.kg import build_label_catalog, run_kg_pipeline
from nerzo_spark.operators.extract_link import extract_and_link
C = int(sys.argv[1]); N = int(sys.argv[2]); STAGE = sys.argv[3]
# SAME plan at every core count: input partitioning and shuffle partitions
# are fixed (64 / 32) — only executor slots vary, as on a real cluster.
# Round 1 varied both WITH the core count (partitions=4*C, shuffle=C),
# which handed the low-core config a structurally cheaper plan and biased
# the efficiency ratio downward.
# maxPartitionBytes sized so the ~64-file corpus scan yields ~128 splits at
# every core count (default 128MB + 4MB openCost would pack it into ~4)
spark = get_spark(f"kg{C}", master=f"local[{C}]", shuffle_partitions=32,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "2m",
                              "spark.sql.files.openCostInBytes": "1m"})
spark.sparkContext.setLogLevel("ERROR")
warm_python_workers(spark)
# pre-materialized input = PARQUET on tmpfs (the Iceberg-shaped source the
# north rule names).  localCheckpoint held the corpus as 800k deserialized
# JVM row objects — iterating those from 16 task threads was itself a
# scaling sink (GC + pointer chasing); a columnar scan is the real input
# path AND scales.  Generation is excluded from the timed region either way.
import os, shutil
corpus_path = os.environ.get("NERZO_BENCH_CORPUS", f"/dev/shm/nerzo_corpus_{N}")
if not os.path.exists(corpus_path):
    corpus_df_distributed(spark, N, partitions=64).write.mode("overwrite").parquet(corpus_path + ".tmp")
    os.rename(corpus_path + ".tmp", corpus_path)
corpus = spark.read.parquet(corpus_path)
anchors = anchor_rows_for(N)
t0 = time.time()
if STAGE == "extract":
    catalog = build_label_catalog(anchors)
    n = extract_and_link(corpus, catalog).count()
    unit = "mentions"
else:
    res = run_kg_pipeline(spark, corpus, anchors)
    # per-arm sum plan == triples.count() (test-pinned); one cache scan
    n = res.triples_count.collect()[0]["n_triples"]
    unit = "triples"
dt = time.time() - t0
print(json.dumps({"cores": C, "files": N, "stage": STAGE, "sec": round(dt, 2),
                  unit: n, "tps": round(n / dt, 1)}))
"""


def run_once(cores: int, files: int, stage: str = "full") -> dict:
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", RUNNER,
        str(cores), str(files), stage,
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd="/root/repo"
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=800_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--lo", type=int, default=4)
    ap.add_argument("--hi", type=int, default=16)
    ap.add_argument("--stage", default="full", choices=["full", "extract"])
    args = ap.parse_args()

    runs: dict[int, list[dict]] = {args.lo: [], args.hi: []}
    for rep in range(args.reps):
        for cores in (args.hi, args.lo):
            r = run_once(cores, args.files, args.stage)
            runs[cores].append(r)
            print(json.dumps({"rep": rep, **r}), flush=True)

    best = {c: min(rs, key=lambda r: r["sec"]) for c, rs in runs.items()}
    thr_lo = best[args.lo]["tps"]
    thr_hi = best[args.hi]["tps"]
    eff = (thr_hi / thr_lo) / (args.hi / args.lo)
    print(json.dumps({
        "files": args.files, "stage": args.stage,
        "lo_cores": args.lo, "lo_best_sec": best[args.lo]["sec"], "lo_tps": thr_lo,
        "hi_cores": args.hi, "hi_best_sec": best[args.hi]["sec"], "hi_tps": thr_hi,
        "scaling_efficiency": round(eff, 3),
        "protocol": "min-of-%d per config, taskset-pinned, fresh JVM per run" % args.reps,
    }))


if __name__ == "__main__":
    main()
