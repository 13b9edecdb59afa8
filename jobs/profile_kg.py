"""Stage-wise profile of the bench kg_pipeline run (bench-identical conf).

Usage: python jobs/profile_kg.py [n_files]
Prints per-phase wall times: extract+surface (n_mentions action),
canonicalize (eager), triples_count collect, and the end-to-end wall the
bench would record.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerzo_spark.session import get_spark, warm_python_workers


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "profile-kg", master=f"local[{cores}]", shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    from nerzo_spark.fixtures.corpus import anchor_rows_for
    from nerzo_spark.fixtures.distributed import corpus_df_distributed
    from nerzo_spark.pipeline.kg import run_kg_pipeline

    corpus_path = f"/dev/shm/nerzo_corpus_{n_files}"
    if not os.path.exists(corpus_path):
        corpus_df_distributed(spark, n_files, partitions=64).write.mode(
            "overwrite").parquet(corpus_path + ".tmp")
        os.rename(corpus_path + ".tmp", corpus_path)
    corpus = spark.read.parquet(corpus_path)
    anchors = anchor_rows_for(n_files)

    la0 = os.getloadavg()[0]
    t0 = time.time()
    res = run_kg_pipeline(spark, corpus, anchors, repartition_to=4 * cores)
    t_mid = time.time()
    n = res.triples_count.collect()[0]["n_triples"]
    t1 = time.time()
    print(f"pipeline_build+extract: {t_mid - t0:.2f}s  "
          f"(lineage extract wall: see below)")
    print(f"triples_count collect: {t1 - t_mid:.2f}s")
    print(f"TOTAL: {t1 - t0:.2f}s  n_triples={n}  "
          f"thr={n / (t1 - t0):.0f}/s  loadavg {la0:.1f}->{os.getloadavg()[0]:.1f}")
    for r in res.lineage.filter("repo = '__all__'").collect():
        print(f"  stage={r['stage']} wall_ms={r['wall_ms']:.0f} rows={r['rows_out']}")
    print(f"  n_mentions={res.n_mentions}")


if __name__ == "__main__":
    main()
