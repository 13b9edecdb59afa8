"""Time any declared catalog queries at a given SF dir under
bench-identical conf (named after its first target, e1_recall_at_k).

Usage: python jobs/profile_e1.py [sf_dir] [query ...]
Times each named query (default e1_recall_at_k) with .count() exactly as
bench.py does, printing wall seconds + the window's loadavg per query.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerzo_spark.session import get_spark, warm_python_workers


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    names = sys.argv[2:] or ["e1_recall_at_k"]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "profile-e1",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "1m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_python_workers(spark)

    from nerzo_spark.plans import catalog
    import nerzo_spark.plans.catalog_text  # noqa: F401
    import nerzo_spark.plans.catalog_vec  # noqa: F401
    import nerzo_spark.plans.catalog_more  # noqa: F401
    import nerzo_spark.plans.catalog_ivf  # noqa: F401
    import nerzo_spark.plans.catalog_kg  # noqa: F401

    qs = catalog.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        print(f"{name}: {dt:.2f}s rows={n} loadavg={os.getloadavg()[0]:.1f}")


if __name__ == "__main__":
    main()
