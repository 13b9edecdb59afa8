"""spark-submit entrypoint for the KG-construction pipeline (north rule:
``spark-submit --py-files nerzo_spark.zip jobs/run_kg.py ...``).

Reads a corpus parquet (or generates the deterministic fixture corpus when
--gen-files is given), runs the full pipeline, writes triples/entities/
lineage/manifest under --output, prints a one-line JSON summary.

Param plumbing mirrors the reference's dataclass-args pattern
(/root/reference/contrastive/args.py:5-52, runtime_args.py:18-36) as argparse.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", help="parquet path of corpus table")
    ap.add_argument("--gen-files", type=int, default=0,
                    help="generate fixture corpus with N files instead of reading --corpus")
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip repos already committed in the manifest")
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from nerzo_spark.fixtures.corpus import generate
    from nerzo_spark.fixtures.spark_io import anchors_df, corpus_df
    from nerzo_spark.pipeline.kg import run_kg_pipeline
    from nerzo_spark.pipeline.manifest import ManifestStore
    from nerzo_spark.session import get_spark

    spark = get_spark("nerzo-kg", master=args.master,
                      shuffle_partitions=args.partitions)
    t0 = time.time()

    if args.gen_files:
        fx = generate(n_files=args.gen_files)
        corpus = corpus_df(spark, fx)
        anchors = anchors_df(spark, fx)
    else:
        if not args.corpus:
            ap.error("--corpus or --gen-files required")
        corpus = spark.read.parquet(args.corpus)
        fx = generate(n_files=120)  # anchors fixture (pinned golden mentions)
        anchors = anchors_df(spark, fx)

    store = ManifestStore(spark, args.output)
    if args.resume:
        corpus = store.filter_uncommitted(corpus, "triples", "repo")

    n_corpus = corpus.count()
    if n_corpus == 0:
        print(json.dumps({"triples": 0, "skipped": True, "sec": time.time() - t0}))
        return 0

    res = run_kg_pipeline(spark, corpus, anchors,
                          repartition_to=args.partitions)

    triples_path = os.path.join(args.output, "triples")
    res.triples.write.mode("append").partitionBy("pred").parquet(triples_path)
    res.entities.write.mode("overwrite").parquet(os.path.join(args.output, "entities"))
    res.lineage.write.mode("append").parquet(os.path.join(args.output, "lineage"))
    repos = [r["repo"] for r in corpus.select("repo").distinct().collect()]
    store.commit("triples", repos)

    n_triples = spark.read.parquet(triples_path).count()
    n_mentions = res.mentions.count()
    sha_bad = res.mentions.filter(~F.col("sha_ok")).count()
    elapsed = time.time() - t0
    print(json.dumps({
        "corpus_rows": n_corpus,
        "mentions": n_mentions,
        "triples_total": n_triples,
        "sha_violations": sha_bad,
        "sec": round(elapsed, 2),
        "triples_per_sec": round(n_triples / elapsed, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
