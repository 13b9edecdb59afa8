"""Distributed corpus generation — mapInPandas over ``spark.range(n_files)``.

Row-identical to ``fixtures.corpus.generate`` (same pure ``gen_file``), but
the content never touches the driver: the miniature of reading an Iceberg
corpus snapshot.  Benchable at 10^5+ files; parallelism = range partitions.

Anchor embeddings for the label catalog need only the per-type pinned anchor
mentions, which come from a small driver-side ``generate`` call — anchors are
dimension-sized by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nerzo_spark.fixtures.corpus import SEED, _chain_plants, gen_file
from nerzo_spark.fixtures.spark_io import CORPUS_SCHEMA


def corpus_df_distributed(
    spark: SparkSession,
    n_files: int,
    seed: int = SEED,
    partitions: int | None = None,
) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism * 2
    plants = _chain_plants(n_files, seed)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_file(int(i), n_files, seed, plants)[0] for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_files, numPartitions=parts)
        .mapInPandas(_gen, schema=CORPUS_SCHEMA)
    )
