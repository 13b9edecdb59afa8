"""SparkSession factory tuned for the KG-construction workload.

Scale posture (the point, even though tests run on ``local[N]``):

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  at 100 TB the static plan is always wrong somewhere.
- shuffle partitions sized for the local core count; on a real cluster
  this is set per-job (``~2-3x total cores``) or left to AQE's
  ``advisoryPartitionSizeInBytes`` coalescing.
- Arrow enabled: every Python-side operator in this repo is an
  Arrow-batched pandas UDF (no row-at-a-time Python anywhere).
- broadcast threshold raised: the label/type catalog and anchor fixtures
  are tiny dimension tables and must never shuffle-join.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "nerzo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds pandas-UDF memory when `content` is large
        # (the reference caps context at 512 tokens, llm_interface.py:122 —
        # same motivation).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.maxResultSize", "2g")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
