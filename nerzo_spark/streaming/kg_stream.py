"""Streaming KG construction: Structured Streaming ingest feeding the
incremental pipeline (SURVEY.md §2.10 + the north rule's checkpoint/resume).

The reference processes corpora as batch jobs behind a DAG runner
(pipeline_controller.py); at 10^12-file scale new repos ARRIVE continuously,
so the Spark-first form is a file-source stream over the corpus table's
landing directory driving the SAME incremental pipeline per micro-batch:

- `readStream` (parquet file source, exactly-once file tracking via the
  stream checkpoint) discovers newly landed corpus files;
- `foreachBatch` hands each micro-batch to `pipeline.incremental
  .run_incremental`, which is idempotent BY CONSTRUCTION (manifest
  anti-join + dynamic partition overwrite of mentions) — so foreachBatch's
  at-least-once replay still yields exactly-once mention/triple rows;
- canonicalization + triples recompute globally per batch (clustering is a
  global fixpoint — see incremental.py's module docstring), which is cheap
  relative to extraction because its input is distinct-surface-sized.

`trigger(availableNow=True)` drains the backlog and stops — the batch/
stream twin used in tests; a production deployment would run the same query
with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, content_sha256 string"
)


def stream_kg_available_now(
    spark: SparkSession,
    landing_dir: str,
    anchors: list[dict],
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[dict]:
    """Drain all corpus files currently in `landing_dir` through the
    incremental KG pipeline; returns the per-batch stats dicts."""
    from nerzo_spark.pipeline.incremental import run_incremental

    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)

    stats: list[dict] = []

    def _process(batch_df, batch_id: int) -> None:
        s = run_incremental(spark, batch_df, anchors, out_dir)
        s["batch_id"] = batch_id
        stats.append(s)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
