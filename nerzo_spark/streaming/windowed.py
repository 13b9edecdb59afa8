"""Structured Streaming operators.

The reference is batch-only (its closest analogs are bounded cursor scans,
dataset_provider.py:92-110 — see SURVEY.md §2.10), so nothing here is parity
work; these are the incremental-processing operators a production KG/training
pipeline needs: windowed counts with event-time watermarks, session windows,
and within-watermark streaming dedup (the streaming face of the
content-hash upsert S8).

Every function takes and returns a streaming DataFrame; batch DataFrames work
too (Spark's unified semantics), which is how the tests cross-check stream
output against the equivalent batch aggregation on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream of event JSON (schema pinned: streaming sources
    must never infer schema)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts per event type with late-data watermark.

    Scale: state is bounded by (watermark / window) x |event_type|; the
    shuffle key is (window, event_type) so skewed types split via AQE in
    batch mode and by state-store partitioning in streaming.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — the stateful-op showcase."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark — streaming twin of the
    content-hash upsert (S8, step_index_to_database.py:42-49)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str | None = None
) -> list:
    """Drain a file-backed stream with the availableNow trigger into an
    in-memory sink and return the rows (test/bench harness).

    output_mode: None derives it from the plan — 'complete' only for
    aggregating streams (the only mode they accept with a memory sink);
    stateless streams (dropDuplicates, maps, filters) use 'append'."""
    if output_mode is None:
        plan = stream_df._jdf.queryExecution().analyzed().toString()
        output_mode = "complete" if "Aggregate" in plan else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
