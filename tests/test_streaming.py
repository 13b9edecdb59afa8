"""Streaming operators: stream output must equal the same aggregation run in
batch mode over the same files (Spark's unified-semantics contract)."""

from __future__ import annotations

import pytest

from nerzo_spark.streaming.windowed import (
    EVENT_SCHEMA,
    dedup_stream,
    read_event_stream,
    run_available_now,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_json_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_json")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.limit(800).coalesce(4).write.mode("overwrite").json(str(d / "in"))
    return str(d / "in")


def test_windowed_counts_stream_equals_batch(spark, event_json_dir):
    stream = read_event_stream(spark, event_json_dir)
    got = run_available_now(windowed_counts(stream), "wc_stream")

    batch = spark.read.schema(EVENT_SCHEMA).json(event_json_dir)
    want = windowed_counts(batch).collect()

    key = lambda r: (r["window_start"], r["event_type"])
    got_m = {key(r): (r["cnt"], r["sum_value"]) for r in got}
    want_m = {key(r): (r["cnt"], r["sum_value"]) for r in want}
    assert got_m == want_m and len(got_m) > 0


def test_dedup_stream_drops_duplicate_ids(spark, event_json_dir, tmp_path):
    # duplicate every file's contents once
    dup_dir = tmp_path / "dup"
    batch = spark.read.schema(EVENT_SCHEMA).json(event_json_dir)
    batch.unionAll(batch).coalesce(2).write.mode("overwrite").json(str(dup_dir))

    stream = dedup_stream(read_event_stream(spark, str(dup_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_stream_t").first()
    assert got["c"] == got["d"] == batch.select("event_id").distinct().count()
