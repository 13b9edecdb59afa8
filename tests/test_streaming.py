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


def test_streaming_kg_equals_batch(spark, fixture_small, tmp_path):
    """Stream==batch twin for the WHOLE KG pipeline: corpus files landing in
    two waves, drained with availableNow through foreachBatch ->
    run_incremental, must produce exactly the batch pipeline's triples —
    and a REPLAYED batch (simulating foreachBatch at-least-once) must
    change nothing (manifest + partition overwrite idempotence)."""
    from pyspark.sql import functions as F

    from nerzo_spark.fixtures.spark_io import corpus_df
    from nerzo_spark.streaming.kg_stream import stream_kg_available_now

    fx = fixture_small
    corpus = corpus_df(spark, fx)
    repos = sorted({c["repo"] for c in fx.corpus})
    half = repos[: len(repos) // 2]

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "kg_stream")
    ckpt = str(tmp_path / "ckpt")

    # wave 1 lands, drain
    corpus.filter(F.col("repo").isin(half)).write.mode("append").parquet(landing)
    stats1 = stream_kg_available_now(spark, landing, fx.anchors, out, ckpt)
    assert sum(s["repos_extracted"] for s in stats1) == len(half)

    # wave 2 lands, drain again (stream checkpoint skips wave-1 files)
    corpus.filter(~F.col("repo").isin(half)).write.mode("append").parquet(landing)
    stats2 = stream_kg_available_now(spark, landing, fx.anchors, out, ckpt)
    assert sum(s["repos_extracted"] for s in stats2) == len(repos) - len(half)

    # replay simulation: drain once more -> nothing new, triples unchanged
    stats3 = stream_kg_available_now(spark, landing, fx.anchors, out, ckpt)
    assert sum(s["repos_extracted"] for s in stats3) == 0

    from nerzo_spark.pipeline.incremental import run_incremental

    batch_out = str(tmp_path / "kg_batch")
    run_incremental(spark, corpus, fx.anchors, batch_out)
    streamed = spark.read.parquet(out + "/triples").select("subj", "pred", "obj")
    batch = spark.read.parquet(batch_out + "/triples").select("subj", "pred", "obj")
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0
