"""KG-pipeline queries for the driver contract.

These run the full north-star pipeline (detect -> embed -> link ->
canonicalize -> triples) over the deterministic fixture corpus (seed 42).
They are genuinely non-SQL-expressible (iterative connected components,
pandas-UDF embedder), so no oracle_sql twins — the driver records the weaker
rows-only check; the strong correctness gate for these is
tests/test_kg_e2e.py's triple P/R >= 0.95 vs the independent gold fixture.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import functions as F

from nerzo_spark.plans.catalog import register


@lru_cache(maxsize=1)
def _fixture():
    from nerzo_spark.fixtures.corpus import generate

    return generate(n_files=120)


def _run(spark):
    from nerzo_spark.fixtures.spark_io import anchors_df, corpus_df
    from nerzo_spark.pipeline.kg import run_kg_pipeline

    fx = _fixture()
    return run_kg_pipeline(
        spark, corpus_df(spark, fx), anchors_df(spark, fx), repartition_to=8
    )


@register("kg_triples", None)
def kg_triples(spark, sf_dir):
    """North star end-to-end: (subj, pred, obj, provenance) triples."""
    return _run(spark).triples


@register("kg_entities", None)
def kg_entities(spark, sf_dir):
    """Canonical entity table after iterative surface-form clustering."""
    return _run(spark).entities


@register("kg_mentions", None)
def kg_mentions(spark, sf_dir):
    """Detected mention spans with offsets + sha256 invariant flags."""
    return _run(spark).mentions.select(
        "mention_id", "repo", "path", "commit", "span_start", "span_end",
        "surface", "sha_ok",
    )


@register("kg_lineage", None)
def kg_lineage(spark, sf_dir):
    """Per-partition lineage rows (rows_out, sha_ok, files per repo)."""
    return _run(spark).lineage.select(
        "repo", "rows_out", "sha_ok", "files", "stage"
    )
