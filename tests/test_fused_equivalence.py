"""The fused extract_and_link operator must equal the composition
detect_mentions -> embed_mentions -> link_topk (same ids, same labels)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nerzo_spark.embed.embedder import embed_mentions
from nerzo_spark.fixtures.spark_io import corpus_df
from nerzo_spark.operators.extract_link import extract_and_link
from nerzo_spark.operators.spans import detect_mentions
from nerzo_spark.operators.topk import link_topk
from nerzo_spark.pipeline.kg import build_label_catalog


def test_fused_equals_composed(spark, fixture_small):
    fx = fixture_small
    corpus = corpus_df(spark, fx)
    catalog = build_label_catalog(fx.anchors)

    fused = extract_and_link(corpus, catalog).select(
        "mention_id", "label_id", "fine_type"
    )

    membed = embed_mentions(detect_mentions(corpus))
    composed = link_topk(membed, catalog, k=1).filter(F.col("rank") == 1).select(
        "mention_id", "label_id", "fine_type"
    )

    assert fused.count() == composed.count()
    assert fused.exceptAll(composed).count() == 0
    assert composed.exceptAll(fused).count() == 0
