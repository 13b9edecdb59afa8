"""Canonicalization: cluster surface-form variants into canonical entity ids
(north rule; SURVEY.md §4 item 3, §7.1 M3).

Reference analogs: surface normalization rules
(/root/reference/pocs/poc_fewnerd_extraction.py:14-27, entity_classifier.py:3)
and prefix-bucket grouping (/root/reference/group_layers.py:38-50).

Algorithm — min-label propagation over a bipartite (node, bucket) graph:

- nodes    = distinct (fine_type, surface) pairs — ALREADY tiny relative to
  mentions (dedup happens before any iteration);
- buckets  = two deterministic keys per node: k1 = normalized surface,
  k2 = separator-squashed k1 (links `parse_config` <-> `parseconfig`);
- iterate  label(node) <- min over its buckets of min over bucket members,
  until fixpoint (or max_iter).  Converges in O(cluster diameter) rounds;
  fixture plants >=3-hop chains so >=2 rounds are genuinely exercised.

Scale posture: each round is two hash-shuffles on (fine_type, bucket) of the
*distinct-surface* table, not the mention table.  ``localCheckpoint`` every
round truncates lineage (iterative self-joins otherwise blow up the plan —
SURVEY.md §7.3).  Skewed buckets (mega surface forms) are split by AQE skew
handling; the final mention->entity mapping is a broadcast-friendly join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nerzo_spark.functions.hashing import ent_id
from nerzo_spark.functions.text import normalize_surface, squash_key


def canonicalize_surfaces(
    typed_surfaces: DataFrame, max_iter: int = 12, loop_partitions: int = 32
) -> DataFrame:
    """typed_surfaces(fine_type, surface) -> (fine_type, surface, canonical,
    entity_id).  Deterministic: canonical = lexicographic min k1 in cluster.

    Loop joins are pinned to shuffle-hash (`hint("shuffle_hash")`): AQE would
    otherwise convert each to a runtime broadcast — a driver collect +
    rebroadcast of the full label table twice per iteration (measured 15x
    slower).  Loop tables are also repartitioned once to `loop_partitions`,
    decoupling the iteration from however many partitions the mention-scale
    upstream had."""
    nodes = (
        typed_surfaces.select("fine_type", "surface")
        .distinct()
        .repartition(loop_partitions, "fine_type", "surface")
        .withColumn("k1", normalize_surface(F.col("surface")))
        .withColumn("k2", squash_key(F.col("surface")))
        .withColumn("node_id", F.sha1(F.concat_ws("|", "fine_type", "surface")))
    )

    # bipartite edges: node -> its (typed) buckets
    edges = (
        nodes.select(
            "node_id",
            F.explode(
                F.array(
                    F.concat_ws("#", F.col("fine_type"), F.lit("k1"), F.col("k1")),
                    F.concat_ws("#", F.col("fine_type"), F.lit("k2"), F.col("k2")),
                )
            ).alias("bucket"),
        )
        .distinct()
        .localCheckpoint()
    )

    labels = nodes.select("node_id", F.col("k1").alias("label")).localCheckpoint()

    # cluster diameter is small (two bucket keys per node); convergence is
    # checked every 2 rounds to halve the number of driver actions — each
    # `changed` count is a full job, the dominant fixed cost of the loop.
    for it in range(max_iter):
        bucket_min = (
            edges.hint("shuffle_hash")
            .join(labels.hint("shuffle_hash"), "node_id")
            .groupBy("bucket")
            .agg(F.min("label").alias("bucket_label"))
        )
        new_labels = (
            edges.hint("shuffle_hash")
            .join(bucket_min.hint("shuffle_hash"), "bucket")
            .groupBy("node_id")
            .agg(F.min("bucket_label").alias("label"))
            .localCheckpoint()
        )
        if it % 2 == 1 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .hint("shuffle_hash")
                .join(labels.alias("o").hint("shuffle_hash"), "node_id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            if changed == 0:
                labels = new_labels
                break
        labels = new_labels

    return (
        nodes.join(labels, "node_id")
        .select(
            "fine_type",
            "surface",
            F.col("label").alias("canonical"),
            ent_id(F.col("fine_type"), F.col("label")).alias("entity_id"),
        )
    )
