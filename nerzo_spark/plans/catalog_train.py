"""Training-surface catalog: the two SURVEY.md §2 rows previously declared
out of scope as *gradient* training — re-expressed as their distributed
forward/eval computations, which ARE Spark-shaped:

- U8 ``u8_contrastive_losses`` — the reference's four contrastive loss
  functions (`contrastive/loss.py:33-70`: triplet / DPR / contrastive /
  combined) computed FORWARD over a deterministic triplet batch, as one
  global aggregate.  No gradients (torch stays out of scope); the loss
  *values* are the scoring-parity surface SURVEY §2.8 asked for — they are
  what the reference's eval loop logs per epoch.
- O4 ``o4_hpo_sweep`` — the reference's random-search HPO
  (`contrastive/contrastive_optimization_task.py:68-151`: sample configs,
  evaluate each trial's objective, keep the top-k — `get_top_experiments
  (top_k=5)`).  Here the trial grid is sampled with the portable md5
  generator, every trial is evaluated IN ONE PLAN against a shared scored
  table (score once, crossJoin the tiny trial table, aggregate per trial),
  and the top-5 by objective are returned — the 8-concurrent-worker /
  40-job ClearML fan-out becomes a single shuffle-free-until-the-vote
  Spark job.

These live in their OWN registry, not `catalog._REGISTRY`: the driver's
correctness gate caps at 50 queries and all 50 slots are taken by greener
claims; parity for this pair is enforced by `tests/test_train_parity.py`
through the same compare harness the driver uses (row count + schema +
order-insensitive value multiset vs DuckDB at sf0.001).

Scale notes (100 TB posture):
- triplet construction is a dense-id self-join (no global window: the
  batch size comes from a broadcast 1-row count, negatives from modular
  arithmetic on the dense vec_id) — shuffle-free except the equi-join;
- every loss is a sum/avg/max composition → map-side partial aggregation;
  the DPR log-sum-exp terms are bounded (cos ∈ [-1, 1] ⇒ exp ≤ e) so no
  max-shift is needed;
- the HPO sweep scores the corpus ONCE (the kNN table) and fans out only
  the trial dimension (8 rows, broadcast) — adding trials costs one more
  tiny dimension row, not another corpus scan; the per-trial vote is a
  groupBy with partial combine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nerzo_spark.functions.hashing import md5_i64_duckdb, md5_i64_sql
from nerzo_spark.plans.catalog import T, QueryFn
from nerzo_spark.plans.catalog_vec import _COS_DUCK, _COS_SPARK

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def _register(name: str, oracle: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


# =========================================================================
# U8 — contrastive loss forward (loss.py:33-70), batch-level scoring parity
# =========================================================================

_U8_ORACLE = f"""
WITH tot AS (SELECT count(*) AS n FROM embeddings),
base AS (
  SELECT e.vec_id, e.label, e.embedding,
         lead(e.embedding) OVER (PARTITION BY e.label ORDER BY e.vec_id) AS pos_emb,
         (e.vec_id * 17 + 3) % tot.n AS neg_id
  FROM embeddings e CROSS JOIN tot),
trip AS (
  SELECT {_COS_DUCK.format(a='b.embedding', b='b.pos_emb')} AS cp,
         {_COS_DUCK.format(a='b.embedding', b='g.embedding')} AS cn
  FROM base b JOIN embeddings g ON g.vec_id = b.neg_id AND g.label <> b.label
  WHERE b.pos_emb IS NOT NULL)
SELECT count(*) AS n_triplets,
       round(avg(greatest(0.0, cn - cp + 0.5)), 6) AS triplet_loss,
       round(-ln(sum(exp(cp)) / (sum(exp(cp)) + sum(exp(cn)))), 6) AS dpr_loss,
       round(avg(pow(greatest(1.0 - cp, 0.0), 2)) + avg(pow(cn, 2)), 6) AS contrastive_loss,
       round(avg(greatest(0.0, cn - cp + 0.5))
             + avg(pow(greatest(1.0 - cp, 0.0), 2)) + avg(pow(cn, 2)), 6) AS combined_loss
FROM trip
"""


@_register("u8_contrastive_losses", _U8_ORACLE)
def u8_contrastive_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8 — the reference's four loss forwards (`contrastive/loss.py:33-70`)
    over a deterministic (anchor, positive, negative) batch:

    - anchor = every embedding; positive = next same-label row (lead over
      the label partition, the in-class pairing of `fewnerd_processor`);
      negative = the dense-id row at ``(vec_id*17+3) mod n`` when its label
      differs (a fixed pseudo-shuffle, mirroring the random negative draw
      deterministically on both engines).
    - triplet (margin 0.5, distance 1-cos, mean reduction ≡
      ``triplet_margin_with_distance_loss``): mean(max(0, cn - cp + 0.5)).
    - DPR (`loss.py:40-44`, batch-level sums):
      -log(Σexp(cp) / (Σexp(cp) + Σexp(cn))).
    - contrastive (`loss.py:48-65`; the inner fn's margin stays its 1.0
      default): mean(clamp(1-cp, 0)²) + mean(cn²).
    - combined = triplet + contrastive (`loss.py:67-70`).

    One row out; every term a partially-aggregable sum — the whole loss
    evaluation is a map-side-combined global agg over the triplet join.
    """
    e = T(spark, sf_dir, "embeddings")
    tot = e.agg(F.count("*").alias("n"))
    w_lbl = Window.partitionBy("label").orderBy("vec_id")
    base = (
        e.withColumn("pos_emb", F.lead("embedding").over(w_lbl))
        .crossJoin(F.broadcast(tot))
        .withColumn("neg_id", (F.col("vec_id") * 17 + 3) % F.col("n"))
        .filter(F.col("pos_emb").isNotNull())
    )
    neg = e.select(
        F.col("vec_id").alias("g_id"),
        F.col("label").alias("g_label"),
        F.col("embedding").alias("neg_emb"),
    )
    trip = base.join(
        neg, (F.col("g_id") == F.col("neg_id")) & (F.col("g_label") != F.col("label"))
    ).select(
        F.expr(_COS_SPARK.format(a="embedding", b="pos_emb")).alias("cp"),
        F.expr(_COS_SPARK.format(a="embedding", b="neg_emb")).alias("cn"),
    )
    hinge = F.greatest(F.lit(0.0), F.col("cn") - F.col("cp") + F.lit(0.5))
    pos_term = F.pow(F.greatest(F.lit(1.0) - F.col("cp"), F.lit(0.0)), 2)
    return trip.agg(
        F.count("*").alias("n_triplets"),
        F.round(F.avg(hinge), 6).alias("triplet_loss"),
        F.round(
            -F.log(F.sum(F.exp("cp")) / (F.sum(F.exp("cp")) + F.sum(F.exp("cn")))), 6
        ).alias("dpr_loss"),
        F.round(F.avg(pos_term) + F.avg(F.pow("cn", 2)), 6).alias("contrastive_loss"),
        F.round(
            F.avg(hinge) + F.avg(pos_term) + F.avg(F.pow("cn", 2)), 6
        ).alias("combined_loss"),
    )


# =========================================================================
# O4 — HPO random search (contrastive_optimization_task.py:68-151)
# =========================================================================

_N_TRIALS = 8  # the reference's max_number_of_concurrent_tasks (:102)
_K_MAX = 15

_O4_ORACLE = f"""
WITH trials AS (
  SELECT CAST(i AS BIGINT) AS trial,
         CAST(1 + ({md5_i64_duckdb("'hpo_' || CAST(i AS VARCHAR)")} % {_K_MAX}) AS INT) AS k
  FROM generate_series(0, {_N_TRIALS - 1}) AS t(i)),
scored AS (
  SELECT a.vec_id AS qid, a.label AS qlab, b.label AS nlab,
         row_number() OVER (PARTITION BY a.vec_id ORDER BY
             {_COS_DUCK.format(a='a.embedding', b='b.embedding')} DESC, b.vec_id) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
votes AS (
  SELECT t.trial, t.k, s.qid, s.qlab, s.nlab, count(*) AS c
  FROM trials t JOIN scored s ON s.rn <= t.k
  GROUP BY t.trial, t.k, s.qid, s.qlab, s.nlab),
pred AS (
  SELECT trial, k, qlab, nlab,
         row_number() OVER (PARTITION BY trial, qid ORDER BY c DESC, nlab ASC) AS vr
  FROM votes),
acc AS (
  SELECT trial, k,
         round(avg(CASE WHEN nlab = qlab THEN 1.0 ELSE 0.0 END), 6) AS accuracy
  FROM pred WHERE vr = 1 GROUP BY trial, k)
SELECT CAST(row_number() OVER (ORDER BY accuracy DESC, trial ASC) AS INT) AS hpo_rank,
       trial, k, accuracy
FROM acc ORDER BY accuracy DESC, trial ASC LIMIT 5
"""


@_register("o4_hpo_sweep", _O4_ORACLE)
def o4_hpo_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 — random-search HPO (`contrastive_optimization_task.py:68-151`):
    sample hyperparameter configs, evaluate each trial's objective, return
    the top-5 (`get_top_experiments(top_k=5)`, `:151`).

    The swept config is the retrieval hyperparameter our engine actually
    exposes — the kNN vote size k, drawn per trial from the portable md5
    generator (≡ the reference's RandomSearch over its grid).  Objective =
    leave-one-out k-majority-vote label accuracy (the auc-series analog on
    this surface, maximized like `objective_metric_sign='max_global'`).

    Plan shape: the corpus is SCORED ONCE (kNN table at k_max); trials are
    a broadcast 8-row dimension crossed against it; the vote and accuracy
    are groupBy partial aggregates.  Adding trials never re-scans the
    corpus — the ClearML 8-worker fan-out becomes one shared-scan plan.
    """
    from nerzo_spark.operators.topk import knn_self_join

    e = T(spark, sf_dir, "embeddings")
    trials = spark.range(_N_TRIALS).select(
        F.col("id").alias("trial"),
        (1 + F.expr(md5_i64_sql("concat('hpo_', CAST(id AS STRING))")) % _K_MAX)
        .cast("int")
        .alias("k"),
    )
    knn = knn_self_join(e, k=_K_MAX)
    votes = (
        knn.crossJoin(F.broadcast(trials))
        .filter(F.col("rank") <= F.col("k"))
        .groupBy("trial", "k", "query_id", "query_label", "neighbor_label")
        .agg(F.count("*").alias("c"))
    )
    w_vote = Window.partitionBy("trial", "query_id").orderBy(
        F.desc("c"), F.asc("neighbor_label")
    )
    pred = votes.withColumn("vr", F.row_number().over(w_vote)).filter(F.col("vr") == 1)
    acc = pred.groupBy("trial", "k").agg(
        F.round(
            F.avg((F.col("neighbor_label") == F.col("query_label")).cast("double")), 6
        ).alias("accuracy")
    )
    w_rank = Window.orderBy(F.desc("accuracy"), F.asc("trial"))
    return (
        acc.withColumn("hpo_rank", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("hpo_rank") <= 5)
        .select("hpo_rank", "trial", "k", "accuracy")
    )
