"""J3 — contrastive training-batch builder: anchor + positives + mixed
hard/easy negatives (reference: contrastive/fewnerd_processor.py:11-72,
queries.py:277-324, dataset_provider.py:67-89).

Reference semantics, re-expressed declaratively:

- per batch: ONE random anchor mention of ``anchor_type``
  (``yield_dataset`` samples with batch_size=1), then ``batch_size``
  random positives of the anchor's fine type
  (``get_randomized_by_fine_type_fewnerd_v4``);
- negatives are a seeded MIX (``negative_examples``):
  ``ceil(hard_negative_ratio * batch_size)`` HARD negatives — candidates of
  OTHER fine types scored by ``more_like_this`` token overlap with the
  anchor text plus a ``boost: 5`` for sharing the anchor's coarse type
  (queries.py:287-320) — and the remaining EASY negatives sampled uniformly
  from other fine types;
- the reference's ES ``random_score`` is replaced by the repo-wide
  partitioning-invariant seeded order ``md5(key # ... # seed)``
  (SURVEY.md §7.3; same divergence as W5/W6), so output is deterministic
  and oracle-checkable.

Scale shape
-----------
The batch table is dimension-sized (``n_batches`` rows) and is BROADCAST
into every arm; candidate pools are touched once each:

- positives/easy: one pool scan x ``n_batches`` (broadcast nested loop),
  ranked per batch — the shuffle key is ``batch_id`` (bounded fan-out);
- hard: anchor tokens (tiny, broadcast) joined against the candidate token
  table, partial-aggregated map-side by (batch_id, id) — never an
  all-pairs join;
- the anchor pick is ``orderBy(seeded_key).limit(n_batches)`` —
  TakeOrderedAndProject (per-partition partial top-k, driver merge of
  ``n_batches`` rows), NOT a single-partition global-sort window; the only
  windows in the plan are per-``batch_id`` (bounded fan-out).
- at 10^12-file scale, ENFORCE a bounded candidate pool before the
  crossJoin fan-out: ``pool_fraction`` applies the repo-wide seeded md5
  threshold (``seeded_unit(id) < p``, map-side filter, zero extra
  shuffles), ``pool_cap`` applies a seeded-order hard cap
  (TakeOrderedAndProject).  Both are the same seeded-order family as the
  ranking itself, deterministic, partitioning-invariant, and mirrored in
  the DuckDB oracle; the ranking logic downstream is unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nerzo_spark.functions.hashing import DEFAULT_SEED, seeded_unit, seeded_unit_duckdb


def _order_key(id_col: Column, *tags: Column | str) -> Column:
    """md5 over 'id#tag#...#tag' — identical hex (and therefore identical
    sort order) in Spark and DuckDB."""
    parts = [id_col.cast("string")] + [
        t if isinstance(t, Column) else F.lit(str(t)) for t in tags
    ]
    return F.md5(F.concat_ws("#", *parts))


def training_batches(
    docs: DataFrame,
    *,
    anchor_type: str,
    n_batches: int,
    batch_size: int,
    hard_negative_ratio: float = 0.0,
    pool_fraction: float | None = None,
    pool_cap: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    fine_col: str = "source",
    coarse_col: str = "lang",
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Build ``n_batches`` contrastive batches over ``docs``.

    Returns (batch_id bigint, role string, <id_col>, <fine_col>,
    rnk bigint, score bigint): role in {anchor, positive, hard_negative,
    easy_negative}; ``score`` is the hard-negative more-like-this score
    (token overlap + 5 x same-coarse boost), -1 for other roles (a numeric
    NULL would round-trip as NaN through Arrow/pandas and break the
    engine-agnostic value comparison).

    ``pool_fraction`` / ``pool_cap`` bound the candidate pools BEFORE any
    ranking or crossJoin (module docstring, "Scale shape") — at corpus
    scale pass one of them so the pool x ``n_batches`` fan-out is bounded.
    With a thinned pool the batches are a seeded sample of the full-pool
    batches (same seeded-order family as the ranking); arms simply yield
    fewer rows if a thinned pool has fewer than ``batch_size`` candidates.
    """
    if n_batches < 1 or batch_size < 1:
        raise ValueError("n_batches and batch_size must be >= 1")
    n_hard = math.ceil(hard_negative_ratio * batch_size)
    if n_hard > batch_size:
        raise ValueError("hard_negative_ratio must be <= 1")
    n_easy = batch_size - n_hard

    _id, _fine, _coarse = F.col(id_col), F.col(fine_col), F.col(coarse_col)
    docs = docs.select(id_col, text_col, fine_col, coarse_col)
    if pool_fraction is not None:
        # map-side seeded thin: no shuffle, bounds every arm downstream
        docs = docs.filter(seeded_unit(_id, seed) < pool_fraction)
    pool_a = docs.filter(_fine == anchor_type)
    pool_n = docs.filter(_fine != anchor_type)
    if pool_cap is not None:
        # seeded-order hard cap: TakeOrderedAndProject (partial top-k per
        # partition, driver merge of pool_cap rows), never a global sort
        pool_a = pool_a.orderBy(_order_key(_id, "pool", "a", str(seed)), _id).limit(pool_cap)
        pool_n = pool_n.orderBy(_order_key(_id, "pool", "n", str(seed)), _id).limit(pool_cap)

    # anchors: one seeded pick per batch.  orderBy().limit() compiles to
    # TakeOrderedAndProject — a distributed partial top-k — so there is no
    # single-partition global-sort window even on an unthinned corpus-scale
    # pool; the row_number window then runs over <= n_batches rows (bounded
    # by construction; tests/test_negatives.py asserts no
    # "Exchange SinglePartition" survives in the physical plan).
    a_key = _order_key(_id, "anchor", str(seed))
    anchors = (
        pool_a.withColumn("_ak", a_key)
        .orderBy("_ak", id_col)
        .limit(n_batches)
        .withColumn(
            "batch_id",
            F.row_number().over(Window.orderBy("_ak", id_col)).cast("bigint"),
        )
        .drop("_ak")
    )
    a_dim = F.broadcast(
        anchors.select(
            "batch_id",
            F.col(text_col).alias("a_text"),
            _coarse.alias("a_coarse"),
        )
    )
    batch_ids = F.broadcast(anchors.select("batch_id"))

    null_score = F.lit(-1).cast("bigint").alias("score")

    t_anchor = anchors.select(
        "batch_id",
        F.lit("anchor").alias("role"),
        _id,
        _fine,
        F.lit(0).cast("bigint").alias("rnk"),
        null_score,
    )

    def _ranked(pool: DataFrame, tag: str, limit: int, role: str) -> DataFrame:
        w = Window.partitionBy("batch_id").orderBy(
            _order_key(_id, F.col("batch_id").cast("string"), tag, str(seed)), _id
        )
        return (
            pool.crossJoin(batch_ids)
            .withColumn("rnk", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rnk") <= limit)
            .select("batch_id", F.lit(role).alias("role"), _id, _fine, "rnk", null_score)
        )

    t_pos = _ranked(pool_a, "pos", batch_size, "positive")
    out = t_anchor.unionByName(t_pos)

    if n_hard > 0:
        # more_like_this ~ |distinct shared tokens| (same tokenization as J4,
        # plans/catalog.py j4_token_overlap_score) + coarse-type boost 5.
        tok = lambda c: F.explode(F.array_distinct(F.split(c, r"\s+"))).alias("tok")
        a_toks = F.broadcast(a_dim.select("batch_id", tok(F.col("a_text"))))
        c_toks = pool_n.select(_id, tok(F.col(text_col)))
        overlap = (
            c_toks.join(a_toks, "tok")
            .groupBy("batch_id", id_col)
            .agg(F.count("*").alias("n_common"))
        )
        w_hard = Window.partitionBy("batch_id").orderBy(F.col("score").desc(), _id)
        t_hard = (
            pool_n.crossJoin(a_dim.select("batch_id", "a_coarse"))
            .join(overlap, ["batch_id", id_col], "left")
            .withColumn(
                "score",
                (
                    F.coalesce(F.col("n_common"), F.lit(0))
                    + F.when(_coarse == F.col("a_coarse"), F.lit(5)).otherwise(F.lit(0))
                ).cast("bigint"),
            )
            .withColumn("rnk", F.row_number().over(w_hard).cast("bigint"))
            .filter(F.col("rnk") <= n_hard)
            .select("batch_id", F.lit("hard_negative").alias("role"), _id, _fine, "rnk", "score")
        )
        out = out.unionByName(t_hard)

    if n_easy > 0:
        out = out.unionByName(_ranked(pool_n, "easy", n_easy, "easy_negative"))
    return out


def training_batches_duckdb(
    *,
    anchor_type: str,
    n_batches: int,
    batch_size: int,
    hard_negative_ratio: float = 0.0,
    pool_fraction: float | None = None,
    pool_cap: int | None = None,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    fine_col: str = "source",
    coarse_col: str = "lang",
    seed: int = DEFAULT_SEED,
) -> str:
    """ANSI-SQL twin of :func:`training_batches` for the DuckDB oracle."""
    n_hard = math.ceil(hard_negative_ratio * batch_size)
    n_easy = batch_size - n_hard
    sid = str(seed)

    def key(tags: str) -> str:
        return f"md5(CAST({id_col} AS VARCHAR) || '#' || {tags})"

    anchor_key = key(f"'anchor#{sid}'")
    pos_key = key(f"CAST(batch_id AS VARCHAR) || '#pos#{sid}'")
    easy_key = key(f"CAST(batch_id AS VARCHAR) || '#easy#{sid}'")

    thin = (
        f" WHERE {seeded_unit_duckdb(id_col, seed)} < {pool_fraction}"
        if pool_fraction is not None
        else ""
    )

    def cap(tag: str) -> str:
        if pool_cap is None:
            return ""
        cap_key = key(f"'pool#{tag}#{sid}'")
        return (
            f" QUALIFY row_number() OVER (ORDER BY {cap_key}, {id_col})"
            f" <= {pool_cap}"
        )

    parts = [
        f"""pool AS (SELECT * FROM {table}{thin})""",
        f"""pool_a AS (
          SELECT * FROM pool WHERE {fine_col} = '{anchor_type}'{cap('a')})""",
        f"""pool_n AS (
          SELECT * FROM pool WHERE {fine_col} <> '{anchor_type}'{cap('n')})""",
        f"""anchors AS (
          SELECT *, CAST(row_number() OVER (ORDER BY {anchor_key}, {id_col}) AS BIGINT) AS batch_id
          FROM pool_a
          QUALIFY batch_id <= {n_batches})""",
        f"""t_anchor AS (
          SELECT batch_id, 'anchor' AS role, {id_col}, {fine_col},
                 CAST(0 AS BIGINT) AS rnk, CAST(-1 AS BIGINT) AS score
          FROM anchors)""",
        f"""t_pos AS (
          SELECT batch_id, 'positive' AS role, {id_col}, {fine_col},
                 CAST(row_number() OVER (PARTITION BY batch_id ORDER BY {pos_key}, {id_col}) AS BIGINT) AS rnk,
                 CAST(-1 AS BIGINT) AS score
          FROM pool_a CROSS JOIN (SELECT batch_id FROM anchors) b
          QUALIFY rnk <= {batch_size})""",
    ]
    arms = ["SELECT * FROM t_anchor", "SELECT * FROM t_pos"]
    if n_hard > 0:
        parts.append(
            f"""a_toks AS (
          SELECT DISTINCT batch_id, unnest(string_split_regex({text_col}, '\\s+')) AS tok
          FROM anchors),
        c_toks AS (
          SELECT DISTINCT {id_col}, unnest(string_split_regex({text_col}, '\\s+')) AS tok
          FROM pool_n),
        overlap AS (
          SELECT a.batch_id, c.{id_col}, count(*) AS n_common
          FROM c_toks c JOIN a_toks a USING (tok)
          GROUP BY a.batch_id, c.{id_col}),
        t_hard AS (
          SELECT p.batch_id, 'hard_negative' AS role, p.{id_col}, p.{fine_col},
                 CAST(row_number() OVER (PARTITION BY p.batch_id ORDER BY p.score DESC, p.{id_col}) AS BIGINT) AS rnk,
                 p.score
          FROM (
            SELECT n.*, a.batch_id,
                   CAST(coalesce(o.n_common, 0)
                        + (CASE WHEN n.{coarse_col} = a.{coarse_col} THEN 5 ELSE 0 END) AS BIGINT) AS score
            FROM pool_n n
            CROSS JOIN anchors a
            LEFT JOIN overlap o ON o.batch_id = a.batch_id AND o.{id_col} = n.{id_col}
          ) p
          QUALIFY rnk <= {n_hard})"""
        )
        arms.append("SELECT * FROM t_hard")
    if n_easy > 0:
        parts.append(
            f"""t_easy AS (
          SELECT batch_id, 'easy_negative' AS role, {id_col}, {fine_col},
                 CAST(row_number() OVER (PARTITION BY batch_id ORDER BY {easy_key}, {id_col}) AS BIGINT) AS rnk,
                 CAST(-1 AS BIGINT) AS score
          FROM pool_n CROSS JOIN (SELECT batch_id FROM anchors) b
          QUALIFY rnk <= {n_easy})"""
        )
        arms.append("SELECT * FROM t_easy")
    return "WITH " + ",\n".join(parts) + "\n" + " UNION ALL ".join(arms)
