"""IVF-style approximate nearest neighbor (catalog batch 5).

IVF = coarse quantization: assign every vector to its nearest centroid
("cell"), then search a query only within its closest `nprobe` cells.  The
centroid set here is deterministic (the embeddings of the 8 smallest-md5
vec_ids — a seeded coreset stand-in for k-means, which would just be an
iterative DataFrame job like canonicalize).  Exercises the same physics as
production IVF: candidate generation via equi-join on cell id (shuffle on a
low-cardinality key) instead of a cross join; recall traded for fan-in.

Scale: cells grow with sqrt(N) in production so each cell stays
executor-sized; the centroid table is always broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nerzo_spark.functions.hashing import md5_i64_duckdb, md5_i64_sql
from nerzo_spark.plans.catalog import T, T_par, register
from nerzo_spark.plans.catalog_vec import _COS_DUCK, _DOT_SPARK, _NORM_SPARK

N_CENTROIDS = 8
NPROBE = 2

# deterministic centroid pick: smallest md5(vec_id) -> rank 1..K
_CENT_DUCK = f"""
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell,
         embedding
  FROM embeddings
  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= {N_CENTROIDS}
"""


@register(
    "ann_ivf_probe",
    f"""WITH cent AS ({_CENT_DUCK}),
        assign AS (
          SELECT e.vec_id, e.embedding, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   {_COS_DUCK.format(a='e.embedding', b='c.embedding')} DESC, c.cell) AS cr
          FROM embeddings e CROSS JOIN cent c),
        cells AS (SELECT vec_id, embedding, cell FROM assign WHERE cr = 1),
        probes AS (
          SELECT vec_id AS query_id, embedding AS q_emb, cell
          FROM assign WHERE cr <= {NPROBE} AND vec_id < 8),
        scored AS (
          SELECT p.query_id, x.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY p.query_id ORDER BY
                   {_COS_DUCK.format(a='p.q_emb', b='x.embedding')} DESC, x.vec_id) AS rank
          FROM probes p JOIN cells x
            ON x.cell = p.cell AND x.vec_id <> p.query_id)
        SELECT query_id, neighbor_id, rank FROM scored WHERE rank <= 3""",
)
def ann_ivf_probe(spark, sf_dir):
    """IVF ANN: MAP-SIDE centroid assignment (centroids collected once —
    dimension-sized — and inlined as literal arrays into one sorted-sims
    array expression: Scan -> Project, NO Exchange before assignment; the
    old crossJoin + per-vec_id row_number window shuffled all N x K rows),
    nprobe=2 cell probing, exact cosine re-rank within the probed cells.

    The cosine stays the same sequential-fold SQL expression as the DuckDB
    oracle (bit-identical sums), so assignment ties resolve identically.

    r7 (guide §1.2/§2.5): T_par repairs the single-row-group scan skew;
    each centroid's norm is precomputed in PYTHON with the identical
    sequential sum-of-squares fold + IEEE sqrt (bit-identical double), and
    the row's own norm is computed once instead of once per centroid —
    per-row assignment work drops from 8 cosines x 3 folds to 8 dot folds
    + 1 norm fold; the probe-join cosine is factored the same way.  Every
    scalar op sequence is unchanged, so assignments, ranks and ties are
    bit-identical to the _COS_SPARK form."""
    import math

    e = T_par(spark, sf_dir, "embeddings")
    cent_rows = (
        e.select(
            "vec_id", "embedding", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(N_CENTROIDS)
        .collect()
    )

    def _lit_arr(vals) -> str:
        return "array(" + ", ".join(repr(float(v)) + "D" for v in vals) + ")"

    def _norm_py(vals) -> float:
        s = 0.0
        for v in vals:
            x = float(v)
            s = s + x * x
        return math.sqrt(s)

    e = e.withColumn("n_e", F.expr(_NORM_SPARK.format(v="embedding")))
    sims = ", ".join(
        "named_struct('sim', ("
        + _DOT_SPARK.format(a="embedding", b=_lit_arr(r["embedding"]))
        + f") / (n_e * {repr(_norm_py(r['embedding']))}D), 'cell', {cell})"
        for cell, r in enumerate(cent_rows, start=1)
    )
    sorted_cells = (
        f"array_sort(array({sims}), (l, r) -> CASE WHEN l.sim > r.sim THEN -1 "
        "WHEN l.sim < r.sim THEN 1 ELSE l.cell - r.cell END)"
    )
    assigned = e.withColumn("cells", F.expr(sorted_cells))
    cells = assigned.select(
        "vec_id", "embedding", "n_e", F.expr("cells[0].cell").alias("cell")
    )
    probes = (
        assigned.filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("n_e").alias("n_q"),
            F.explode(F.expr(f"transform(slice(cells, 1, {NPROBE}), c -> c.cell)")).alias("cell"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("s"), "vec_id")
    return (
        probes.join(cells, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "s",
            F.expr(_DOT_SPARK.format(a="q_emb", b="embedding"))
            / (F.col("n_q") * F.col("n_e")),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )
