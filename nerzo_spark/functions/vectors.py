"""Vector expressions over ``array<float>`` columns (SURVEY.md §2.7 F11-F12).

Pure Spark SQL expressions (JVM-side) for the cases where the vector math is
part of a declarative plan; the bulk GEMM path for top-k linking lives in
``operators/topk.py`` as an Arrow-batched pandas UDF.

Reference parity:
- cosine similarity: ES ``cosineSimilarity(params.query, field)`` script,
  /root/reference/queries.py:224; torch form /root/reference/contrastive/loss.py:31.
- vector representations diff / end / start_end_pair:
  /root/reference/contrastive/fewnerd_processor.py:108-117.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """F11 — normalized dot product; NULL-safe on zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def vec_diff(end: Column, start: Column) -> Column:
    """F12 'diff' repr — fewnerd_processor.py:108-111."""
    return F.zip_with(end, start, lambda e, s: e - s)


def vec_pair(start: Column, end: Column) -> Column:
    """F12 'start_end_pair' repr — concat of the two vectors."""
    return F.concat(start, end)


# SQL text twins -------------------------------------------------------------

def cosine_sql(a: str, b: str) -> str:
    """Spark-SQL text form of :func:`cosine` (for spark.sql strings)."""
    d = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, x) -> s + x)"
    na = f"sqrt(aggregate({a}, 0D, (s, x) -> s + x * x))"
    nb = f"sqrt(aggregate({b}, 0D, (s, x) -> s + x * x))"
    return f"(CASE WHEN {na} * {nb} > 0 THEN {d} / ({na} * {nb}) ELSE 0.0 END)"
