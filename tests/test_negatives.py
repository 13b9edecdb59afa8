"""J3 — contrastive training-batch builder (operators/negatives.py):
reference parity (fewnerd_processor.py:11-72) + DuckDB oracle + invariances."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nerzo_spark.operators.negatives import training_batches, training_batches_duckdb
from tests.oracle_harness import compare, duck_con

SF = "/root/testdata/sf0.001"
PARAMS = dict(anchor_type="src0", n_batches=3, batch_size=5, hard_negative_ratio=0.4)


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_training_batches_matches_duckdb_oracle(spark):
    out = training_batches(_docs(spark), **PARAMS)
    con = duck_con(SF)
    ok, msg = compare(out, con, training_batches_duckdb(**PARAMS))
    assert ok, msg


def test_training_batches_shape_and_mix(spark):
    out = training_batches(_docs(spark), **PARAMS).toPandas()
    n_hard = math.ceil(PARAMS["hard_negative_ratio"] * PARAMS["batch_size"])
    n_easy = PARAMS["batch_size"] - n_hard
    for b in range(1, PARAMS["n_batches"] + 1):
        g = out[out.batch_id == b]
        counts = g.role.value_counts().to_dict()
        assert counts == {
            "anchor": 1,
            "positive": PARAMS["batch_size"],
            "hard_negative": n_hard,
            "easy_negative": n_easy,
        }
        # positives share the anchor's fine type; negatives never do
        assert set(g[g.role == "positive"].source) == {PARAMS["anchor_type"]}
        assert PARAMS["anchor_type"] not in set(
            g[g.role.str.endswith("negative")].source
        )
        # hard negatives ranked by descending more-like-this score
        hard = g[g.role == "hard_negative"].sort_values("rnk")
        assert list(hard.score) == sorted(hard.score, reverse=True)
        assert (hard.score >= 0).all()
    # anchors are distinct docs across batches (seeded ranking w/o replacement)
    anchors = out[out.role == "anchor"]
    assert anchors.doc_id.nunique() == PARAMS["n_batches"]


def test_training_batches_partitioning_invariant(spark):
    docs = _docs(spark)
    a = training_batches(docs, **PARAMS)
    b = training_batches(docs.repartition(13, "lang"), **PARAMS)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_training_batches_pool_cap_matches_oracle(spark):
    """Planted oversized pool: the seeded-order hard cap bounds every arm's
    candidate pool BEFORE ranking, identically in Spark and DuckDB."""
    params = dict(PARAMS, pool_cap=30)
    out = training_batches(_docs(spark), **params)
    ok, msg = compare(out, duck_con(SF), training_batches_duckdb(**params))
    assert ok, msg
    # the capped pool genuinely thinned the candidates: every non-anchor id
    # comes from the 30-row seeded prefix of its pool
    ids = {r["doc_id"] for r in out.collect()}
    assert 0 < len(ids) <= 1 + params["pool_cap"] * 2


def test_training_batches_pool_fraction_matches_oracle(spark):
    params = dict(PARAMS, pool_fraction=0.5)
    out = training_batches(_docs(spark), **params)
    ok, msg = compare(out, duck_con(SF), training_batches_duckdb(**params))
    assert ok, msg
    # thinned run is a genuine subset of the full pool's doc ids
    full = {r["doc_id"] for r in _docs(spark).select("doc_id").collect()}
    assert {r["doc_id"] for r in out.collect()} < full


def test_training_batches_no_single_partition_window(spark):
    """Scale posture (VERDICT r3 #2): the anchor pick must compile to
    TakeOrderedAndProject (distributed partial top-k), never a global
    single-partition sort window over the full pool — with or without the
    pool bounds."""
    import io
    from contextlib import redirect_stdout

    for extra in ({}, {"pool_cap": 30}, {"pool_fraction": 0.5}):
        df = training_batches(_docs(spark), **dict(PARAMS, **extra))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "TakeOrderedAndProject" in plan, plan[:2000]
        assert "Exchange SinglePartition" not in plan, plan[:2000]


def test_training_batches_no_hard_ratio_zero(spark):
    out = training_batches(
        _docs(spark), anchor_type="src1", n_batches=2, batch_size=4,
        hard_negative_ratio=0.0,
    )
    roles = {r["role"] for r in out.select("role").distinct().collect()}
    assert roles == {"anchor", "positive", "easy_negative"}
