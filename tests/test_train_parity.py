"""Spark-vs-DuckDB parity for the training-surface pair (U8 loss forwards,
O4 HPO sweep) — same compare harness as the driver's gate; these two live
outside the 50-slot driver registry (see plans/catalog_train.py)."""

from __future__ import annotations

import pytest

from nerzo_spark.plans import catalog_train

from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(catalog_train.oracle_sql().keys()))
def test_train_parity(spark, con, name):
    fn = catalog_train.queries()[name]
    sql = catalog_train.oracle_sql()[name]
    ok, msg = compare(fn(spark, SF_DIR), con, sql)
    assert ok, f"{name}: {msg}"


def test_o4_returns_ranked_top5(spark):
    rows = catalog_train.queries()["o4_hpo_sweep"](spark, SF_DIR).collect()
    assert [r["hpo_rank"] for r in rows] == [1, 2, 3, 4, 5]
    accs = [r["accuracy"] for r in rows]
    assert accs == sorted(accs, reverse=True)
    assert all(1 <= r["k"] <= 15 for r in rows)


def test_u8_losses_are_finite_and_consistent(spark):
    row = catalog_train.queries()["u8_contrastive_losses"](spark, SF_DIR).collect()[0]
    assert row["n_triplets"] > 0
    for c in ("triplet_loss", "dpr_loss", "contrastive_loss", "combined_loss"):
        assert row[c] == row[c] and row[c] >= 0.0  # finite, non-negative
    assert abs(row["combined_loss"] - (row["triplet_loss"] + row["contrastive_loss"])) < 2e-6
