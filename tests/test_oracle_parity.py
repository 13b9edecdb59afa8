"""Spark-vs-DuckDB parity for every oracle-backed catalog query at sf0.001
(fast) — the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from nerzo_spark.plans import catalog
import nerzo_spark.plans.catalog_ivf  # noqa: F401 — registers
import nerzo_spark.plans.catalog_more  # noqa: F401
import nerzo_spark.plans.catalog_text  # noqa: F401
import nerzo_spark.plans.catalog_vec  # noqa: F401

from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(catalog.oracle_sql().keys()))
def test_parity(spark, con, name):
    fn = catalog.queries()[name]
    sql = catalog.oracle_sql()[name]
    ok, msg = compare(fn(spark, SF_DIR), con, sql)
    assert ok, f"{name}: {msg}"
