"""Physical-plan assertions: the declarative operators must actually get the
optimizations they were designed for (SURVEY.md §4) — predicate pushdown to
the parquet scan, column pruning, broadcast joins for dimension tables, and
map-side partial aggregation."""

from __future__ import annotations

import contextlib
import io

from nerzo_spark.plans import catalog
import nerzo_spark.plans.catalog_text  # noqa: F401
import nerzo_spark.plans.catalog_vec  # noqa: F401

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_term_filter_pushed_to_scan(spark):
    plan = plan_of(catalog.queries()["p2_term_filter"](spark, SF))
    assert "PushedFilters" in plan
    assert "event_type" in plan.split("PushedFilters")[1].splitlines()[0]


def test_projection_prunes_scan_schema(spark):
    plan = plan_of(catalog.queries()["s9_content_hash_ids"](spark, SF))
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read  # pruned


def test_lookup_join_broadcasts_dimensions(spark):
    plan = plan_of(catalog.queries()["j5_lookup_join"](spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # customer AND nation


def test_q1_partial_aggregation(spark):
    plan = plan_of(catalog.queries()["a2_filter_agg_q1"](spark, SF))
    # map-side partial agg before the shuffle, final after
    assert "partial_" in plan.lower() or plan.count("HashAggregate") >= 2


def test_q1_filter_pushed(spark):
    plan = plan_of(catalog.queries()["a2_filter_agg_q1"](spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_q1_single_shuffle(spark):
    """Q1 shape must shuffle exactly once (on the two grouping keys)."""
    plan = plan_of(catalog.queries()["a2_filter_agg_q1"](spark, SF))
    tree = plan.split("(1) Scan")[0]  # operator tree, before node details
    assert tree.count("Exchange") == 1
