"""The distributed label-propagation path (driver_limit=0) must produce the
same clusters as the driver union-find path (default), and the collision
broadcast gate's shuffle fallback must be both equivalent and genuinely
non-broadcast (ADVICE r5 / VERDICT r5 task 2)."""

from __future__ import annotations

import contextlib
import io

from nerzo_spark.operators.canonicalize import (
    _collision_semi_join,
    canonicalize_surfaces,
)


def _surfaces_df(spark, fixture_small):
    return spark.createDataFrame(
        sorted({(m["fine_type"], m["surface"]) for m in fixture_small.mentions}),
        "fine_type string, surface string",
    )


def _assert_same_clusters(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_driver_and_distributed_paths_agree(spark, fixture_small):
    surfaces = _surfaces_df(spark, fixture_small)
    a = canonicalize_surfaces(surfaces)  # driver union-find
    b = canonicalize_surfaces(surfaces, driver_limit=0)  # distributed loop
    _assert_same_clusters(a, b)


def test_broadcast_gate_fallback_identical_clusters(spark, fixture_small):
    """bucket_broadcast_bytes=0 forces the shuffle semi-join fallback on
    BOTH the driver path and the distributed loop path; clusters must not
    change."""
    surfaces = _surfaces_df(spark, fixture_small)
    base = canonicalize_surfaces(surfaces)
    fallback_driver = canonicalize_surfaces(surfaces, bucket_broadcast_bytes=0)
    fallback_dist = canonicalize_surfaces(
        surfaces, driver_limit=0, bucket_broadcast_bytes=0
    )
    _assert_same_clusters(base, fallback_driver)
    _assert_same_clusters(base, fallback_dist)


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_collision_semi_join_gate_controls_broadcast(spark):
    """Below the byte limit -> explicit BroadcastExchange; above -> shuffle
    semi-join.  Auto-broadcast is disabled for the assertion because Catalyst
    would otherwise broadcast any test-sized table on its own, making the
    no-broadcast branch unobservable."""
    edges = spark.createDataFrame(
        [("b1", "n1"), ("b1", "n2"), ("b2", "n3")], "bucket string, node_id string"
    )
    buckets = spark.createDataFrame([("b1",)], "bucket string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted = _collision_semi_join(edges, buckets, est_bytes=10, limit_bytes=1 << 20)
        assert "BroadcastExchange" in _plan_of(hinted)
        fallback = _collision_semi_join(edges, buckets, est_bytes=10, limit_bytes=0)
        assert "BroadcastExchange" not in _plan_of(fallback)
        assert sorted(r["node_id"] for r in fallback.collect()) == ["n1", "n2"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
