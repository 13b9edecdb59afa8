"""The distributed label-propagation path (driver_limit=0) must produce the
same clusters as the driver union-find path (default)."""

from __future__ import annotations

from nerzo_spark.operators.canonicalize import canonicalize_surfaces


def test_driver_and_distributed_paths_agree(spark, fixture_small):
    surfaces = spark.createDataFrame(
        sorted({(m["fine_type"], m["surface"]) for m in fixture_small.mentions}),
        "fine_type string, surface string",
    )
    a = canonicalize_surfaces(surfaces)  # driver union-find
    b = canonicalize_surfaces(surfaces, driver_limit=0)  # distributed loop
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
