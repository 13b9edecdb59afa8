"""Smoke tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_triples(spark):
    df = entrymod.entry(spark)
    assert set(df.columns) == {"subj", "pred", "obj", "repo", "path", "commit"}
    assert df.count() > 0
    preds = {r["pred"] for r in df.select("pred").distinct().collect()}
    assert preds == {"links_to", "typed_as", "defined_in", "subtype_of"}


def test_queries_have_oracles_or_are_kg(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    missing = {k for k in qs if k not in oracles}
    # only the non-SQL-expressible KG pipeline entries may lack oracles
    assert all(k.startswith("kg_") for k in missing), missing
