"""Declarative FewNERD ingestion vs the sequential oracle (FIXTURES.md §6)."""

from __future__ import annotations

import os

from nerzo_spark.fixtures.fewnerd_fixture import gold_mentions, token_file_text
from nerzo_spark.sources.fewnerd import ingest_fewnerd


def test_ingest_matches_sequential_oracle(spark, tmp_path):
    p = tmp_path / "fewnerd_micro.txt"
    p.write_text(token_file_text())
    got = ingest_fewnerd(spark, str(p)).collect()
    gold = gold_mentions()

    keyed_got = {
        (r["doc_seq"], r["index_start"], r["index_end"]): r for r in got
    }
    keyed_gold = {
        (g["doc_seq"], g["index_start"], g["index_end"]): g for g in gold
    }
    assert set(keyed_got) == set(keyed_gold)
    for k, g in keyed_gold.items():
        r = keyed_got[k]
        assert r["phrase"] == g["phrase"]
        assert r["coarse_type"] == g["coarse_type"]
        assert r["fine_type"] == g["fine_type"]
        assert r["all_text"] == g["all_text"]
        assert r["text_id"] == g["text_id"]
        # the reference's core invariant (step_process_to_document.py:110)
        assert r["all_text"][r["index_start"]:r["index_end"]] == r["phrase"]


def test_adjacent_runs_merge(spark, tmp_path):
    p = tmp_path / "runs.txt"
    p.write_text("European\torg-union\nCentral\torg-union\nBank\torg-union\n")
    rows = ingest_fewnerd(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["phrase"] == "European Central Bank"
