"""Materialize the INDEPENDENT gold fixture (pure-Python union-find, no
Spark) to committed parquet so the driver's DuckDB oracles can read it.

The four tables mirror the ``kg_*`` driver queries (catalog_kg.py), which run
the real pipeline over the same 120-file seed-42 corpus.  Gold is derived
only from fixtures/corpus.py's generator + union-find canonicalization
(reference parity gate: SURVEY.md §2.9 E7, north rule P/R >= 0.95) — it
never touches pipeline code, so a pipeline regression cannot silently
regenerate matching gold.

Usage: python jobs/make_gold.py  (writes nerzo_spark/fixtures/gold/*.parquet)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from nerzo_spark.fixtures.corpus import generate

GOLD_DIR = os.path.join(os.path.dirname(__file__), "..", "nerzo_spark", "fixtures", "gold")
N_FILES = 120


def _write(name: str, rows: list[dict], schema: pa.Schema) -> None:
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, os.path.join(GOLD_DIR, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def main() -> None:
    os.makedirs(GOLD_DIR, exist_ok=True)
    fx = generate(n_files=N_FILES)

    s = pa.string()
    _write(
        "triples",
        fx.triples,
        pa.schema([("subj", s), ("pred", s), ("obj", s),
                   ("repo", s), ("path", s), ("commit", s)]),
    )
    _write(
        "entities",
        fx.entities,
        pa.schema([("fine_type", s), ("surface", s),
                   ("canonical", s), ("entity_id", s)]),
    )
    mention_rows = [
        {
            "mention_id": m["mention_id"], "repo": m["repo"], "path": m["path"],
            "commit": m["commit"], "span_start": m["span_start"],
            "span_end": m["span_end"], "surface": m["surface"], "sha_ok": True,
        }
        for m in fx.mentions
    ]
    _write(
        "mentions",
        mention_rows,
        pa.schema([("mention_id", s), ("repo", s), ("path", s), ("commit", s),
                   ("span_start", pa.int64()), ("span_end", pa.int64()),
                   ("surface", s), ("sha_ok", pa.bool_())]),
    )
    lineage: dict[str, dict] = {}
    for m in fx.mentions:
        row = lineage.setdefault(
            m["repo"], {"repo": m["repo"], "rows_out": 0, "sha_ok": True,
                        "files": set(), "stage": "extract+link"})
        row["rows_out"] += 1
        row["files"].add(m["path"])
    lineage_rows = [
        {**r, "files": len(r["files"])} for r in sorted(lineage.values(), key=lambda r: r["repo"])
    ]
    # per-stage summary rows (O3): both pipeline paths (run_kg_pipeline and
    # run_incremental) emit one row per downstream stage with repo='__all__'
    # and the files=-1 sentinel; rows_out derives from the fixture alone
    # (entity / triple cardinalities), never from pipeline code
    lineage_rows += [
        {"repo": "__all__", "rows_out": len(fx.entities), "sha_ok": True,
         "files": -1, "stage": "canonicalize"},
        {"repo": "__all__", "rows_out": len(fx.triples), "sha_ok": True,
         "files": -1, "stage": "triples"},
    ]
    _write(
        "lineage",
        lineage_rows,
        pa.schema([("repo", s), ("rows_out", pa.int64()), ("sha_ok", pa.bool_()),
                   ("files", pa.int64()), ("stage", s)]),
    )


if __name__ == "__main__":
    main()
