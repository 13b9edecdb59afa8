"""Mention detection over source-code `content` (SURVEY.md §2.5 W7 analog).

The reference detects entity spans by reassembling tagged tokens with exact
char offsets and asserting ``all_text[start:end] == phrase``
(/root/reference/clearml_pipelines/fewnerd_pipeline/step_process_to_document.py:73-110).
Here, over raw source code, mention *proposal* is a union of untyped span
patterns (the type decision is made later by embedding-similarity linking,
never by the detector — that's the zero-shot contract of the north star).

Executed as ONE ``mapInPandas`` pass: each Arrow batch of corpus rows fans out
to mention rows carrying only (surface, small left/right context windows,
provenance, invariant check) — NOT the full content.  At 100 TB the content
column must die here; everything downstream is mention-sized.

Boundary semantics follow llm_interface.py:13-39 (delimiters before/after).
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEFT_CTX = 16
RIGHT_CTX = 8

#: Untyped span-proposal patterns (mention candidates).  Order matters only
#: for tie-breaks; overlaps are resolved longest-first below.
PROPOSAL_PATTERNS: list[str] = [
    r"(?m)^def ([A-Za-z_][A-Za-z0-9_]*)\(",          # callable definition
    r"(?m)^class ([A-Za-z_][A-Za-z0-9_]*):",          # type definition
    r"(?m)^([A-Z][A-Z0-9_]{2,}) = ",                  # screaming-case binding
    r"(?m)^import ([a-z][a-z0-9_.]*)$",               # module path
    r"\b([a-z0-9][a-z0-9._]*@[a-z0-9][a-z0-9.]*\.[a-z]{2,})\b",  # email
    r"(https?://[a-zA-Z0-9./_-]+)",                   # url
    r"(?<![\d.])((?:\d{1,3}\.){3}\d{1,3})(?![\d.])",  # ipv4
    r"(?<![\d.A-Za-z])(\d+\.\d+\.\d+)(?![\d.])",      # semver-ish
]

_COMPILED = [re.compile(p) for p in PROPOSAL_PATTERNS]


def propose_spans(content: str) -> list[tuple[int, int, str]]:
    """All candidate (start, end, surface) spans, overlap-resolved
    (longest match wins; deterministic)."""
    cands: list[tuple[int, int, str]] = []
    for rx in _COMPILED:
        for m in rx.finditer(content):
            s, e = m.span(1)
            cands.append((s, e, m.group(1)))
    # keep longest-first, then earliest; drop anything overlapping a kept span
    cands.sort(key=lambda t: (-(t[1] - t[0]), t[0], t[2]))
    kept: list[tuple[int, int, str]] = []
    for s, e, surf in cands:
        if all(e <= ks or s >= ke for ks, ke, _ in kept):
            kept.append((s, e, surf))
    kept.sort()
    return kept


MENTION_COLUMNS = [
    "mention_id", "repo", "path", "commit", "lang",
    "span_start", "span_end", "surface", "left_ctx", "right_ctx",
    "text_id", "sha_ok",
]

_MENTION_SCHEMA = (
    "mention_id string, repo string, path string, commit string, lang string, "
    "span_start int, span_end int, surface string, left_ctx string, "
    "right_ctx string, text_id string, sha_ok boolean"
)


def detect_mentions(corpus: DataFrame, repartition_to: int | None = None) -> DataFrame:
    """corpus(repo, path, commit, lang, content, content_sha256) -> mentions.

    - ``mention_id``: fnd_+sha1 content-hash id (step_index_to_database.py:36-39
      scheme) — the idempotent-upsert key.
    - ``sha_ok``: per-row sha256(content) invariant vs the carried
      ``content_sha256`` column (BASELINE.json input_hint), recorded here so
      lineage can aggregate it per partition.
    - Repartitions on hash(repo, path) first: mega-repos (~30% of rows in one
      repo in the fixture) otherwise serialize a single task.
    """
    if repartition_to:
        corpus = corpus.repartition(repartition_to, F.col("repo"), F.col("path"))

    def _detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in MENTION_COLUMNS}
            for repo, path, commit, lang, content, sha in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["lang"],
                pdf["content"], pdf["content_sha256"],
            ):
                content = content or ""
                sha_ok = hashlib.sha256(content.encode("utf-8")).hexdigest() == sha
                text_id = hashlib.sha1(content.encode("utf-8")).hexdigest()
                for s, e, surf in propose_spans(content):
                    assert content[s:e] == surf  # reference invariant :110
                    mid = "fnd_" + hashlib.sha1(
                        "".join([repo, path, commit, str(s), str(e), surf]).encode("utf-8")
                    ).hexdigest()
                    out["mention_id"].append(mid)
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["commit"].append(commit)
                    out["lang"].append(lang)
                    out["span_start"].append(s)
                    out["span_end"].append(e)
                    out["surface"].append(surf)
                    out["left_ctx"].append(content[max(0, s - LEFT_CTX):s])
                    out["right_ctx"].append(content[e:e + RIGHT_CTX])
                    out["text_id"].append(text_id)
                    out["sha_ok"].append(bool(sha_ok))
            yield pd.DataFrame(out)

    return corpus.mapInPandas(_detect, schema=_MENTION_SCHEMA)
