"""Broadcast cosine similarity top-k — the engine's join core (SURVEY.md §2.3).

The reference's entity-linking query scores EVERY stored vector against a
query vector with ``cosineSimilarity(...)+1.0`` over a *flat* (exact) index
and keeps the top-k (/root/reference/queries.py:218-230, consumed at
/root/reference/contrastive/fewnerd_retrieve_eval.py:65-92).  Flat index ==
exact brute force, so a broadcast GEMM is semantics-faithful, not an
approximation.

Physics: this is a broadcast nested-loop theta-join with top-k semantics.
The small side (label catalog / anchor set) is broadcast as a dense numpy
matrix inside the UDF closure; the big side streams through as Arrow batches
and each batch does ONE ``batch @ labels.T`` GEMM.  No shuffle at all for
top-1/top-k-per-row; ties broken by label_id for determinism
(reference tie-break ``sort: ["_score", ...]`` — fewnerd_retrieve_eval.py:74-76,
SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

LINK_SCHEMA = (
    "mention_id string, label_id string, coarse_type string, fine_type string, "
    "score double, rank int"
)


def link_topk(
    mentions: DataFrame,
    catalog: list[dict],
    emb_col: str = "emb",
    id_col: str = "mention_id",
    k: int = 1,
) -> DataFrame:
    """mentions(id, emb) x catalog -> (id, label_id, coarse, fine, score, rank).

    ``catalog`` is a small list of dicts {label_id, coarse_type, fine_type,
    emb: np.ndarray-like} — the broadcast side.  Rows are L2-normalized once
    per side so the GEMM *is* cosine.
    """
    # deterministic label order: by label_id (tie-break key)
    cat = sorted(catalog, key=lambda r: r["label_id"])
    mat = np.stack([np.asarray(r["emb"], dtype=np.float64) for r in cat])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    label_ids = [r["label_id"] for r in cat]
    coarse = [r["coarse_type"] for r in cat]
    fine = [r["fine_type"] for r in cat]
    kk = min(k, len(cat))

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            scores = v @ mat.T  # (batch, n_labels)
            # argsort desc with index (=label_id order) tie-break
            order = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "mention_id": pdf[id_col].to_numpy().repeat(kk),
                    "label_id": [label_ids[j] for row in order for j in row],
                    "coarse_type": [coarse[j] for row in order for j in row],
                    "fine_type": [fine[j] for row in order for j in row],
                    "score": scores[np.arange(n)[:, None], order].ravel(),
                    "rank": np.tile(np.arange(1, kk + 1), n).astype("int32"),
                }
            )
            yield out

    return mentions.select(id_col, emb_col).mapInPandas(_score, schema=LINK_SCHEMA)


def knn_self_join(
    vectors: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str | None = "label",
) -> DataFrame:
    """Exact k-NN all-pairs self-join, excluding self (SURVEY.md J2/P10) —
    the R-precision engine (/root/reference/contrastive/
    fewnerd_single_vector_r_precision.py:26-51, FAISS IndexFlatIP over
    L2-normalized vectors == brute-force cosine).

    Implementation: collect the (small, eval-sized) vector set once to the
    driver, broadcast it into a mapInPandas GEMM; each partition scores its
    own rows against the full matrix.  Scale path for corpus-sized sets:
    block the right side into B broadcast chunks and union the per-chunk
    top-k (same operator, bounded memory) — not needed at eval scale, noted
    per SURVEY.md §2.3.
    """
    cols = [id_col, emb_col] + ([label_col] if label_col else [])
    rows = vectors.select(*cols).collect()
    rows.sort(key=lambda r: r[id_col])
    ids = np.array([r[id_col] for r in rows])
    mat = np.stack([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    labels = np.array([r[label_col] for r in rows]) if label_col else None

    out_schema = f"query_id long, neighbor_id long, score double, rank int"
    if label_col:
        out_schema += ", query_label int, neighbor_label int"

    def _knn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        id_to_idx = {int(i): j for j, i in enumerate(ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            scores = v @ mat.T
            qidx = np.array([id_to_idx[int(i)] for i in pdf[id_col]])
            scores[np.arange(len(pdf)), qidx] = -np.inf  # self-exclusion (P10)
            kk = min(k, scores.shape[1] - 1)
            top = np.argsort(-scores, axis=1, kind="stable")[:, :kk]
            n = len(pdf)
            data = {
                "query_id": pdf[id_col].to_numpy().repeat(kk),
                "neighbor_id": ids[top].ravel(),
                "score": scores[np.arange(n)[:, None], top].ravel(),
                "rank": np.tile(np.arange(1, kk + 1), n).astype("int32"),
            }
            if labels is not None:
                data["query_label"] = (
                    np.array([labels[j] for j in qidx]).repeat(kk)
                )
                data["neighbor_label"] = labels[top].ravel()
            yield pd.DataFrame(data)

    return vectors.select(*cols).mapInPandas(_knn, schema=out_schema)
