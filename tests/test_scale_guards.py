"""Scale-guard regression tests: LSH band-size cap, blocked kNN, U5/U6
projection heads, S7 schema evolution, F2 token offsets."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


# --- MinHash-LSH skew guard ---------------------------------------------------

def _shingles(df):
    from nerzo_spark.plans.catalog_text import _SHINGLE_SPARK

    return df.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_SHINGLE_SPARK))).alias("s")
    )


def test_lsh_degenerate_band_capped(spark):
    """300 identical docs share every band: without the guard the candidate
    join emits ~45k pairs from one bucket; with cap=64 the band is dropped,
    the drop is logged, and distinct near-dup pairs still come through."""
    from nerzo_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick value of a stream is computed from rows and batches near"
    rows = [(i, base) for i in range(300)]
    # two genuinely-near docs in their own small band
    rows += [(1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
             (1001, "alpha beta gamma delta epsilon zeta eta theta iota kappa x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logs = []
    pairs = minhash_lsh_pairs(
        _shingles(docs), threshold=0.5, band_cap=64, logger=logs.append
    ).collect()
    assert logs and "skew guard" in logs[0]
    got = {(r.id_a, r.id_b) for r in pairs}
    # the degenerate 300-doc clique is excluded (covered by exact dedup)
    assert all(a >= 1000 for a, _ in got), got
    assert (1000, 1001) in got


def test_lsh_guard_noop_below_cap(spark):
    """With no oversized band the guard changes nothing vs the oracle result
    (the driver CORRECTNESS row is the primary gate; this is the unit twin)."""
    from nerzo_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    logs = []
    pairs = minhash_lsh_pairs(
        _shingles(docs), threshold=0.5, band_cap=64, logger=logs.append
    )
    n = pairs.count()
    assert n >= 0
    assert not logs  # sf0.001 has no 64-doc band


def _doc_sh(df):
    from nerzo_spark.plans.catalog_text import _SHINGLE_SPARK

    return df.select(
        "doc_id", F.array_distinct(F.expr(_SHINGLE_SPARK)).alias("sh")
    )


def test_minhash_rowform_equals_exploded_form(spark):
    """r7: minhash_lsh_pairs_rowform must emit the EXACT pair set + jaccard
    values of the exploded-form builder — including under an active band_cap
    drop, via BOTH the default explode path and a caller-supplied
    explode_shingles callback."""
    from nerzo_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_rowform,
    )

    base = "the quick value of a stream is computed from rows and batches near"
    rows = [(i, base) for i in range(80)]  # shared band, above cap=8
    rows += [(1000, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
             (1001, "alpha beta gamma delta epsilon zeta eta theta iota kappa x"),
             (1002, "one two three four five six seven eight nine ten eleven"),
             (1003, "one two three four five six seven eight nine ten twelve")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    logs_a, logs_b, logs_c = [], [], []
    ref = sorted(
        tuple(r) for r in minhash_lsh_pairs(
            _shingles(docs), threshold=0.5, band_cap=8, logger=logs_a.append
        ).collect()
    )
    got_default = sorted(
        tuple(r) for r in minhash_lsh_pairs_rowform(
            _doc_sh(docs), threshold=0.5, band_cap=8, logger=logs_b.append
        ).collect()
    )

    def _exploder(ids_df):
        return _shingles(docs.join(F.broadcast(ids_df), "doc_id", "left_semi"))

    got_cb = sorted(
        tuple(r) for r in minhash_lsh_pairs_rowform(
            _doc_sh(docs), explode_shingles=_exploder,
            threshold=0.5, band_cap=8, logger=logs_c.append,
        ).collect()
    )
    assert ref == got_default == got_cb
    assert ref  # non-degenerate: the small near-dup pairs survive
    # the skew-guard log fires identically on all three paths
    assert logs_a and logs_b and logs_c


# --- blocked kNN --------------------------------------------------------------

def test_knn_blocked_equals_single_chunk(spark):
    """Chunked broadcast kNN must equal the single-broadcast exact result:
    same neighbor sets, same scores (GEMM per pair is chunk-invariant)."""
    from nerzo_spark.operators.topk import knn_self_join

    vecs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    one = knn_self_join(vecs, k=5, chunk_rows=10**9)
    many = knn_self_join(vecs, k=5, chunk_rows=97)  # forces several chunks

    def key(df):
        return {
            (r.query_id, r.neighbor_id, round(r.score, 9))
            for r in df.collect()
        }

    assert key(one) == key(many)
    # every query keeps exactly k rows with ranks 1..k
    per_q = many.groupBy("query_id").agg(
        F.count("*").alias("c"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    bad = per_q.filter((F.col("c") != 5) | (F.col("mx") != 5) | (F.col("mn") != 1)).count()
    assert bad == 0


# --- U5 projection head + S7 schema evolution ----------------------------------

def test_projection_head_matches_numpy(spark):
    from nerzo_spark.operators.projection import det_weights, project_head

    vecs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(50)
    rows = vecs.collect()
    d_in = len(rows[0].embedding)
    w, b = det_weights(d_in, 4)
    got = {
        r.vec_id: np.array(r.proj)
        for r in vecs.withColumn("proj", project_head("embedding", w, b)).collect()
    }
    for r in rows:
        want = w @ np.asarray(r.embedding, dtype=np.float64) + b
        assert np.allclose(got[r.vec_id], want, atol=1e-12)


def test_pair_detector_probability_range(spark):
    from nerzo_spark.operators.projection import det_pair_weights, pair_detector_prob

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    d_in = len(e.first().embedding)
    wa, wb, bias = det_pair_weights(d_in)
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        pair_detector_prob(F.col("a.embedding"), F.col("b.embedding"), wa, wb, bias).alias("p")
    )
    mn, mx = pairs.agg(F.min("p"), F.max("p")).first()
    assert 0.0 < mn and mx < 1.0


def test_schema_evolution_add_vector_column(spark, tmp_path):
    """S7 — add-a-vector-column path (reference dataset_provider.py:172-173
    index mapping update + index_to_elastic.py:14-46 reindex): old parquet
    files lack the new column; a mergeSchema read sees it as NULL for old
    rows while new rows carry the projection."""
    from nerzo_spark.operators.projection import add_projection_column

    path = str(tmp_path / "evo")
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    v1 = e.filter(F.col("vec_id") % 2 == 0)
    v1.write.parquet(path, mode="overwrite")

    v2 = add_projection_column(e.filter(F.col("vec_id") % 2 == 1), "embedding", "proj")
    v2.write.parquet(path, mode="append")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "proj" in merged.columns
    old_null = merged.filter((F.col("vec_id") % 2 == 0) & F.col("proj").isNotNull()).count()
    new_filled = merged.filter((F.col("vec_id") % 2 == 1) & F.col("proj").isNull()).count()
    assert old_null == 0 and new_filled == 0
    # plain (non-mergeSchema) readers of the original files keep working
    assert spark.read.parquet(path).count() == merged.count()


# --- F2 token offsets -----------------------------------------------------------

def test_token_offsets_substring_invariant(spark):
    """content[char_start:char_end] == token for every produced offset (the
    reference invariant step_process_to_document.py:110 shape, applied to
    the whitespace tokenizer of llm_interface.py:124-211)."""
    from nerzo_spark.functions.text import token_offsets

    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(200)
    tok = d.select(
        "text", F.posexplode(token_offsets("text")).alias("pos", "t")
    ).select(
        F.expr("substring(text, t.char_start + 1, t.char_end - t.char_start)").alias("cut"),
        F.col("t.token").alias("token"),
    )
    assert tok.filter(F.col("cut") != F.col("token")).count() == 0


# --- n-gram Jaccard boilerplate-shingle guard ----------------------------------

def test_ngram_boilerplate_shingle_capped(spark):
    """100 docs of one source share a boilerplate license line: without the
    DF cap the shingle self-join emits ~5k intermediate rows from that one
    shingle.  With the cap the boilerplate shingles are dropped (and logged)
    and only genuinely-similar docs pair."""
    from nerzo_spark.plans.catalog_text import _ngram_jaccard_pairs

    boiler = "licensed under the apache license version two point zero"
    rows = [(i, f"{boiler} unique{i} token{i} word{i} item{i}", "src") for i in range(100)]
    # two genuinely near-dup docs: shared NON-boilerplate shingles (DF=2)
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta", "src"),
        (1001, "alpha beta gamma delta epsilon eta", "src"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")

    logs = []
    out = _ngram_jaccard_pairs(d, df_cap=8, logger=logs.append).collect()
    assert logs and "skew guard" in logs[0]
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1000, 1001) in pairs
    # boilerplate-only docs share nothing after the cap: no pair among them
    assert not any(a < 1000 and b < 1000 for a, b in pairs)


def test_ngram_guard_noop_without_boilerplate(spark):
    """Below the cap the guard changes nothing (and logs nothing)."""
    from nerzo_spark.plans.catalog_text import _ngram_jaccard_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta", "src"),
        (2, "alpha beta gamma delta epsilon eta", "src"),
        (3, "totally different words here now", "src"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    logs = []
    capped = _ngram_jaccard_pairs(d, df_cap=64, logger=logs.append).collect()
    uncapped = _ngram_jaccard_pairs(d, df_cap=10**9, logger=None).collect()
    assert logs == []
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))


# --- embedding near-dup label-partition guard ----------------------------------

def test_neardup_label_cap_raises(spark):
    """An oversized label partition must fail loudly (pointing at the ANN
    path), never quietly go quadratic."""
    from nerzo_spark.plans.catalog_more import embedding_neardup_pairs

    rows = [(i, [1.0, 0.0, 0.0, 0.0], 7) for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    with pytest.raises(ValueError, match="ann_lsh_bucketed"):
        embedding_neardup_pairs(e, label_cap=10)
    # within the cap it runs: all 30 are identical vectors -> 435 pairs
    assert embedding_neardup_pairs(e, label_cap=50).count() == 30 * 29 // 2


# --- blocked kNN id-robustness --------------------------------------------------

def test_knn_blocked_handles_negative_and_patterned_ids(spark):
    """Chunking is by pmod(hash(id)): negative ids must not vanish and
    ids that are all multiples of n_chunks must not collapse into one
    chunk.  Blocked result must equal the single-chunk exact path."""
    from nerzo_spark.operators.topk import knn_self_join

    rng = np.random.default_rng(7)
    ids = [(-4 + 4 * i) for i in range(12)]  # negatives + all multiples of 4
    rows = [(int(i), [float(x) for x in rng.normal(size=8)]) for i in ids]
    v = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    blocked = knn_self_join(v, k=3, label_col=None, chunk_rows=3)
    single = knn_self_join(v, k=3, label_col=None, chunk_rows=10**6)
    b = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in blocked.collect())
    s = sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in single.collect())
    assert b == s
    assert len({q for q, _, _ in b}) == 12  # every query (incl. negatives) present
