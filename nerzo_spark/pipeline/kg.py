"""End-to-end KG-construction pipeline (north star).

corpus(repo, path, commit, lang, content, content_sha256)
  -> detect mentions (mapInPandas, content dies here)
  -> embed mentions (Arrow-batched hashing embedder; GPU slot in prod)
  -> link to broadcast label catalog (cosine top-1 GEMM)
  -> canonicalize surface forms (iterative min-label propagation)
  -> triples (subj, pred, obj, provenance)
plus per-partition lineage rows (rows in/out, sha256-invariant check, wall ms).

Predicates (SURVEY.md §7.0): (entity typed_as label), (fine subtype_of coarse),
(mention links_to entity), (entity defined_in repo/path@commit).

Scale notes
-----------
- ``repartition(N, repo, path)`` before detection: one mega-repo holds ~30%
  of fixture rows (FIXTURES.md §1); hashing on (repo, path) — not repo —
  spreads it.  AQE skew-join + coalescing enabled in session.py.
- label catalog is driver-side tiny (8 rows here; thousands in prod) and is
  broadcast into the scoring UDF as a dense matrix — never shuffled.
- canonicalization iterates over DISTINCT (fine_type, surface), orders of
  magnitude smaller than mentions.
- triples are built from mention-sized tables with one final dropDuplicates
  per predicate family (hash aggregate, spillable).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nerzo_spark.embed.embedder import embed_span
from nerzo_spark.fixtures.labels import label_rows
from nerzo_spark.operators.canonicalize import canonicalize_surfaces
from nerzo_spark.operators.extract_link import extract_and_link

TRIPLE_SCHEMA = "subj string, pred string, obj string, repo string, path string, commit string"


@dataclass
class KGResult:
    mentions: DataFrame
    links: DataFrame
    entities: DataFrame
    triples: DataFrame
    lineage: DataFrame
    label_catalog: list[dict]
    # count of the materialized mention table (the extract+link action the
    # pipeline already runs) — links_to arm cardinality, free to reuse
    n_mentions: int = 0
    # lazy 1-row (n_triples long) plan == triples.count(), one cache scan
    # (build_triples_count); None only for hand-built results in tests
    triples_count: DataFrame | None = None


def build_label_catalog(anchor_rows: list[dict]) -> list[dict]:
    """Label embeddings = centroid of the pinned anchor mentions' embeddings
    (anchor scheme of /root/reference/contrastive/fewnerd_processor.py:155-199;
    identity-embedding trick of step_generate_ne_embedding.py:144-147).

    Anchors are a dimension-sized fixture carrying (surface, contexts), so
    the catalog is built entirely driver-side (the reference's get-by-id
    point lookup, dataset_provider.py:175-177) — zero cluster jobs; the
    result is broadcast into the scoring UDF as a dense matrix.
    """
    by_type: dict[str, list] = {}
    for a in anchor_rows:
        vec = embed_span(a["surface"], a.get("left_ctx", ""), a.get("right_ctx", ""))[2]
        by_type.setdefault(a["fine_type"], []).append(np.asarray(vec, dtype=np.float64))
    catalog = []
    for lr in label_rows():
        vecs = by_type.get(lr["fine_type"])
        if not vecs:
            continue
        c = np.mean(vecs, axis=0)
        n = np.linalg.norm(c)
        catalog.append({**lr, "emb": (c / n if n > 0 else c)})
    return catalog


def _partition_local_dedup(batches):
    """Streaming exact dedup of (subj, repo, path, commit) within one
    partition, exploiting file contiguity: a duplicate key necessarily
    shares its (repo, path, commit) — one FILE — and the extraction
    ``mapInPandas`` emits each file's mentions as one contiguous run in the
    partition's output stream (the same narrow-chain precondition
    :func:`build_triples` already requires).  So a batch-local
    ``drop_duplicates`` is exact except for the single file that may span
    a batch boundary — only ITS keys are carried across batches (round 3
    carried every key through a per-row Python loop; this is vectorized
    pandas end-to-end and the carry state is one file's worth).

    PRECONDITION (data-level, ADVICE r4): the CORPUS must hold at most ONE
    row per (repo, path, commit) — a duplicate corpus row yields two
    non-adjacent runs of the same file in one partition, which this
    contiguity-based carry under-dedups and the plan-level tripwire cannot
    see.  This is a standing pipeline invariant, not a new one: duplicate
    corpus rows would double-emit ``links_to`` triples (and mention rows)
    regardless of any dedup strategy here, and the fixture generator / the
    incremental path's dynamic-partition-overwrite both guarantee
    uniqueness by construction.  Corpora of unknown provenance must be
    deduplicated on (repo, path, commit) before entering the pipeline —
    :func:`corpus_duplicate_files` is the one-job checker for that.
    """
    carry_file: tuple | None = None
    carry_keys: set = set()
    cols = ["subj", "repo", "path", "commit"]
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.drop_duplicates(subset=cols)
        if carry_file is not None:
            cont = (
                (pdf["repo"] == carry_file[0])
                & (pdf["path"] == carry_file[1])
                & (pdf["commit"] == carry_file[2])
            )
            if cont.any():
                dup = cont & pdf["subj"].isin(carry_keys)
                if dup.any():
                    pdf = pdf[~dup]
        if not len(pdf):
            continue
        last = pdf.iloc[-1]
        last_file = (last["repo"], last["path"], last["commit"])
        tail = (
            (pdf["repo"] == last_file[0])
            & (pdf["path"] == last_file[1])
            & (pdf["commit"] == last_file[2])
        )
        if last_file == carry_file:
            carry_keys.update(pdf.loc[tail, "subj"])
        else:
            carry_file = last_file
            carry_keys = set(pdf.loc[tail, "subj"])
        yield pdf


def compact_dedup_key(*cols: str):
    """Exact 20-byte dedup key over a string tuple: sha1 of the
    LENGTH-PREFIXED field concatenation, with NULL mapped to a reserved
    one-char marker no length-prefixed value can start with.

    concat_ws would silently skip NULL fields (and a field containing the
    separator would shift boundaries), making distinct tuples alias — the
    row-level dedup twin keeps such tuples distinct, so this key must too.
    Length prefixes rule out every concatenation aliasing; collision
    probability is sha1's (the same cryptographic-identity assumption
    ent_id / mention_id / text_id already rest on).  Pure JVM codegen —
    one hash plus a few string ops per row.
    """

    def _lp(c: str):
        col = F.col(c)
        return F.when(col.isNull(), F.lit("\u0000")).otherwise(
            F.concat(F.length(col).cast("string"), F.lit(":"), col)
        )

    return F.unhex(F.sha1(F.concat(*[_lp(c) for c in cols])))


def _partition_local_dedup_count(batches):
    """Count-only twin of :func:`_partition_local_dedup` over a COMPACT
    (key, fk) projection — same carry-one-file contiguity logic, same
    result, a fraction of the Arrow traffic in BOTH directions:

    - inbound, rows are (20-byte exact dedup key, 8-byte file token)
      instead of four strings (~115 B/mention -> ~33 B);
    - outbound, each batch collapses to one ``n`` long on the Python side
      (counting via ``mapInPandas(rows).count()`` would serialize every
      deduped row back across Arrow just to count it — part of the
      27-45 s triples-count tail at 3.2M files, round 4).

    ``key`` = sha1 over the length-prefixed (subj, repo, path, commit)
    tuple (NULL -> a reserved marker that no length-prefixed value can
    produce) is EXACT under the same cryptographic-identity assumption the
    pipeline already rests on (ent_id / mention_id / text_id are
    sha1-equality identities): length prefixes rule out every
    field-concatenation aliasing, including NULL fields and fields that
    contain any would-be separator; ``fk`` is only
    a file-boundary GROUPING token — an xxhash64 collision merges two
    files' carry sets, which is harmless because membership tests use the
    exact key."""
    import pandas as pd

    carry_fk = None
    carry_keys: set = set()
    for pdf in batches:
        if not len(pdf):
            continue
        pdf = pdf.drop_duplicates(subset=["key"])
        if carry_fk is not None:
            cont = pdf["fk"] == carry_fk
            if cont.any():
                dup = cont & pdf["key"].isin(carry_keys)
                if dup.any():
                    pdf = pdf[~dup]
        if not len(pdf):
            continue
        last_fk = pdf["fk"].iloc[-1]
        tail = pdf["fk"] == last_fk
        if last_fk == carry_fk:
            carry_keys.update(pdf.loc[tail, "key"])
        else:
            carry_fk = last_fk
            carry_keys = set(pdf.loc[tail, "key"])
        yield pd.DataFrame({"n": [len(pdf)]})


def corpus_duplicate_files(corpus: DataFrame) -> DataFrame:
    """Checker for the corpus-row uniqueness precondition (ADVICE r4/r5):
    returns the (repo, path, commit) keys that appear on MORE than one
    corpus row, with their counts — empty means the precondition holds and
    ``file_local_dedup`` is exact.  FILE-scale work (one partial-agg
    groupBy over the corpus table, collapsing map-side to per-partition
    distinct keys): run it once when ingesting a corpus of unknown
    provenance, not inside the timed pipeline — the fixture generator and
    the incremental path's dynamic-partition overwrite guarantee
    uniqueness by construction, so the hot path never pays for it."""
    return (
        corpus.groupBy("repo", "path", "commit")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def _assert_narrow_from_extraction(df: DataFrame) -> None:
    """Runtime tripwire for the ``file_local_dedup`` precondition (VERDICT
    r3 #3 / ADVICE r3): the partition-local ``defined_in`` dedup is exact
    ONLY if ``typed`` reaches here through a narrow (shuffle-free) chain
    from the extraction ``mapInPandas`` — a re-shuffled or parquet-sourced
    input splits one file's mentions across partitions and would silently
    double-emit triples.  The extraction boundary is the MapInPandas line
    carrying the extraction UDF's NAME (the plan prints the function's
    ``__name__``: "MapInPandas _nerzo_extract_link(...)"; anchoring on the
    EXACT rendered form — operator + name + opening paren, not the first
    MapInPandas or a substring of the name — means neither a caller-inserted
    mapInPandas above a hidden shuffle (r4 ADVICE) nor a caller UDF whose
    ``__name__`` merely contains the token (r5 ADVICE) can truncate the
    scan).  The full plan string is scanned — ``InMemoryRelation``
    prints its cached child plan inline (verified on Spark 4.1), so a
    shuffle hidden inside a cached plan (caller repartitions THEN persists:
    the Exchange sits below the InMemoryTableScan line but above the
    extraction MapInPandas) is visible and caught.  Fail loudly if (a) any
    non-broadcast Exchange appears above that boundary, or (b) no
    extraction MapInPandas exists at all (input did not descend from
    in-process extraction).  Broadcast exchanges are allowed — they never
    move the probe side's rows; shuffles BELOW the extraction MapInPandas
    (the corpus repartition) are allowed — extraction emits each file's
    mentions from one input row regardless of how corpus rows were placed.
    The boundary is the FIRST named occurrence: AQE prints the plan tree
    twice ("== Current Plan ==" / "== Initial Plan =="), so the last
    occurrence would sit below the current plan's legal corpus Exchange and
    false-trip; the first named line belongs to the current plan, and
    everything string-above it is genuinely above the extraction."""
    from nerzo_spark.operators.extract_link import EXTRACT_UDF_PLAN_TOKEN

    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    boundary_idx = None
    for i, ln in enumerate(lines):
        if EXTRACT_UDF_PLAN_TOKEN in ln:
            boundary_idx = i
            break
    boundary = boundary_idx is not None
    prefix = lines[:boundary_idx] if boundary else lines
    shuffles = [
        ln.strip()
        for ln in prefix
        if "Exchange" in ln and "Broadcast" not in ln
    ]
    if not boundary or shuffles:
        raise ValueError(
            "file_local_dedup=True requires `typed` to reach build_triples "
            "through a narrow (shuffle-free) chain from the extraction "
            "mapInPandas; "
            + (
                f"found shuffle operator(s) above the extraction boundary: {shuffles}. "
                if shuffles
                else "no extraction boundary (MapInPandas) found in the plan. "
            )
            + "Pass file_local_dedup=False for re-shuffled or "
            "parquet-sourced inputs (pipeline/incremental.py does)."
        )


def build_triples(
    typed: DataFrame, overrides: DataFrame, catalog: list[dict],
    surfaces: DataFrame | None = None,
    file_local_dedup: bool = False,
) -> DataFrame:
    """(typed mentions, canonical overrides) -> (subj, pred, obj, provenance).

    Shuffle economics: the entity id of a mention is a COLUMN EXPRESSION —
    ``ent_id(fine_type, coalesce(override, norm_key(surface)))`` — joined
    only against the broadcast-sized override table (surfaces whose cluster
    canonical differs from their own key; the hot minority).  The
    distinct-surface-sized entity table never shuffles against mentions.
    Only ``links_to`` (no dedup) and ``defined_in`` (one dedup shuffle) are
    mention-scale; ``typed_as``/``subtype_of`` are entity-scale.

    ``surfaces``: optional pre-computed DISTINCT (fine_type, surface) table
    (run_kg_pipeline shares one across overrides/entities/triples).  With it,
    the ``typed_as`` entity set is derived at SURFACE scale — without it the
    fallback distincts the mention-scale table (one more mention shuffle).

    ``file_local_dedup``: eliminate the LAST mention-scale shuffle.  The
    ``defined_in`` dedup key is (entity, repo, path, commit) — and every
    mention of one file is emitted by ONE ``mapInPandas`` input row
    (operators/extract_link.py), i.e. duplicates of the key are ALWAYS
    co-partitioned as long as ``typed`` reaches here through a narrow chain
    from extraction.  A partition-local streaming dedup (Arrow-batched,
    seen-set carried across the partition's batches) is then EXACT and
    requires no Exchange — measured 26 s -> ~2 s at 1.6M mentions on the
    4-executor rig, and it is the stage that otherwise refuses to scale
    with cores (flat ~12 s at every executor count).  Callers whose
    ``typed`` crossed a file-split boundary (e.g. read back from parquet —
    pipeline/incremental.py) MUST keep the default shuffle dedup.
    Equivalence is asserted in tests/test_kg_e2e.py.
    """
    parts = _triple_parts(typed, overrides, catalog, surfaces, file_local_dedup)
    typed_e, ent_typed, ent_source, label_map, defined_base = parts

    null_prov = [
        F.lit(None).cast("string").alias("repo"),
        F.lit(None).cast("string").alias("path"),
        F.lit(None).cast("string").alias("commit"),
    ]
    prov = F.concat_ws("", F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit"))

    t_links = typed_e.select(
        F.col("mention_id").alias("subj"), F.lit("links_to").alias("pred"),
        F.col("entity_id").alias("obj"), "repo", "path", "commit",
    )
    t_defined = defined_base.select(
        "subj", F.lit("defined_in").alias("pred"), prov.alias("obj"),
        "repo", "path", "commit",
    )
    t_typed = ent_typed.select(
        F.col("entity_id").alias("subj"), F.lit("typed_as").alias("pred"),
        F.col("label_id").alias("obj"), *null_prov,
    )
    # every surface yields an entity of its own fine type, so the fine types
    # present among entities == fine types present among surfaces: derive
    # subtype_of from the SOURCE table's tiny fine_type distinct (partial
    # agg collapses to |types| rows map-side) instead of re-running the
    # whole entity chain (join+distinct over the entity table) for ~8 rows
    t_subtype = _subtype_arm(ent_source, label_map).select(
        F.col("fine_type").alias("subj"), F.lit("subtype_of").alias("pred"),
        F.col("coarse_type").alias("obj"), *null_prov,
    )

    return t_links.unionByName(t_typed).unionByName(t_defined).unionByName(t_subtype)


def _subtype_arm(ent_source: DataFrame, label_map: DataFrame) -> DataFrame:
    return (
        ent_source.select("fine_type")
        .distinct()
        .join(label_map, "fine_type")
        .select("fine_type", "coarse_type")
        .distinct()
    )


def _triple_parts(
    typed: DataFrame, overrides: DataFrame, catalog: list[dict],
    surfaces: DataFrame | None, file_local_dedup: bool,
    count_only_dedup: bool = False,
):
    """Shared plan fragments for :func:`build_triples` and
    :func:`build_triples_count`: (typed_e, ent_typed, ent_source, label_map,
    defined_base).  ``defined_base`` comes back already deduped; with
    ``count_only_dedup`` the partition-local variant collapses each batch to
    a count row (schema ``n long``) instead of returning the rows."""
    from nerzo_spark.functions.hashing import ent_id
    from nerzo_spark.operators.canonicalize import canonical_expr

    import pandas as pd

    spark = typed.sparkSession
    # Arrow-path createDataFrame: a plain list would go through the
    # pickle-RDD bootstrap — a cold 4-9 s job the first time a session uses
    # it (measured round 1), sitting INSIDE the pipeline's timed region
    label_map = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame(
                [(c["fine_type"], c["coarse_type"], c["label_id"]) for c in catalog],
                columns=["fine_type", "coarse_type", "label_id"],
            ).astype(str),
            schema="fine_type string, coarse_type string, label_id string",
        )
    )

    typed_e = typed.join(
        F.broadcast(overrides), ["fine_type", "surface"], "left"
    ).withColumn(
        "entity_id",
        ent_id(
            F.col("fine_type"),
            canonical_expr(F.col("fine_type"), F.col("surface"), F.col("canonical")),
        ),
    )
    ent_source = surfaces if surfaces is not None else typed.select("fine_type", "surface")
    ent_typed = (
        ent_source.join(F.broadcast(overrides), ["fine_type", "surface"], "left")
        .select(
            "fine_type",
            ent_id(
                F.col("fine_type"),
                canonical_expr(F.col("fine_type"), F.col("surface"), F.col("canonical")),
            ).alias("entity_id"),
        )
        .select("entity_id", "fine_type")
        .distinct()
        .join(label_map, "fine_type")
    )

    # dedup BEFORE building the prov string: obj is a function of
    # (repo, path, commit), so the key is identical but the shuffle moves
    # ~100B/row less (0.3 GB at 3.2M mentions); literals added post-shuffle
    defined_base = typed_e.select(
        F.col("entity_id").alias("subj"), "repo", "path", "commit"
    )
    if file_local_dedup:
        # check `typed` (not defined_base): the broadcast overrides join
        # above it cannot re-place probe-side rows, and typed's own plan is
        # exactly where a caller's repartition/parquet round-trip would show
        _assert_narrow_from_extraction(typed)
        if count_only_dedup:
            # compact projection: exact 20-byte dedup key + 8-byte file
            # token (see _partition_local_dedup_count and
            # compact_dedup_key) — sha1/xxhash64 are JVM codegen exprs, so
            # the ~3.5x Arrow-payload cut costs one hash per row
            defined_base = defined_base.select(
                compact_dedup_key("subj", "repo", "path", "commit").alias("key"),
                F.xxhash64("repo", "path", "commit").alias("fk"),
            ).mapInPandas(_partition_local_dedup_count, schema="n long")
        else:
            defined_base = defined_base.mapInPandas(
                _partition_local_dedup, schema=defined_base.schema
            )
    else:
        defined_base = defined_base.dropDuplicates(["subj", "repo", "path", "commit"])
    return typed_e, ent_typed, ent_source, label_map, defined_base


def build_triples_count(
    typed: DataFrame, overrides: DataFrame, catalog: list[dict],
    n_mentions: int,
    surfaces: DataFrame | None = None,
    file_local_dedup: bool = False,
) -> DataFrame:
    """ONE-row plan (``n_triples`` long) whose value equals
    ``build_triples(...).count()`` — without re-scanning the mention cache
    once per arm (VERDICT r4 task 1: the all-arms union count was the
    dominant ~0.45-scaling term of the full-pipeline tail).

    Per-arm cardinalities, each from work that is either already done or
    minimal:

    - ``links_to`` == ``n_mentions`` EXACTLY: one links triple per mention
      row, no dedup, and the broadcast overrides join preserves cardinality
      because ``overrides`` is unique on (fine_type, surface) by
      construction (it is derived from a DISTINCT surfaces table).  The
      count was already materialized by the caller's ``typed.count()`` —
      passed in as a literal, zero additional scans.
    - ``defined_in``: the one genuinely unknown arm — one narrow scan of the
      mention cache through the count-only partition-local dedup
      (``_partition_local_dedup_count``: per-batch longs cross Arrow, not
      deduped rows).
    - ``typed_as``: surface-scale (distinct entity ids joined to the
      broadcast label map).
    - ``subtype_of``: |fine_types| rows, collapses map-side.

    Equality with ``build_triples(...).count()`` is asserted in
    tests/test_kg_e2e.py."""
    _, ent_typed, ent_source, label_map, defined_base = _triple_parts(
        typed, overrides, catalog, surfaces, file_local_dedup,
        count_only_dedup=True,
    )
    if file_local_dedup:
        defined_cnt = defined_base.agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n")
        )
    else:
        defined_cnt = defined_base.agg(F.count(F.lit(1)).alias("n"))
    typed_cnt = ent_typed.agg(F.count(F.lit(1)).alias("n"))
    subtype_cnt = _subtype_arm(ent_source, label_map).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        defined_cnt.unionByName(typed_cnt)
        .unionByName(subtype_cnt)
        .agg(
            (F.coalesce(F.sum("n"), F.lit(0)) + F.lit(int(n_mentions)))
            .cast("long")
            .alias("n_triples")
        )
    )


def run_kg_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    anchors: DataFrame | list[dict],
    repartition_to: int | None = None,
    run_id: str | None = None,
) -> KGResult:
    run_id = run_id or uuid.uuid4().hex
    t0 = time.time()

    # label catalog first: driver-side, from the anchor fixture (tiny);
    # accepts either plain rows or a (dimension-sized) DataFrame
    if isinstance(anchors, DataFrame):
        anchor_rows = [r.asDict() for r in anchors.collect()]
    else:
        anchor_rows = anchors
    catalog = build_label_catalog(anchor_rows)

    # ONE fused Python pass: detect -> embed -> link (vectors never cross
    # Arrow; see operators/extract_link.py).  The result is the mentions
    # table AND the links table in one — no mention-scale join at all.
    # persist (columnar, compressed) over localCheckpoint (deserialized Java
    # rows): ~10x smaller storage, measured ~1.3x faster end-to-end.
    from pyspark.storagelevel import StorageLevel

    typed = extract_and_link(corpus, catalog, repartition_to=repartition_to).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # ONE mention-scale pass for the whole back half (round 5; was two):
    # grouping the mentions by (fine_type, surface) yields the distinct
    # surfaces table AND — as the sum of the group sizes — the exact mention
    # count, so the single materializing job below (the sum-collect) runs
    # extraction, builds the mention cache, builds the surface cache, and
    # returns n_mentions in one pipelined pass.  Round 4 ran typed.count()
    # (mention-cache scan #1) and then distincted the cache again inside
    # canonicalization's first job (scan #2, measured a flat ~3 s at BOTH
    # 4 and 16 cores at 1.6M files — a pure constant that caps the N->4N
    # ratio).  The groupBy's shuffle economics are identical to the old
    # select().distinct(): map-side partial agg collapses each partition to
    # its local distinct surfaces before anything crosses executors.
    # Overrides, entities and the typed_as arm all consume `surfaces` as a
    # zero-cost projection of this cached table.
    surface_counts = (
        typed.groupBy("fine_type", "surface")
        .agg(F.count(F.lit(1)).alias("n_in_surface"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_mentions = int(
        surface_counts.agg(F.sum("n_in_surface")).collect()[0][0] or 0
    )
    # wall of the work actually executed so far (catalog + extract + link +
    # surface agg): stamped HERE, not after plan construction, so the
    # lineage stage label and its wall agree (VERDICT r3 nit).
    extract_wall_ms = (time.time() - t0) * 1000.0

    from nerzo_spark.operators.canonicalize import (
        canonical_expr,
        canonical_overrides,
    )
    from nerzo_spark.functions.hashing import ent_id as _ent_id

    surfaces = surface_counts.select("fine_type", "surface")
    # broadcast-sized; Path 1 returns a driver-local Arrow frame and Path 3
    # self-checkpoints, so no eager materialization is needed here.
    # canonical_overrides runs its clustering jobs EAGERLY (collision-stats
    # checkpoint + hot-subgraph union-find) over the already-cached surface
    # table, so the wall measured around it is the real canonicalize stage
    # wall (VERDICT r4 task 3: the library path carries per-stage lineage
    # like incremental.py).
    t_canon0 = time.time()
    overrides = canonical_overrides(surfaces, already_distinct=True)
    canon_wall_ms = (time.time() - t_canon0) * 1000.0
    entities = (
        surfaces
        .join(F.broadcast(overrides), ["fine_type", "surface"], "left")
        .select(
            "fine_type",
            "surface",
            canonical_expr(F.col("fine_type"), F.col("surface"), F.col("canonical")).alias("canonical"),
        )
        .withColumn("entity_id", _ent_id(F.col("fine_type"), F.col("canonical")))
    )
    # typed reaches build_triples through a narrow chain from extraction,
    # so the file-local defined_in dedup is exact (see build_triples doc)
    triples = build_triples(
        typed, overrides, catalog, surfaces=surfaces, file_local_dedup=True
    )
    # lazy persist of the ONE-row count plan: its defined_in arm scans the
    # mention cache through the count-only dedup, and the plan is embedded
    # both in KGResult.triples_count and in the lineage 'triples' row — a
    # caller materializing both (or lineage twice) would otherwise pay the
    # mention-scale scan each time.  No action is triggered here (keeps the
    # no-serialized-action property of the library path).
    triples_count = build_triples_count(
        typed, overrides, catalog, n_mentions,
        surfaces=surfaces, file_local_dedup=True,
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # Per-stage lineage on the library path (VERDICT r4 task 3), without
    # adding serialized actions to the pipeline's own critical path: the
    # extract+link rows are per-repo with the measured wall; 'canonicalize'
    # carries the wall measured around the (eager) clustering above and a
    # LAZY rows_out = |entities| (surface-scale agg over the persisted
    # surfaces cache, evaluated only when a caller materializes lineage);
    # 'triples' reuses the cheap-count plan — rows_out is exact, but its
    # wall is a -1.0 sentinel (the triples table is lazy here; the
    # orchestration layers that materialize it — incremental.py, the CLI —
    # record the real wall).
    def _stage_row(cnt_df: DataFrame, cnt_col: str, stage: str, wall: float) -> DataFrame:
        return cnt_df.select(
            F.lit("__all__").alias("repo"),
            F.col(cnt_col).cast("long").alias("rows_out"),
            F.lit(True).alias("sha_ok"),
            F.lit(-1).cast("long").alias("files"),
            F.lit(stage).alias("stage"),
            F.lit(run_id).alias("run_id"),
            F.lit(wall).alias("wall_ms"),
        )

    lineage = (
        typed.groupBy("repo")
        .agg(
            F.count("*").alias("rows_out"),
            F.min(F.col("sha_ok").cast("int")).cast("boolean").alias("sha_ok"),
            F.countDistinct("path").alias("files"),
        )
        .withColumn("stage", F.lit("extract+link"))
        .withColumn("run_id", F.lit(run_id))
        .withColumn("wall_ms", F.lit(extract_wall_ms))
        .unionByName(
            _stage_row(
                entities.agg(F.count(F.lit(1)).alias("n")), "n",
                "canonicalize", canon_wall_ms,
            )
        )
        .unionByName(_stage_row(triples_count, "n_triples", "triples", -1.0))
    )

    links = typed.select("mention_id", "label_id", "coarse_type", "fine_type", "score")
    return KGResult(
        mentions=typed,
        links=links,
        entities=entities,
        triples=triples,
        lineage=lineage,
        label_catalog=catalog,
        n_mentions=n_mentions,
        triples_count=triples_count,
    )


def triples_from_corpus(
    spark: SparkSession,
    corpus: DataFrame,
    anchors: DataFrame,
    repartition_to: int | None = None,
) -> DataFrame:
    return run_kg_pipeline(spark, corpus, anchors, repartition_to=repartition_to).triples
