"""FewNERD-format ingestion (SURVEY.md §2.1 S2/S3, §2.7 F3/F4, §2.5 W7).

Input: token-per-line files — ``word\\tTAG`` lines, blank line = document
boundary, TAG is ``O`` or ``coarse-fine``
(/root/reference/clearml_pipelines/fewnerd_pipeline/fewnerd_dataset.py:1-20).

The reference reassembles documents and entity spans with a per-token state
machine (step_process_to_document.py:73-105): not-yet / start / in / end
entity transitions, conditional space joining (:39-49), exact char offsets,
and the invariant ``full_text[index_start:index_end] == phrase`` (:110).

This module expresses the SAME semantics as one declarative Spark plan —
the classic gaps-and-islands formulation:

  lag(tag)  ->  entity-start flag  ->  running sum = span id
  cumulative sum of addition lengths  ->  char offsets
  per-document ordered re-concatenation  ->  full_text
  phrase = substring(full_text, start, end)   (invariant by construction)

so token-order-dependent logic runs as window functions (JVM, codegen), not
per-row Python.  Documented divergence: the reference assigns ``text_id``
with uuid4 (non-deterministic, step_process_to_document.py:78); we use
sha1(full_text) like its passage variant (process_to_dataset.py:94).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nerzo_spark.functions.text import space_when_necessary, split_tag

MENTION_SCHEMA_COLS = [
    "file", "doc_seq", "text_id", "all_text",
    "phrase", "coarse_type", "fine_type", "index_start", "index_end",
]


def read_token_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line with (file, pos, line), order-preserving.

    Uses wholetext per-file read + posexplode: plain ``spark.read.text``
    gives no intra-file ordering guarantee across splits.  At 100 TB the
    corpus arrives as many files; parallelism is per-file (fine: FewNERD
    ships one file per split) — for giant single files, a custom line-index
    pre-pass would be the scale path.
    """
    raw = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )
    return raw.select(
        "file",
        F.posexplode(F.split(F.col("value"), "\n")).alias("pos", "line"),
    )


def assemble_documents(lines: DataFrame) -> DataFrame:
    """Token lines -> flat mention rows (the reference's tagging array).

    Pure window-function pipeline; see module docstring.
    """
    w = Window.partitionBy("file", "doc_seq").orderBy("pos")
    wfile = Window.partitionBy("file").orderBy("pos")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)

    toks = (
        lines
        # blank line closes a document: doc_seq = #blanks seen so far
        .withColumn(
            "doc_seq",
            F.sum(F.when(F.col("line") == "", 1).otherwise(0)).over(
                wfile.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("line") != "")
        .withColumn("word", F.split(F.col("line"), "\t").getItem(0))
        .withColumn("tag", F.split(F.col("line"), "\t").getItem(1))
    )

    coarse, fine = split_tag(F.col("tag"))
    prev_word = F.lag("word").over(w)
    prev_tag = F.lag("tag").over(w)

    toks = (
        toks.withColumn("space", space_when_necessary(prev_word, F.col("word")))
        .withColumn("addition", F.concat(F.col("space"), F.col("word")))
        .withColumn("coarse", coarse)
        .withColumn("fine", fine)
        .withColumn("prev_tag", prev_tag)
    )

    # reference transitions (step_process_to_document.py:84-87)
    start_entity = (
        (~F.col("prev_tag").eqNullSafe(F.col("tag"))) & (F.col("tag") != "O")
    )
    toks = (
        toks.withColumn("cum_end", F.sum(F.length("addition")).over(cum))
        .withColumn("word_start", F.col("cum_end") - F.length("word"))
        .withColumn("start_flag", start_entity.cast("int"))
        .withColumn("span_id", F.sum("start_flag").over(cum))
    )

    full_text = toks.groupBy("file", "doc_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "addition"))),
                lambda x: x.addition,
            ),
            "",
        ).alias("all_text")
    )

    spans = (
        toks.filter(F.col("tag") != "O")
        .groupBy("file", "doc_seq", "span_id")
        .agg(
            F.min("word_start").alias("index_start"),
            F.max("cum_end").alias("index_end"),
            F.first("coarse").alias("coarse_type"),
            F.first("fine").alias("fine_type"),
        )
    )

    return (
        spans.join(full_text, ["file", "doc_seq"])
        .withColumn(
            "phrase",
            F.expr("substring(all_text, index_start + 1, index_end - index_start)"),
        )
        .withColumn("text_id", F.sha1("all_text"))
        .select(*MENTION_SCHEMA_COLS)
    )


def ingest_fewnerd(spark: SparkSession, path: str) -> DataFrame:
    """Full S2->W7 ingestion: token file(s) -> flat mention DataFrame."""
    return assemble_documents(read_token_lines(spark, path))
