"""Document-corpus ingestion for the training-data pipeline layer.

The genomic sources (sources/fasta.py) cover the reference's formats;
real pretraining corpora arrive as JSONL(.gz), CSV or raw text files.
This module normalizes any of them to the catalog's ``documents``
shape — ``(doc_id long, source string, text string)`` — so every
pipeline operator (dedup, quality, packing, decontamination, …)
composes unchanged.

All readers are plain ``spark.read`` DataFrame sources: schema applied
up front (no inference scans at 100 TB), compression handled natively
by the format (``.gz``/``.zst`` JSONL just works), partition
parallelism = file splits. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, source string, text string"


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str | None = "doc_id",
    source_col: str | None = "source",
) -> DataFrame:
    """Read a document corpus in ``fmt`` ∈ {parquet, jsonl, csv, text}
    and normalize to ``DOC_SCHEMA``.

    - ``parquet`` / ``jsonl`` / ``csv``: columns are renamed from
      (``id_col``, ``source_col``, ``text_col``). A missing id column
      (``id_col=None``) derives a deterministic 64-bit id from
      (file, text) via xxhash64; a missing source column falls back to
      the source file's base name — both content-addressed, stable
      across reruns and cluster layouts (never zipWithIndex, whose ids
      depend on partitioning).
    - ``text``: one document per line; id/source always derived.
    """
    if fmt == "parquet":
        raw = spark.read.parquet(path)
    elif fmt == "jsonl":
        raw = spark.read.schema(_read_schema(text_col, id_col, source_col)).json(path)
    elif fmt == "csv":
        # Header-driven, NOT schema-positional: an explicit schema with
        # header=true is applied by POSITION (header names ignored), so a
        # file whose columns arrive in a different order — or with extra
        # columns — would silently misassign text into doc_id. Reading
        # header-named string columns (no inference scan) and selecting
        # by name below makes column order irrelevant and a missing
        # column a loud AnalysisException instead of silent garbage.
        raw = spark.read.option("header", "true").csv(path)
    elif fmt == "text":
        raw = spark.read.text(path).select(F.col("value").alias(text_col))
        id_col = None
        source_col = None
    else:
        raise ValueError(f"unsupported document format: {fmt!r}")

    from pyspark.sql import Window

    text = F.col(text_col).cast("string")
    if source_col is not None:
        src = F.col(source_col).cast("string")
    else:
        src = F.element_at(F.split(F.input_file_name(), "/"), -1)
    if id_col is not None:
        doc_id = F.col(id_col).cast("long")
        return raw.select(
            doc_id.alias("doc_id"), src.alias("source"), text.alias("text")
        )
    # Derived ids: salt the content hash with an occurrence index so
    # REPEATED identical rows (blank lines, repeated boilerplate lines)
    # stay distinct — downstream operators (scrubs, packing, dedup)
    # assume doc_id uniqueness, and a bare (file, text) hash would merge
    # such rows into one corrupted document. Rows inside an occurrence
    # partition are fully identical in the output schema, so which copy
    # receives which index is irrelevant: the output is deterministic as
    # a multiset. Costs one window shuffle, only on the derived-id path.
    base = raw.select(
        F.input_file_name().alias("_file"), src.alias("source"), text.alias("text")
    )
    w = Window.partitionBy("_file", "source", "text").orderBy(F.lit(1))
    return base.withColumn("_occ", F.row_number().over(w)).select(
        F.xxhash64("_file", "source", "text", "_occ").alias("doc_id"),
        "source",
        "text",
    )


def _read_schema(text_col: str, id_col: str | None, source_col: str | None) -> str:
    fields = []
    if id_col is not None:
        fields.append(f"{id_col} long")
    if source_col is not None:
        fields.append(f"{source_col} string")
    fields.append(f"{text_col} string")
    return ", ".join(fields)
