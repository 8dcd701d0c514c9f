"""Sequence file sources: FASTA, FASTQ, paired-end, seqid2taxid labels.

Spark-first re-expression of the reference's input layer
(reference: kmers/input/FileInputs.scala:150-274, InputReader.scala:38-131,
GenomeLibrary.scala:74-78):
  - FASTA: ``spark.read.option("lineSep", ">")`` splits records cleanly,
    then a split on newlines (the reference's own trick at
    FileInputs.scala:161-170);
  - FASTQ: 4-line windows detected with ``collect_list over
    (rowsBetween 0,3)`` and the @/+ double check (FileInputs.scala:196-209);
  - paired-end: equi-join R1⋈R2 on header with /1,/2 suffixes stripped
    (InputReader.scala:105-131);
  - indexed FASTA (.fai sidecar, FileInputs.scala:231-274): a driver-side
    planning step builds (file, offset, length) ranges from the .fai,
    then mapInPandas does ranged reads with (k−1)-overlap so no k-mer is
    lost across splits — replacing the reference's custom Hadoop
    InputFormat with a Spark-native plan.

Output schema (InputFragment, MinSplitter.scala:24-32):
  header string, location long, nucleotides string, nucleotides2 string.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

FRAGMENT_SCHEMA = "header string, location long, nucleotides string, nucleotides2 string"


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Multi-line FASTA → fragments. Compression handled by the text reader."""
    raw = spark.read.option("lineSep", ">").text(path)
    parts = F.split(F.col("value"), r"[\n\r]+")
    return (
        raw.select(parts.alias("lines"))
        .where(F.size("lines") >= 2)
        .select(
            F.split(F.element_at("lines", 1), " ").getItem(0).alias("header"),
            F.lit(0).cast("long").alias("location"),
            F.array_join(F.slice("lines", 2, F.size("lines") - 1), "").alias(
                "nucleotides"
            ),
            F.lit(None).cast("string").alias("nucleotides2"),
        )
        .where(F.length("nucleotides") > 0)
    )


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    """FASTQ → fragments via the 4-line sliding-window trick."""
    raw = (
        spark.read.text(path)
        .withColumn("file", F.lit(path))
        .withColumn("rowId", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("file").orderBy("rowId").rowsBetween(0, 3)
    rec = raw.withColumn("values", F.collect_list("value").over(w)).where(
        (F.size("values") == 4)
        & (F.substring(F.try_element_at("values", F.lit(1)), 1, 1) == "@")
        & (F.substring(F.try_element_at("values", F.lit(3)), 1, 1) == "+")
    )
    return rec.select(
        F.expr("substring(split(element_at(values, 1), ' ')[0], 2)").alias("header"),
        F.lit(0).cast("long").alias("location"),
        F.element_at("values", 2).alias("nucleotides"),
        F.lit(None).cast("string").alias("nucleotides2"),
    )


def read_paired_fastq(spark: SparkSession, r1: str, r2: str) -> DataFrame:
    """Paired-end reads joined by header (with /1, /2 suffixes stripped)."""
    strip = lambda c: F.regexp_replace(c, "/[12]$", "")  # noqa: E731
    d1 = read_fastq(spark, r1).select(
        strip(F.col("header")).alias("header"), "location", "nucleotides"
    )
    d2 = read_fastq(spark, r2).select(
        strip(F.col("header")).alias("header"),
        F.col("nucleotides").alias("nucleotides2"),
    )
    return d1.join(d2, "header").select(
        "header", "location", "nucleotides", "nucleotides2"
    )


def read_sequences(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched reader (FileInputs.forFile semantics):
    .fq/.fastq → FASTQ, else FASTA; @list.txt indirection supported."""
    if path.startswith("@") or os.path.basename(path).startswith("@"):
        list_path = path[1:] if path.startswith("@") else os.path.join(
            os.path.dirname(path), os.path.basename(path)[1:]
        )
        from slacken_spark.fsio import read_lines

        files = [ln.strip() for ln in read_lines(list_path) if ln.strip()]
        dfs = [read_sequences(spark, p) for p in files]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
    base = path.lower().removesuffix(".gz").removesuffix(".bz2")
    if base.endswith((".fq", ".fastq")):
        return read_fastq(spark, path)
    return read_fasta(spark, path)


def _pa_fs(path: str):
    """Resolve a path or URI to (pyarrow filesystem, fs-local path) —
    shared any-FS resolution (see slacken_spark.fsio); the any-Hadoop-FS
    contract of the reference's custom input format
    (fastdoop/IndexedFastaReader.scala:29-309)."""
    from slacken_spark.fsio import any_fs

    return any_fs(path)


def plan_indexed_fasta(path: str, k: int, max_chunk: int = 1_000_000) -> list[dict]:
    """Driver-side planning for huge .fai-indexed FASTA: split each
    sequence into ≤ max_chunk ranges with (k−1)-base overlap.

    Returns dicts (header, seq_offset, byte_start, n_bases, line_bases,
    line_bytes) ready to parallelize; ``read_indexed_fasta`` executes
    the ranged reads in executors.
    """
    plans: list[dict] = []
    filesystem, fai_path = _pa_fs(path + ".fai")
    with filesystem.open_input_stream(fai_path) as fh:
        fai_text = fh.read().decode("ascii")
    for line in fai_text.splitlines():
        if not line.strip():
            continue
        name, length, offset, line_bases, line_bytes = line.split("\t")[:5]
        length = int(length)
        offset = int(offset)
        line_bases = int(line_bases)
        line_bytes = int(line_bytes)
        start = 0
        while start < length:
            n = min(max_chunk, length - start)
            # extend by overlap so no k-mer is lost across chunks
            n_ov = min(n + k - 1, length - start)
            byte_start = offset + (start // line_bases) * line_bytes + (
                start % line_bases
            )
            plans.append(
                {
                    "header": name,
                    "seq_offset": start,
                    "byte_start": byte_start,
                    "n_bases": n_ov,
                    "line_bases": line_bases,
                    "line_bytes": line_bytes,
                }
            )
            start += n
    return plans


def read_indexed_fasta(
    spark: SparkSession, path: str, k: int, max_chunk: int = 1_000_000
) -> DataFrame:
    """Huge-genome FASTA scan: .fai-planned ranged reads in mapInPandas.

    The (k−1) overlap contract matches the reference's custom Hadoop
    input format (fastdoop/IndexedFastaReader.scala:29-309) without any
    Java-side code: planning is a tiny driver DataFrame, reads are
    executor-side pyarrow.fs seeks — file://, s3://, hdfs://, gs:// or
    bare local paths all work (the any-FS contract; a plain ``open()``
    here would silently be local/NFS-only and break on a 1.8 TB S3
    library).
    """
    plans = plan_indexed_fasta(path, k, max_chunk)
    plan_df = spark.createDataFrame(
        plans,
        "header string, seq_offset long, byte_start long, n_bases long,"
        " line_bases long, line_bytes long",
    )

    def ranged_read(batches):
        import pandas as pd

        filesystem, fs_path = _pa_fs(path)
        for pdf in batches:
            out = []
            with filesystem.open_input_file(fs_path) as fh:
                for row in pdf.itertuples(index=False):
                    extra_newlines = (
                        int(row.n_bases) // int(row.line_bases) + 2
                    ) * (int(row.line_bytes) - int(row.line_bases))
                    fh.seek(int(row.byte_start))
                    raw = fh.read(int(row.n_bases) + extra_newlines)
                    seq = raw.decode("ascii", "replace").replace("\n", "").replace(
                        "\r", ""
                    )[: int(row.n_bases)]
                    out.append(
                        (row.header, int(row.seq_offset), seq, None)
                    )
            yield pd.DataFrame(
                out, columns=["header", "location", "nucleotides", "nucleotides2"]
            )

    # repartition by EXPANDED bytes, not plan rows: each plan row blows
    # up to ≤ max_chunk bases, so size partitions at ~8 MB of sequence
    # (one-partition-per-row would schedule thousands of micro-tasks
    # when the index holds many small sequences, and starve threads
    # when it holds a few huge ones)
    n = max(len(plans), 1)
    total_bases = sum(p["n_bases"] for p in plans)
    by_bytes = total_bases // (8 << 20)
    par = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(n, 2048, max(by_bytes, par)))
    return plan_df.repartition(n_parts).mapInPandas(
        ranged_read, FRAGMENT_SCHEMA
    )


def read_taxon_labels(spark: SparkSession, path: str) -> DataFrame:
    """seqid2taxid.map: 2-column TSV header → taxon (GenomeLibrary.scala:74-78)."""
    return (
        spark.read.option("sep", "\t")
        .csv(path)
        .select(
            F.col("_c0").alias("header"), F.col("_c1").cast("int").alias("taxon")
        )
    )


def add_rc_fragments(df: DataFrame) -> DataFrame:
    """Duplicate each fragment with its reverse complement
    (InputReader.addRCFragments, InputReader.scala:38-46) — a codegen'd
    translate+reverse, no Python."""
    rc = F.translate(F.reverse(F.col("nucleotides")), "ACGTacgt", "TGCAtgca")
    return df.unionByName(
        df.withColumn("nucleotides", rc)
    )


def sample_fragments(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Bernoulli sampling of fragments (InputReader.scala:60-101 sample)."""
    return df.sample(fraction=fraction, seed=seed)
