"""Streaming classification: stream-static join against the bucketed
index produces the same classifications as the batch path, accumulating
across micro-batches."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.classify import Classifier
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels.minimizers import MinimizerConfig
from slacken_spark.kernels.taxonomy import ROOT, Taxonomy
from slacken_spark.streaming import ops

CFG = MinimizerConfig(k=21, m=15, spaces=2, canonical=True)
RNG = np.random.default_rng(31337)


def _genome(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


def test_stream_classification_matches_batch(spark, tmp_path):
    ids, parents = [10, 101, 102], [ROOT, 10, 10]
    tax = Taxonomy.from_edges(ids, parents)
    genomes = {t: _genome(2000) for t in (101, 102)}
    gdf = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()], "header string, nucleotides string"
    )
    ldf = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, CFG, buckets=4)
    idx.records = idx.records.persist()

    reads = []
    for t, seq in genomes.items():
        for i in range(10):
            st = int(RNG.integers(0, len(seq) - 150))
            reads.append((f"r{t}_{i}", seq[st : st + 150]))
    reads_df = spark.createDataFrame(reads, "header string, nucleotides string")

    # write reads as TWO parquet files → two micro-batches
    in_dir = str(tmp_path / "reads_in")
    reads_df.limit(10).coalesce(1).write.mode("append").parquet(in_dir)
    reads_df.subtract(reads_df.limit(10)).coalesce(1).write.mode("append").parquet(
        in_dir
    )

    stream = ops.file_stream(
        spark, in_dir, "header string, nucleotides string", max_files_per_trigger=1
    )
    collected: list = []
    epochs: list = []

    def sink(df, epoch_id):
        collected.extend(df.collect())
        epochs.append(epoch_id)

    q = (
        ops.classify_stream(idx, stream, sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert len(epochs) >= 2  # two files → two micro-batches
    got = {r["header"]: (r["classified"], r["taxon"]) for r in collected}
    expect = {
        r["header"]: (r["classified"], r["taxon"])
        for r in Classifier(idx).classify(reads_df).collect()
    }
    assert got == expect
    assert len(got) == len(reads)
