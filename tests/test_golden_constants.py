"""Golden-constant gate over a committed micro-corpus, in the spirit of
the reference's independently-computed k-mer counts (KMC3 + Discount,
Testing.scala:158-178; KeyValueIndexTest.scala:35-99): the constants in
golden_expected.json come from a pure-Python character-level model
(tests/data/make_golden.py — no numpy, no engine kernels), so a scanner
that over- or under-emits a single k-mer, span or index record fails."""

import json
import os

import pytest
from pyspark.sql import functions as F

from slacken_spark.index import KeyValueIndex, extract_spans
from slacken_spark.kernels.minimizers import (
    FLAG_SEQUENCE,
    MinimizerConfig,
    genome_minimizers,
)
from slacken_spark.kernels.taxonomy import ROOT, Taxonomy
from slacken_spark.sources import fasta as srcs

DATA = os.path.join(os.path.dirname(__file__), "data")
EXPECTED = json.load(open(os.path.join(DATA, "golden_expected.json")))
CFG = MinimizerConfig(
    k=EXPECTED["config"]["k"],
    m=EXPECTED["config"]["m"],
    spaces=EXPECTED["config"]["spaces"],
    canonical=True,
)


@pytest.fixture(scope="module")
def corpus(spark):
    genomes = srcs.read_fasta(spark, os.path.join(DATA, "golden_tiny.fna"))
    labels = srcs.read_taxon_labels(
        spark, os.path.join(DATA, "golden_labels.tsv")
    )
    tax = Taxonomy.from_edges(
        [5, 101, 102, 20, 201], [ROOT, 5, 5, ROOT, 20]
    )
    return genomes.persist(), labels, tax


def test_corpus_reads_three_genomes(corpus):
    genomes, _, _ = corpus
    assert {r["header"] for r in genomes.select("header").collect()} == {
        "g101",
        "g102",
        "g201",
    }


def test_span_kmer_accounting_matches_golden(corpus):
    """Exact per-genome k-mer totals: FLAG_SEQUENCE spans must sum to the
    model's valid k-mer count and ALL spans (ambiguous pseudo-k-mers
    included) to the span total — one over/under-emitted k-mer fails."""
    genomes, _, _ = corpus
    spans = extract_spans(genomes, CFG).persist()
    per = {
        r["header"]: (r["valid"], r["total"], r["n_supermers"])
        for r in spans.groupBy("header")
        .agg(
            F.sum(F.when(F.col("flag") == FLAG_SEQUENCE, F.col("kmers"))).alias(
                "valid"
            ),
            F.sum("kmers").alias("total"),
            F.sum((F.col("flag") == FLAG_SEQUENCE).cast("int")).alias(
                "n_supermers"
            ),
        )
        .collect()
    }
    for h, exp in EXPECTED["per_genome"].items():
        valid, total, n_sm = per[h]
        assert valid == exp["valid_kmers"], h
        assert total == exp["span_kmer_total"], h
        assert n_sm == exp["supermers"], h
    spans.unpersist()


def test_distinct_minimizers_match_golden(corpus):
    genomes, _, _ = corpus
    rows = {r["header"]: r["nucleotides"] for r in genomes.collect()}
    for h, exp in EXPECTED["per_genome"].items():
        mins = set(genome_minimizers(rows[h], CFG).tolist())
        assert len(mins) == exp["distinct_minimizers"], h


def test_index_records_match_golden(corpus, spark):
    """Index record census: total distinct minimizers and the per-taxon
    LCA distribution (brand 5 = core shared by 101+102) must equal the
    model's exactly."""
    genomes, labels, tax = corpus
    idx = KeyValueIndex.build(spark, genomes, labels, tax, CFG, buckets=4)
    recs = idx.records.persist()
    assert recs.count() == EXPECTED["index_records"]
    per_taxon = {
        str(r["taxon"]): r["n"]
        for r in recs.groupBy("taxon").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_taxon == EXPECTED["records_per_taxon"]
    recs.unpersist()
