"""Broadcast-mask membership replaces taxonomy-sized literal isin lists.

Parity of the vectorized mask/depth helpers with their scalar models on a
200k-node synthetic taxonomy, plus an index build against it where labels
with undefined / out-of-range taxa must be dropped (unconditionally —
KeyValueIndex.scala:118-121) with no giant In expression in the plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels.minimizers import MinimizerConfig
from slacken_spark.kernels.taxonomy import (
    RANKS,
    ROOT,
    Taxonomy,
    member_mask_udf,
)

N = 200_000


@pytest.fixture(scope="module")
def bigtax():
    rng = np.random.default_rng(7)
    ids = np.arange(2, N, dtype=np.int64)
    defined = ids[ids % 17 != 0]  # every 17th id left undefined
    raw_parents = rng.integers(1, defined)  # uniform in [1, i)
    # snap parents onto defined ids (p-1 is never divisible by 17 when p is)
    parents = np.where(
        (raw_parents % 17 == 0) & (raw_parents > 1), raw_parents - 1, raw_parents
    )
    rank_pool = list(RANKS) + ["no rank"] * 3
    ranks = [rank_pool[i] for i in rng.integers(0, len(rank_pool), len(defined))]
    return Taxonomy.from_edges(defined, parents, ranks=ranks)


def test_defined_mask_matches_scalar(bigtax):
    mask = bigtax.defined_mask()
    rng = np.random.default_rng(11)
    sample = list(rng.integers(0, N, 2000)) + [0, ROOT, N - 1]
    for t in sample:
        assert mask[t] == bigtax.is_defined(int(t)), t


def test_depth_vector_matches_scalar(bigtax):
    dv = bigtax.depth_vector()
    rng = np.random.default_rng(13)
    sample = list(rng.integers(0, N, 2000)) + [0, ROOT, N - 1]
    for t in sample:
        assert dv[t] == bigtax.depth(int(t)), t


def test_member_udf_handles_out_of_range(spark, bigtax):
    mask = bigtax.defined_mask()
    member = member_mask_udf(spark, mask)
    probes = [-5, 0, ROOT, 17 * 3, 18, N - 1, N + 10]
    df = spark.createDataFrame([(int(t),) for t in probes], "taxon long")
    got = {r["taxon"]: r["ok"] for r in df.select("taxon", member("taxon").alias("ok")).collect()}
    for t in probes:
        expect = 0 <= t < N and bool(mask[t])
        assert got[t] == expect, t


def test_index_build_drops_undefined_taxa_without_literal_isin(spark, bigtax):
    rng = np.random.default_rng(4242)
    seq = lambda n: "".join("ACGT"[i] for i in rng.integers(0, 4, n))
    good1, good2 = 18, 20  # defined (not divisible by 17)
    bad_undefined, bad_range = 17 * 5, N + 5
    genomes = spark.createDataFrame(
        [(f"g{i}", seq(200)) for i in range(4)], "header string, nucleotides string"
    )
    labels = spark.createDataFrame(
        [("g0", good1), ("g1", good2), ("g2", bad_undefined), ("g3", bad_range)],
        "header string, taxon int",
    )
    cfg = MinimizerConfig(k=15, m=9, spaces=0)
    idx = KeyValueIndex.build(spark, genomes, labels, bigtax, cfg, buckets=2)
    taxa = {r["taxon"] for r in idx.records.select("taxon").distinct().collect()}
    assert taxa  # the defined genomes produced records
    for t in taxa:
        assert bigtax.is_defined(t)  # LCAs of defined labels stay defined
    # no taxonomy-sized literal In list: the whole plan stays small
    plan = idx.records._jdf.queryExecution().toString()
    assert len(plan) < 100_000

    # a dynamic-style taxon_filter over >100k taxa must still be applied
    only = KeyValueIndex.build(
        spark, genomes, labels, bigtax, cfg, buckets=2,
        taxon_filter=set(range(2, 150_000)) - {good2},
    )
    kept = {r["taxon"] for r in only.records.select("taxon").distinct().collect()}
    full_g0 = {
        r["taxon"]
        for r in KeyValueIndex.build(
            spark,
            genomes.where(F.col("header") == "g0"),
            labels,
            bigtax,
            cfg,
            buckets=2,
        ).records.select("taxon").distinct().collect()
    }
    assert kept == full_g0  # g1's label was filtered out, g0's kept
