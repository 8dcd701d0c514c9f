"""Tests for the SQL classifier path, multi-threshold classification and
two-step dynamic classification (ClassifierTest.scala:146-170 model)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.classify import Classifier, ClassifyParams, SQLClassifier
from slacken_spark.dynamic import (
    ClassifiedReadCount,
    Dynamic,
    MinimizerDistinctCount,
    MinimizerFraction,
    MinimizerTotalCount,
    clade_totals,
)
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels.minimizers import MinimizerConfig
from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy

CFG = MinimizerConfig(k=21, m=15, spaces=2, canonical=True)
RNG = np.random.default_rng(777)


def _genome(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


@pytest.fixture(scope="module")
def world(spark):
    # ranked taxonomy so depth-based filters engage:
    # ROOT ← phyla 10,20 ← species 101..103, 201..203
    ids, parents, ranks = [], [], []
    leaves = []
    for p in (10, 20):
        ids.append(p)
        parents.append(ROOT)
        ranks.append("phylum")
        for s in range(1, 4):
            t = p * 10 + s
            ids.append(t)
            parents.append(p)
            ranks.append("species")
            leaves.append(t)
    tax = Taxonomy.from_edges(ids, parents, ranks)
    genomes = {t: _genome(2500) for t in leaves}
    genomes_df = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()], "header string, nucleotides string"
    )
    labels_df = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, genomes_df, labels_df, tax, CFG, buckets=4)
    idx.records = idx.records.persist()
    # reads only from species 101 and 201
    reads = []
    for t in (101, 201):
        seq = genomes[t]
        for i in range(15):
            st = int(RNG.integers(0, len(seq) - 150))
            reads.append((f"s{t}_read{i}", seq[st : st + 150]))
    reads_df = spark.createDataFrame(reads, "header string, nucleotides string")
    return dict(
        tax=tax,
        genomes=genomes,
        idx=idx,
        reads=reads_df,
        genomes_df=genomes_df,
        labels_df=labels_df,
        spark=spark,
    )


def test_sql_classifier_matches_detailed_path(world):
    cls = Classifier(world["idx"])
    sql_cls = SQLClassifier(world["idx"])
    a = {
        r["header"]: (r["classified"], r["taxon"])
        for r in cls.classify(world["reads"]).collect()
    }
    b = sql_cls.classify(world["reads"]).collect()
    # SQL path drops the header (reports-only) — compare classification
    # multisets per taxon
    from collections import Counter

    ca = Counter((c, t) for c, t in a.values())
    cb = Counter((r["classified"], r["taxon"]) for r in b)
    assert ca == cb


def test_multi_threshold_caching(world):
    cls = Classifier(world["idx"])
    outs = cls.classify_multi(
        world["reads"], ClassifyParams(thresholds=(0.0, 0.5, 1.0))
    )
    assert set(outs) == {0.0, 0.5, 1.0}
    n0 = outs[0.0].where("classified").count()
    n1 = outs[1.0].where("classified").count()
    assert n0 >= n1  # higher confidence can only unclassify


def test_clade_totals_rollup(world):
    tax = world["tax"]
    ct = clade_totals(tax, [(101, 5), (102, 2), (201, 3)])
    assert ct[10] == 7 and ct[20] == 3 and ct[ROOT] == 10


def test_clade_rollup_df_matches_driver_rollup(world):
    """The distributed explode-ancestors rollup must equal the
    driver-side TreeAggregator dict on the same counts (J5)."""
    dyn = Dynamic(
        world["idx"], world["genomes_df"], world["labels_df"], MinimizerTotalCount(1)
    )
    counts = [(101, 5), (102, 2), (201, 3), (NONE, 9), (-1, 4)]
    counts_df = world["spark"].createDataFrame(counts, "taxon int, count long")
    got = {
        r["taxon"]: r["count"] for r in dyn.clade_rollup_df(counts_df).collect()
    }
    assert got == clade_totals(world["tax"], counts)


def test_count_filter_df_matches_driver_filter(world):
    dyn = Dynamic(
        world["idx"], world["genomes_df"], world["labels_df"], MinimizerTotalCount(1)
    )
    counts = [(101, 5), (102, 2), (201, 3)]
    counts_df = world["spark"].createDataFrame(counts, "taxon int, count long")
    got = {
        r["taxon"] for r in dyn.count_filter_df(counts_df, 3).collect()
    }
    assert got == dyn.count_filter(counts, 3)
    # at species rank only species survive (their phyla roll up >=3 but
    # sit above the rank filter)
    assert got == {101, 201}


def test_ancestors_udf_paths(world):
    from slacken_spark.kernels.taxonomy import ancestors_udf

    spark, tax = world["spark"], world["tax"]
    anc = ancestors_udf(spark, tax)
    df = spark.createDataFrame(
        [(101,), (10,), (ROOT,), (NONE,), (-1,), (10_000,)], "taxon int"
    ).select(anc(F.col("taxon")).alias("path"))
    paths = [r["path"] for r in df.collect()]
    assert paths[0] == [101, 10, ROOT]
    assert paths[1] == [10, ROOT]
    assert paths[2] == [ROOT]
    assert paths[3] == [] and paths[4] == [] and paths[5] == []


@pytest.mark.parametrize(
    "criterion",
    [
        MinimizerTotalCount(50),
        MinimizerDistinctCount(30),
        ClassifiedReadCount(5, 0.0),
        MinimizerFraction(0.3),
    ],
)
def test_two_step_detects_present_species(world, criterion):
    dyn = Dynamic(
        world["idx"],
        world["genomes_df"],
        world["labels_df"],
        criterion,
        reclassify_rank_depth=8,
        cpar=ClassifyParams(min_hit_groups=2),
    )
    detected = dyn.find_taxon_set(world["reads"])
    # the two source species must be detected; absent species must not
    assert 101 in detected and 201 in detected
    assert 103 not in detected and 203 not in detected


def test_two_step_classification_stays_consistent(world):
    dyn = Dynamic(
        world["idx"],
        world["genomes_df"],
        world["labels_df"],
        MinimizerTotalCount(50),
        cpar=ClassifyParams(min_hit_groups=2),
    )
    out, detected = dyn.two_step_classify(world["reads"])
    rows = out.collect()
    tax = world["tax"]
    for r in rows:
        if r["classified"]:
            src = int(r["header"].split("_")[0][1:])
            assert tax.has_ancestor(src, r["taxon"])
    # dynamic index restricted: classified taxa ⊆ detected ∪ ancestors
    allowed = tax.taxa_with_ancestors(detected)
    assert all(r["taxon"] in allowed for r in rows if r["classified"])


def test_read_gold_set(world, tmp_path):
    p = tmp_path / "gold.csv"
    # 102 in library; 103 in library; 999 unknown (no library ancestor);
    # 10 is a genus ABOVE the species rank filter (dropped)
    p.write_text("102\n103\n999\n10\n")
    dyn = Dynamic(
        world["idx"],
        world["genomes_df"],
        world["labels_df"],
        MinimizerTotalCount(50),
        reclassify_rank_depth=8,
    )
    gold = dyn.read_gold_set(str(p))
    assert gold == {102, 103}


def test_read_gold_set_drops_negative_ids(world, tmp_path):
    """A negative id in the gold CSV must be DROPPED, not remapped via
    Python negative indexing into primary[] — which could alias a valid
    library taxon that then survives the rank filter (r8 advice;
    the reference's primary() accepts only valid non-negative ids)."""
    p = tmp_path / "gold_neg.csv"
    p.write_text("102\n-1\n-102\n")
    dyn = Dynamic(
        world["idx"],
        world["genomes_df"],
        world["labels_df"],
        MinimizerTotalCount(50),
        reclassify_rank_depth=8,
    )
    assert dyn.read_gold_set(str(p)) == {102}


def test_gold_set_metrics(world):
    dyn = Dynamic(
        world["idx"], world["genomes_df"], world["labels_df"], MinimizerTotalCount(50)
    )
    m = dyn.gold_set_metrics({101, 201, 202}, {101, 201})
    assert m["tp"] == 2 and m["fp"] == 1 and m["fn"] == 0
    assert m["precision"] == 2 / 3 and m["recall"] == 1.0
