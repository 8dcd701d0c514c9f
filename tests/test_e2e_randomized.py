"""End-to-end randomized classification over a spread of splitter
configs (the reference's ClassifierTest.scala:75-130 pillar): a random
taxonomy, random genomes on its leaves, simulated reads from random
offsets — every classified read must map to its source taxon or an
ancestor, whatever the (k, m, spaces, ordering, id-scheme) choice."""

import numpy as np
import pytest

from slacken_spark.classify import Classifier, ClassifyParams
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels.minimizers import MinimizerConfig, uniform_random_table
from slacken_spark.kernels.taxonomy import ROOT, Taxonomy

RNG = np.random.default_rng(777)

CONFIGS = [
    ("default", MinimizerConfig(k=35, m=31, spaces=7), False),
    ("short", MinimizerConfig(k=21, m=15, spaces=2), False),
    ("lexicographic", MinimizerConfig(k=31, m=21, spaces=0, xor_mask=0), False),
    ("wide_exact", MinimizerConfig(k=40, m=35, spaces=0), False),
    ("wide_hashed", MinimizerConfig(k=40, m=35, spaces=0, wide="hashed"), False),
    ("extra_wide", MinimizerConfig(k=70, m=65, spaces=0, wide="hashed"), False),
    ("min_table", MinimizerConfig(k=24, m=10, spaces=0), True),
]


@pytest.fixture(scope="module")
def rand_world(spark):
    n = 60
    ids = list(range(2, n + 2))
    parents = [int(RNG.integers(1, i)) for i in ids]
    tax = Taxonomy.from_edges(ids, parents)
    leaves = [t for t in ids if tax.is_leaf(t)][:12]
    genomes = {
        t: "".join("ACGT"[i] for i in RNG.integers(0, 4, 1500)) for t in leaves
    }
    gdf = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    reads = []
    for t, seq in genomes.items():
        for j in range(5):
            off = int(RNG.integers(0, len(seq) - 150))
            reads.append((f"r{t}_{j}", t, seq[off : off + 150]))
    rdf = spark.createDataFrame(
        [(h, s) for h, _t, s in reads], "header string, nucleotides string"
    )
    sources = {h: t for h, t, _s in reads}
    return dict(tax=tax, gdf=gdf, ldf=ldf, rdf=rdf, sources=sources)


@pytest.mark.parametrize("name,cfg,use_table", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_randomized_classify_maps_to_lineage(rand_world, spark, name, cfg, use_table):
    tax = rand_world["tax"]
    table = uniform_random_table(cfg.m, seed=99) if use_table else None
    idx = KeyValueIndex.build(
        spark,
        rand_world["gdf"],
        rand_world["ldf"],
        tax,
        cfg,
        buckets=4,
        priority_table=table,
    )
    out = Classifier(idx).classify(
        rand_world["rdf"], ClassifyParams(min_hit_groups=2)
    ).collect()
    n_classified = 0
    for r in out:
        if r["classified"]:
            n_classified += 1
            src = rand_world["sources"][r["header"]]
            assert tax.has_ancestor(src, r["taxon"]), (name, r["header"])
    # random 1500 bp genomes rarely share minimizers: nearly all of the
    # 60 on-genome reads must classify
    assert n_classified >= 50, (name, n_classified)
