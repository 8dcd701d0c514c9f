"""Index-level e2e for EXACT wide minimizer ids beyond two words
(63 ≤ m ≤ 124 → id1..id3/id4 key columns), the reference's multi-long
scheme (KmerKeyedIndex.scala:44-53, Minimizers.scala:47-75). The kernel
layer is covered in test_kernels; this file proves the full pipeline —
build → write → bucketed load → classification join → resolve — carries
3-word keys without collapsing to a hash."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.classify import Classifier, ClassifyParams
from slacken_spark.index import KeyValueIndex, extract_spans
from slacken_spark.kernels.bitseq import encode_codes
from slacken_spark.kernels.minimizers import MinimizerConfig, supermer_words
from slacken_spark.kernels.taxonomy import ROOT, Taxonomy

# m=80 → 3 words of ≤31 bases (31+31+18); k ≥ m
CFG = MinimizerConfig(k=90, m=80, spaces=0, canonical=True, wide="exact")
RNG = np.random.default_rng(8080)


def _genome(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    tax = Taxonomy.from_edges([5, 101, 102], [ROOT, 5, 5])
    genomes = {t: _genome(4000) for t in (101, 102)}
    gdf = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, CFG, buckets=2)
    loc = str(tmp_path_factory.mktemp("wide_idx") / "idx80")
    idx = idx.write(loc)
    return {"tax": tax, "genomes": genomes, "idx": idx, "loc": loc, "spark": spark}


def test_records_carry_three_exact_words(world):
    recs = world["idx"].records
    assert set(CFG.key_cols) == {"id1", "id2", "id3"}
    for c in CFG.key_cols:
        assert c in recs.columns
    # exact ids are invertible words, not one mixed hash: the count of
    # distinct 3-word tuples must equal the row count (records are
    # per-distinct-minimizer), and id3 must actually vary — at m=80 the
    # third word holds 18 random bases, so constant id3 would mean the
    # extra words were dropped
    n = recs.count()
    assert recs.select(*CFG.key_cols).distinct().count() == n
    assert recs.select("id3").distinct().count() > 1


def test_wide_exact_roundtrip_and_classify(world):
    spark, tax = world["spark"], world["tax"]
    loaded = KeyValueIndex.load(spark, world["loc"])
    assert loaded.cfg == CFG
    assert loaded.cfg.wide_exact and len(loaded.cfg.key_cols) == 3
    assert loaded.records.count() == world["idx"].records.count()

    reads, read_src = [], {}
    for t, seq in world["genomes"].items():
        for i in range(15):
            start = int(RNG.integers(0, len(seq) - 200))
            h = f"read_{t}_{i}"
            reads.append((h, seq[start : start + 200]))
            read_src[h] = t
    reads_df = spark.createDataFrame(reads, "header string, nucleotides string")
    out = Classifier(loaded).classify(
        reads_df, ClassifyParams(min_hit_groups=1)
    ).collect()
    assert len(out) == len(reads)
    n_classified = 0
    for r in out:
        if r["classified"]:
            n_classified += 1
            assert tax.has_ancestor(read_src[r["header"]], r["taxon"])
    assert n_classified >= 0.9 * len(reads)


def test_wide_exact_index_matches_distinct_minimizers(world):
    """Record count == independently-counted distinct (id1,id2,id3)
    tuples from a direct kernel scan of the genomes."""
    seen = set()
    for seq in world["genomes"].values():
        words, _starts, _kmers = supermer_words(encode_codes(seq), CFG)
        seen.update(zip(*(w.tolist() for w in words)))
    assert world["idx"].records.count() == len(seen)


def test_wide_exact_join_stays_bucketed(world):
    """The classification join on (id1,id2,id3) must not re-shuffle the
    bucketed index side (SURVEY §4's critical physical decision, same
    assertion as the m≤31 path in test_genomic_e2e)."""
    spark = world["spark"]
    loaded = KeyValueIndex.load(spark, world["loc"])
    reads_df = spark.createDataFrame(
        [("r", next(iter(world["genomes"].values()))[:300])],
        "header string, nucleotides string",
    )
    spans = extract_spans(reads_df, loaded.cfg)
    joined = spans.join(loaded.records, loaded.cfg.key_cols, "left")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the spans side; the bucketed scan has none
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan


def test_wide_respace_projects_and_classifies(world):
    """Respace of a WIDE exact index (KeyValueIndex.scala:347-404 applies
    to any spaced config): per-word seed-mask slices project id1..id3,
    colliding records re-fold to their LCA, and reads still classify
    through the masked index."""
    idx, tax, spark = world["idx"], world["tax"], world["spark"]
    re3 = idx.respace(3)
    assert re3.cfg.spaces == 3 and re3.cfg.masked and re3.cfg.wide_exact
    n0, n3 = idx.records.count(), re3.records.count()
    assert 0 < n3 <= n0
    # every projected id must be invariant under its own word mask
    import pandas as pd  # noqa: F401

    masks = re3.cfg.word_masks
    bad = 0
    for row in re3.records.select(*re3.cfg.key_cols).collect():
        for c, msk in zip(re3.cfg.key_cols, masks):
            if row[c] & ~msk:
                bad += 1
    assert bad == 0
    t0, seq = 101, world["genomes"][101]
    reads = spark.createDataFrame(
        [(f"rw{i}", seq[i * 53 : i * 53 + 250]) for i in range(10)],
        "header string, nucleotides string",
    )
    out = Classifier(re3).classify(
        reads, ClassifyParams(min_hit_groups=1)
    ).collect()
    n_cls = 0
    for r in out:
        if r["classified"]:
            n_cls += 1
            assert tax.has_ancestor(t0, r["taxon"])
    assert n_cls >= 5


def test_wide_respace_to_storage_roundtrip(world, tmp_path_factory):
    """A respaced WIDE index must also be STORABLE: write the masked
    m=80 index as a bucketed table, reload it from the sidecar, and get
    back identical records, the masked+exact cfg, and a working
    classification join with no index-side Exchange
    (KeyValueIndex.scala:347-404 storage semantics for m>31)."""
    idx, tax, spark = world["idx"], world["tax"], world["spark"]
    re3 = idx.respace(3)
    loc = str(tmp_path_factory.mktemp("wide_respace") / "idx80s3")
    stored = re3.write(loc)
    loaded = KeyValueIndex.load(spark, loc)
    # cfg round-trips: masked storage under the wider seed, exact words
    assert loaded.cfg.spaces == 3
    assert loaded.cfg.masked and loaded.cfg.wide_exact
    assert loaded.cfg.key_cols == re3.cfg.key_cols
    # records round-trip exactly
    a = {tuple(r) for r in re3.records.collect()}
    b = {tuple(r) for r in loaded.records.collect()}
    assert a == b and len(a) > 0
    # stored ids stay invariant under their own word masks
    for row in loaded.records.select(*loaded.cfg.key_cols).limit(200).collect():
        for c, msk in zip(loaded.cfg.key_cols, loaded.cfg.word_masks):
            assert row[c] & ~msk == 0
    # classification through the RELOADED masked index still works and
    # the bucketed scan needs no Exchange
    t0, seq = 101, world["genomes"][101]
    reads = spark.createDataFrame(
        [(f"rs{i}", seq[i * 53 : i * 53 + 250]) for i in range(10)],
        "header string, nucleotides string",
    )
    spans = extract_spans(reads, loaded.cfg)
    joined = spans.join(loaded.records, loaded.cfg.key_cols, "left")
    import re as _re

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan
    out = Classifier(loaded).classify(
        reads, ClassifyParams(min_hit_groups=1)
    ).collect()
    n_cls = 0
    for r in out:
        if r["classified"]:
            n_cls += 1
            assert tax.has_ancestor(t0, r["taxon"])
    assert n_cls >= 5
    assert stored is re3 and stored.location == loc  # write rebinds in place


def test_wide_respace_hashed_rejected(spark):
    from slacken_spark.kernels.minimizers import MinimizerConfig as MC

    with pytest.raises(ValueError):
        MC(k=50, m=45, spaces=3, masked=True, wide="hashed")
    # masked + exact wide is the supported storage for respace
    cfg = MC(k=50, m=45, spaces=3, masked=True, wide="exact")
    assert cfg.word_masks and len(cfg.word_masks) == 2
