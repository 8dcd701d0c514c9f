"""Tests for respace, analysis metrics, UniFrac, index statistics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.analysis import (
    depth_histogram,
    hit_category,
    per_read_comparison,
    per_taxon_comparison,
    taxon_coverage_stats,
    unifrac_distance,
)
from slacken_spark.classify import Classifier, ClassifyParams
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels.minimizers import MinimizerConfig
from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy

CFG = MinimizerConfig(k=21, m=15, spaces=2, canonical=True)
RNG = np.random.default_rng(99)


def _genome(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


@pytest.fixture(scope="module")
def world(spark):
    ids, parents, ranks = [10, 101, 102, 20, 201], [ROOT, 10, 10, ROOT, 20], [
        "genus",
        "species",
        "species",
        "genus",
        "species",
    ]
    tax = Taxonomy.from_edges(ids, parents, ranks)
    genomes = {t: _genome(2000) for t in (101, 102, 201)}
    gdf = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()], "header string, nucleotides string"
    )
    ldf = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, CFG, buckets=4)
    idx.records = idx.records.persist()
    return dict(tax=tax, genomes=genomes, idx=idx, gdf=gdf, ldf=ldf, spark=spark)


# ---------------- respace ----------------


def test_respace_shrinks_and_still_classifies(world):
    idx = world["idx"]
    tax = world["tax"]
    re5 = idx.respace(5)
    n0 = idx.records.count()
    n5 = re5.records.count()
    assert n5 <= n0
    assert re5.cfg.spaces == 5 and re5.cfg.masked
    # reads still classify to source or ancestor through the respaced index
    spark = world["spark"]
    t0, seq = 101, world["genomes"][101]
    reads = spark.createDataFrame(
        [(f"r{i}", seq[i * 37 : i * 37 + 150]) for i in range(10)],
        "header string, nucleotides string",
    )
    out = Classifier(re5).classify(reads, ClassifyParams(min_hit_groups=2)).collect()
    for r in out:
        if r["classified"]:
            assert tax.has_ancestor(t0, r["taxon"])


def test_respace_smaller_raises(world):
    with pytest.raises(ValueError):
        world["idx"].respace(1)


# ---------------- hit categories ----------------


def test_hit_categories(world):
    tax = world["tax"]
    assert hit_category(tax, 101, NONE, None) == "FalseNeg"
    assert hit_category(tax, 101, 101, None) == "TruePos"
    assert hit_category(tax, 101, 10, None) == "VaguePos"  # ancestor of ref
    assert hit_category(tax, 101, 201, None) == "FalsePos"
    assert hit_category(tax, 101, ROOT, None) == "VaguePos"
    # at genus rank (depth 7): sibling species under same genus = TruePos
    assert hit_category(tax, 101, 102, 7) == "TruePos"
    assert hit_category(tax, 101, 201, 7) == "FalsePos"


def test_per_read_comparison(world):
    spark = world["spark"]
    ref = spark.createDataFrame(
        [("r1", 101), ("r2", 101), ("r3", 201), ("r4", 101)], "id string, ref_taxon int"
    )
    cmp = spark.createDataFrame(
        [("r1", 101), ("r2", 10), ("r3", NONE), ("r4", 201), ("r9", 101)],
        "id string, taxon int",
    )
    m = per_read_comparison(spark, cmp, ref, world["tax"])
    assert m["total_reads"] == 4  # r9 not in reference → dropped
    assert m["tp"] == 1 and m["vp"] == 1 and m["fn"] == 1 and m["fp"] == 1
    assert m["sensitivity"] == 0.25
    assert m["ppv"] == 0.5


def test_per_taxon_comparison(world):
    spark = world["spark"]
    ref = spark.createDataFrame(
        [("r1", 101), ("r2", 201)], "id string, ref_taxon int"
    )
    cmp = spark.createDataFrame(
        [("r1", 101), ("r2", 102), ("r3", 102)], "id string, taxon int"
    )
    m = per_taxon_comparison(spark, cmp, ref, world["tax"], rank_depth=8)
    # species level: ref {101, 201}; cmp {101, 102}
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
    assert m["precision"] == 0.5 and m["recall"] == 0.5


# ---------------- MinTable ordering ----------------


def test_table_ordered_index_classifies(world, tmp_path):
    """Explicit-priority (MinTable) ordering: build, persist, reload and
    classify; selection differs from XOR ordering but classification
    still maps reads to source-or-ancestor."""
    from slacken_spark.kernels.minimizers import (
        MinimizerConfig,
        table_from_frequencies,
        uniform_random_table,
    )

    spark, tax = world["spark"], world["tax"]
    cfg = MinimizerConfig(k=21, m=10, spaces=0, canonical=True)
    table = uniform_random_table(10, seed=7)
    idx = KeyValueIndex.build(
        spark,
        world["gdf"],
        world["ldf"],
        tax,
        cfg,
        buckets=4,
        priority_table=table,
    )
    loc = str(tmp_path / "tbl_idx")
    idx = idx.write(loc)
    loaded = KeyValueIndex.load(spark, loc)
    assert loaded.priority_table is not None
    assert (loaded.priority_table == table).all()
    seq = world["genomes"][101]
    reads = spark.createDataFrame(
        [(f"r{i}", seq[i * 60 : i * 60 + 150]) for i in range(8)],
        "header string, nucleotides string",
    )
    out = Classifier(loaded).classify(reads, ClassifyParams(min_hit_groups=2)).collect()
    assert sum(r["classified"] for r in out) >= 6
    for r in out:
        if r["classified"]:
            assert tax.has_ancestor(101, r["taxon"])
    # frequency table construction: rarer m-mers get lower (better) ranks
    ft = table_from_frequencies(3, {5: 100, 9: 1})
    assert ft[9] < ft[5]
    # respace is undefined for table-ordered indexes
    import pytest as _pytest

    with _pytest.raises(ValueError):
        loaded.respace(3)


def test_wide_minimizer_index_classifies(world):
    """31 < m ≤ 62: hashed single-column ids keep the whole pipeline
    (build → join → classify) unchanged; reads still map to
    source-or-ancestor."""
    from slacken_spark.kernels.minimizers import MinimizerConfig

    spark, tax = world["spark"], world["tax"]
    cfg = MinimizerConfig(k=50, m=45, spaces=0, canonical=True)
    idx = KeyValueIndex.build(
        spark, world["gdf"], world["ldf"], tax, cfg, buckets=4
    )
    idx.records = idx.records.persist()
    assert idx.stats()["records"] > 0
    seq = world["genomes"][102]
    reads = spark.createDataFrame(
        [(f"w{i}", seq[i * 55 : i * 55 + 150]) for i in range(10)],
        "header string, nucleotides string",
    )
    out = Classifier(idx).classify(reads, ClassifyParams(min_hit_groups=2)).collect()
    assert sum(r["classified"] for r in out) >= 8
    for r in out:
        if r["classified"]:
            assert tax.has_ancestor(102, r["taxon"])


# ---------------- index comparison ----------------


def test_compare_indexes(world):
    from slacken_spark.analysis import compare_indexes

    idx = world["idx"]
    sub = KeyValueIndex.build(
        world["spark"],
        world["gdf"],
        world["ldf"],
        world["tax"],
        CFG,
        buckets=4,
        taxon_filter={101, 102},
    )
    cats = {r["category"]: r["n"] for r in compare_indexes(idx, sub).collect()}
    assert "only_a" in cats and cats["only_a"] > 0  # 201's unique minimizers
    assert cats.get("only_b", 0) == 0  # sub is a strict subset
    assert cats.get("same", 0) > 0
    total_b = sub.records.count()
    assert cats.get("same", 0) + cats.get("moved", 0) == total_b


# ---------------- UniFrac ----------------


def test_unifrac(world):
    tax = world["tax"]
    assert unifrac_distance(tax, {101}, {101}) == 0.0
    # {101} tree: {101,10}; {102} tree: {102,10}; shared {10}; both {101,102,10}
    assert unifrac_distance(tax, {101}, {102}) == 2 / 3
    # disjoint genera: fully distinct paths
    assert unifrac_distance(tax, {101}, {201}) == 1.0


# ---------------- index stats ----------------


def test_taxon_coverage_stats(world):
    rows = {
        r["taxon"]: r
        for r in taxon_coverage_stats(world["idx"], world["gdf"], world["ldf"]).collect()
    }
    assert set(rows) == {101, 102, 201}
    # 201 shares no genomes → its minimizers nearly all resolve to itself
    assert rows[201]["frac_leaf"] > 0.99
    for r in rows.values():
        assert 0.0 <= r["frac_leaf"] <= 1.0 and r["total"] > 0


def test_depth_histogram(world):
    rows = {r["depth"]: r["n_records"] for r in depth_histogram(world["idx"]).collect()}
    # species depth 3 (ROOT=1, genus=2, species=3); some LCAs may sit at genus
    assert rows.get(3, 0) > 0
    assert sum(rows.values()) == world["idx"].records.count()


def test_input_label_stats(world, spark):
    from slacken_spark.analysis import input_label_stats

    tax = world["tax"]
    # labels: two valid leaves, one valid non-leaf (genus 10), one unknown
    labels = spark.createDataFrame(
        [("a", 101), ("b", 102), ("c", 10), ("d", 999)],
        "header string, taxon int",
    )
    stats = input_label_stats(labels, tax)
    assert stats["unknown_labels"] == [999]
    assert stats["n_unknown"] == 1
    assert stats["n_non_leaf"] == 1  # genus 10 has children
    assert stats["n_valid"] == 3
    # implied tree: {101,102,10,ROOT} = 4
    assert stats["implied_tree_size"] == 4
    assert stats["max_leaf_nodes"] == 2
    # species 101: path species(8)←genus(7)←root(0): missing 1..6
    hist = {h["missing_level"]: h for h in stats["missing_rank_histogram"]}
    assert hist[1]["label"] == "superkingdom"
    # levels 1..6 missing for all three valid labels; species missing for
    # the genus-level label only
    for lvl in range(1, 7):
        assert hist[lvl]["count"] == 3
    assert hist[8]["count"] == 1 and hist[8]["label"] == "species"


def test_metrics_tsv_roundtrip(tmp_path):
    from slacken_spark.analysis import (
        METRICS_HEADER,
        metrics_tsv_line,
        write_metrics_tsv,
    )

    per_taxon = {"classified": 5, "total": 6, "precision": 0.8, "recall": 0.75}
    per_read = {
        "classified": 90,
        "total_reads": 100,
        "tp": 80,
        "fp": 5,
        "vp": 5,
        "fn": 10,
        "ppv": 0.94,
        "sensitivity": 0.8,
        "index": 0.87,
    }
    title = "fam1/groupA/std_35_31_s7_c0.15_classified/sample=s1"
    line = metrics_tsv_line(title, "Species", per_taxon, per_read)
    assert line is not None
    fields = line.split("\t")
    head = METRICS_HEADER.split("\t")
    assert len(fields) == len(head)
    d = dict(zip(head, fields))
    assert d["family"] == "fam1" and d["group"] == "groupA"
    assert d["library"] == "std" and d["k"] == "35" and d["m"] == "31"
    assert d["s"] == "7" and d["c"] == "0.15" and d["sample"] == "s1"
    assert d["rank"] == "Species" and d["read_tp"] == "80"
    # unparseable titles are omitted, like the reference
    assert metrics_tsv_line("garbage", None, per_taxon, per_read) is None
    path = write_metrics_tsv(
        str(tmp_path / "out"), [line, metrics_tsv_line("x", None, per_taxon, per_read)]
    )
    lines = open(path).read().strip().split("\n")
    assert lines[0] == METRICS_HEADER and len(lines) == 2


def test_cami_to_kraken_report(world, spark, tmp_path):
    from slacken_spark.analysis import CAMIToKrakenReport
    from slacken_spark.kernels.taxonomy import RANK_DEPTH

    tax = world["tax"]
    mapping = tmp_path / "reads_mapping.tsv"
    rows = ["#anonymous_read_id\tgenome_id\ttax_id"]
    # 4 reads on species 101 (2 pairs), 2 on species 201 (1 pair),
    # 2 on genus 10 (dropped at species cutoff)
    rows += [f"r{i}\tg101\t101" for i in range(4)]
    rows += [f"r{i+4}\tg201\t201" for i in range(2)]
    rows += [f"r{i+6}\tg10\t10" for i in range(2)]
    mapping.write_text("\n".join(rows) + "\n")
    conv = CAMIToKrakenReport(
        spark, str(mapping), tax, min_rank_depth=RANK_DEPTH["species"]
    )
    ids = set(conv.filtered_ids())
    assert ids == {f"r{i}" for i in range(6)}
    idp = tmp_path / "ids.txt"
    conv.write_filtered_ids(str(idp))
    assert len(idp.read_text().strip().split("\n")) == 6
    rep = conv.filtered_report()
    assert rep.taxon_counts == {101: 2, 201: 1}
    out = tmp_path / "cami.kreport"
    conv.write_filtered_report(str(out))
    text = out.read_text()
    assert "\t101\t" in text and "\t201\t" in text


def test_numerical_rank_and_missing_steps(world):
    from slacken_spark.kernels.taxonomy import numerical_rank_to_str

    tax = world["tax"]
    assert numerical_rank_to_str(8) == "species"
    assert numerical_rank_to_str(1) == "superkingdom"
    assert numerical_rank_to_str(-1) == "???"
    assert numerical_rank_to_str(99) == "???"
    assert tax.missing_steps_to_root(101) == [1, 2, 3, 4, 5, 6]
    assert tax.is_leaf(101) and not tax.is_leaf(10)


def test_filter_report():
    from slacken_spark.analysis import filter_report, num_rank_for_code

    assert num_rank_for_code("G") == 7 and num_rank_for_code("U") == -1
    lines = [
        "# comment",
        " 90.00\t90\t0\tR\t1\troot",
        " 80.00\t80\t5\tD\t2\t  Bacteria",
        " 60.00\t60\t0\tG1\t40\t    GenusX",
        " 50.00\t50\t50\tS\t401\t      SpeciesA",
        "  0.50\t1\t1\tS\t402\t      SpeciesB",
        " 10.00\t10\t10\tS\t501\t      SpeciesC",
    ]
    # rank cutoff at genus (7): species lines (8) dropped; G1 suffix strips
    got = list(filter_report(lines, level_cutoff=7))
    assert [l.split("\t")[4] for l in got] == ["1", "2", "40"]
    # min percent drops the 0.5% line
    got = list(filter_report(lines, min_percent=1.0))
    assert all(l.split("\t")[4] != "402" for l in got)
    # clade filter keeps GenusX and its indented descendants only
    got = list(filter_report(lines, clades={40}))
    assert [l.split("\t")[4] for l in got] == ["40", "401", "402", "501"]
    # clade + percent compose
    got = list(filter_report(lines, min_percent=1.0, clades={40}))
    assert [l.split("\t")[4] for l in got] == ["40", "401", "501"]


def test_total_kmer_size_aggregator():
    from slacken_spark.analysis import TotalKmerSizeAggregator

    # ROOT(1) ← 10 ← {101: 100, 102: 200}; ROOT ← 20 ← {201: 300}
    tax = Taxonomy.from_edges([10, 101, 102, 20, 201], [ROOT, 10, 10, ROOT, 20])
    agg = TotalKmerSizeAggregator(tax, {101: 100, 102: 200, 201: 300})
    # S1 at 10: clade leaves average = (100+200)/2
    assert agg.s1(10) == 150.0
    assert agg.s1(20) == 300.0
    assert agg.s1(ROOT) == 200.0  # (100+200+300)/3
    # S2 at ROOT: average of child averages = (150 + 300)/2
    assert agg.s2(ROOT) == 225.0
    assert agg.s2(10) == 150.0  # children are leaves: (100+200)/2
    # S3 at ROOT: (S1*3 + S2*2)/5 = (200*3 + 225*2)/5
    assert agg.s3(ROOT) == (200.0 * 3 + 225.0 * 2) / 5
    # leaf behavior
    assert agg.s1(101) == 100.0 and agg.s2(101) == 100.0


def test_total_kmer_count_report_and_full_coverage(world, spark):
    from slacken_spark.analysis import (
        taxon_full_coverage_stats,
        total_kmer_count_report,
    )

    lines = total_kmer_count_report(world["idx"], world["gdf"], world["ldf"])
    # every classified line gains three TKC columns
    base_cols = len(lines[-1].split("\t"))
    for line in lines:
        taxid = int(line.split("\t")[4])
        if taxid != 0:
            assert len(line.split("\t")) == base_cols
            tkc = line.split("\t")[-3:]
            assert all(int(x) >= 0 for x in tkc)
    # leaf rows: TKC1 equals the taxon's own k-mer total (one genome)
    from slacken_spark.analysis import per_taxon_kmer_counts

    sizes = per_taxon_kmer_counts(world["idx"], world["gdf"], world["ldf"])
    for line in lines:
        taxid = int(line.split("\t")[4])
        if taxid in sizes:
            assert int(line.split("\t")[-3]) == round(sizes[taxid])

    cov = {
        r["taxon"]: r
        for r in taxon_full_coverage_stats(
            world["idx"], world["gdf"], world["ldf"]
        ).collect()
    }
    assert set(cov) == set(sizes)
    for t, r in cov.items():
        # depth:count pairs parse; distinct ≤ all per depth
        alls = dict(p.split(":") for p in r["minimizerCoverage"].split("|"))
        dists = dict(p.split(":") for p in r["distinctMinimizerCoverage"].split("|"))
        assert set(alls) == set(dists)
        for d in alls:
            assert int(dists[d]) <= int(alls[d])


def test_extra_wide_index_classifies(world, spark):
    """m=80 (3 words, hashed): full build → classify pipeline works for
    the reference's id3/id4 width range."""
    from slacken_spark.kernels.minimizers import MinimizerConfig

    tax = world["tax"]
    cfg = MinimizerConfig(k=90, m=80, spaces=0, canonical=True, wide="hashed")
    idx = KeyValueIndex.build(
        spark, world["gdf"], world["ldf"], tax, cfg, buckets=4
    )
    assert idx.stats()["records"] > 0
    seq = world["genomes"][101]
    reads = spark.createDataFrame(
        [(f"x{i}", seq[i * 90 : i * 90 + 200]) for i in range(8)],
        "header string, nucleotides string",
    )
    out = Classifier(idx).classify(reads, ClassifyParams(min_hit_groups=2)).collect()
    assert sum(r["classified"] for r in out) >= 6
    for r in out:
        if r["classified"]:
            assert tax.has_ancestor(101, r["taxon"])
