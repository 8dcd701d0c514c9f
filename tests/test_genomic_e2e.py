"""End-to-end genomic pipeline tests, modeled on the reference's
randomized classification test (ClassifierTest.scala:75-130) and golden
index invariants (KeyValueIndexTest.scala:35-99):

- build an index from random genomes on a random taxonomy, classify
  simulated reads, assert every classified read maps to its source taxon
  or an ancestor;
- index record count == independently-counted distinct minimizers;
- write/load round-trip preserves records and classifications;
- FASTA/FASTQ sources parse what they wrote.
"""

import gzip
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.classify import Classifier, ClassifyParams, KrakenReport
from slacken_spark.index import KeyValueIndex, extract_spans
from slacken_spark.kernels.minimizers import MinimizerConfig, genome_minimizers
from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy
from slacken_spark.sources import fasta as srcs

CFG = MinimizerConfig(k=21, m=15, spaces=2, canonical=True)
RNG = np.random.default_rng(12345)


def random_taxonomy() -> tuple[Taxonomy, list[int]]:
    """ROOT(1) → 3 phyla (10,20,30) → 3 species each (x1..x3)."""
    ids, parents = [], []
    leaves = []
    for p in (10, 20, 30):
        ids.append(p)
        parents.append(ROOT)
        for s in range(1, 4):
            ids.append(p * 10 + s)
            parents.append(p)
            leaves.append(p * 10 + s)
    return Taxonomy.from_edges(ids, parents), leaves


def random_genome(n: int) -> str:
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    tax, leaves = random_taxonomy()
    genomes = {t: random_genome(3000) for t in leaves}
    genomes_df = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()], "header string, nucleotides string"
    )
    labels_df = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, genomes_df, labels_df, tax, CFG, buckets=4)
    loc = str(tmp_path_factory.mktemp("index") / "idx")
    idx = idx.write(loc)
    return {"tax": tax, "genomes": genomes, "idx": idx, "loc": loc, "spark": spark}


def test_index_records_match_distinct_minimizers(world):
    expect = set()
    for seq in world["genomes"].values():
        expect.update(genome_minimizers(seq, CFG).tolist())
    stats = world["idx"].stats()
    assert stats["records"] == len(expect)


def test_index_taxa_are_lca_consistent(world):
    """Each record's taxon must be an ancestor-or-self of every genome
    containing that minimizer."""
    tax = world["tax"]
    by_min: dict[int, list[int]] = {}
    for t, seq in world["genomes"].items():
        for mz in set(genome_minimizers(seq, CFG).tolist()):
            by_min.setdefault(mz, []).append(t)
    records = {r["id1"]: r["taxon"] for r in world["idx"].records.collect()}
    assert len(records) == len(by_min)
    for mz, owners in by_min.items():
        expect = tax.lca_fold(np.array(owners))
        assert records[mz] == expect


def test_classified_reads_map_to_source_or_ancestor(world):
    spark, tax = world["spark"], world["tax"]
    reads = []
    read_src = {}
    for t, seq in world["genomes"].items():
        for i in range(20):
            start = int(RNG.integers(0, len(seq) - 150))
            h = f"read_{t}_{i}"
            reads.append((h, seq[start : start + 150]))
            read_src[h] = t
    reads_df = spark.createDataFrame(reads, "header string, nucleotides string")
    cls = Classifier(world["idx"])
    out = cls.classify(reads_df, ClassifyParams(min_hit_groups=2)).collect()
    assert len(out) == len(reads)
    n_classified = 0
    for r in out:
        if r["classified"]:
            n_classified += 1
            src = read_src[r["header"]]
            assert tax.has_ancestor(src, r["taxon"]), (
                f"{r['header']}: classified {r['taxon']} not ancestor of {src}"
            )
    # random 150bp reads from the source genomes should overwhelmingly classify
    assert n_classified >= 0.9 * len(reads)


def test_confidence_threshold_lifts_or_unclassifies(world):
    spark, tax = world["spark"], world["tax"]
    t0 = next(iter(world["genomes"]))
    seq = world["genomes"][t0]
    reads_df = spark.createDataFrame(
        [("r0", seq[:200])], "header string, nucleotides string"
    )
    cls = Classifier(world["idx"])
    lo = cls.classify(reads_df, ClassifyParams(thresholds=(0.0,))).first()
    hi = cls.classify(reads_df, ClassifyParams(thresholds=(1.0,))).first()
    # with maximal confidence the taxon can only move up (or unclassify)
    if hi["classified"]:
        assert tax.has_ancestor(lo["taxon"], hi["taxon"])


def test_write_load_roundtrip(world, tmp_path):
    spark = world["spark"]
    loaded = KeyValueIndex.load(spark, world["loc"])
    assert loaded.cfg == CFG
    assert loaded.buckets == 4
    assert loaded.stats() == world["idx"].stats()
    # loaded taxonomy supports the same LCA folds
    assert loaded.taxonomy.lca(101, 102) == world["tax"].lca(101, 102)


def test_write_load_with_relative_location(world, tmp_path, monkeypatch):
    """A RELATIVE index location must produce a coherent index: Spark
    resolves relative table paths against the warehouse dir while the
    pyarrow sidecars resolve against the process cwd, so write()/load()
    pin the location to one absolute path first. Regression: a relative
    -o left the parquet in spark-warehouse/ and the sidecar write
    failing on a nonexistent cwd-relative directory."""
    spark = world["spark"]
    monkeypatch.chdir(tmp_path)
    world["idx"].write("relidx")
    assert (tmp_path / "relidx" / "_index_params.json").exists()
    assert (tmp_path / "relidx").glob("*.parquet")
    loaded = KeyValueIndex.load(spark, "relidx")
    assert loaded.stats() == world["idx"].stats()


def test_classification_join_no_exchange_on_index_side(world):
    """The bucketed index must not reshuffle in the classification join
    (SURVEY §4: 'verify with explain() that no Exchange appears on the
    records side')."""
    spark = world["spark"]
    loaded = KeyValueIndex.load(spark, world["loc"])
    reads_df = spark.createDataFrame(
        [("r", next(iter(world["genomes"].values()))[:100])],
        "header string, nucleotides string",
    )
    spans = extract_spans(reads_df, loaded.cfg)
    joined = spans.join(loaded.records, "id1", "left")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange: the spans side; the bucketed scan has none
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan


def test_kraken_report_rollup(world):
    spark, tax = world["spark"], world["tax"]
    counts = [(101, 5), (102, 3), (10, 1), (NONE, 2)]
    rep = KrakenReport(tax, counts)
    assert rep.clade_totals[ROOT] == 9
    assert rep.clade_totals[10] == 9
    assert rep.clade_totals[101] == 5
    lines = rep.lines()
    assert lines[0].split("\t")[3] == "U"  # unclassified line first
    # percent of root clade = 9/11
    root_line = [l for l in lines if l.split("\t")[4] == "1"][0]
    assert root_line.split("\t")[1] == "9"


def test_output_line_format(world):
    spark = world["spark"]
    seq = next(iter(world["genomes"].values()))
    reads_df = spark.createDataFrame(
        [("sampleA_read1", seq[:100])], "header string, nucleotides string"
    )
    cls = Classifier(world["idx"])
    out = cls.classify(reads_df)
    line = cls.output_lines(out).first()["classification"]
    parts = line.split("\t")
    assert parts[0] in ("C", "U")
    assert parts[1] == "sampleA_read1"
    assert parts[3] == str(100)  # single read: plain length
    assert ":" in parts[4]


def test_paired_end_classification(world):
    """Mate pairs: both mates contribute hits; the length string is
    'len1|len2' and the hit detail contains the |:| border marker."""
    spark, tax = world["spark"], world["tax"]
    t0 = next(iter(world["genomes"]))
    seq = world["genomes"][t0]
    pairs = spark.createDataFrame(
        [("p1", 0, seq[:120], seq[400:520])],
        "header string, location long, nucleotides string, nucleotides2 string",
    )
    cls = Classifier(world["idx"])
    r = cls.classify(pairs, ClassifyParams(min_hit_groups=2)).first()
    assert r["length_string"] == "120|120"
    line = cls.output_lines(
        cls.classify(pairs, ClassifyParams(min_hit_groups=2))
    ).first()["classification"]
    assert "|:|" in line
    if r["classified"]:
        assert tax.has_ancestor(t0, r["taxon"])


# ---------------- sources ----------------


def test_fasta_roundtrip(world, tmp_path):
    spark = world["spark"]
    p = tmp_path / "x.fasta"
    p.write_text(">s1 desc here\nACGTAC\nGTACGT\n>s2\nTTTTGGGG\n")
    rows = {r["header"]: r for r in srcs.read_fasta(spark, str(p)).collect()}
    assert rows["s1"]["nucleotides"] == "ACGTACGTACGT"
    assert rows["s2"]["nucleotides"] == "TTTTGGGG"


def test_fastq_roundtrip(world, tmp_path):
    spark = world["spark"]
    p = tmp_path / "x.fastq"
    p.write_text(
        "@r1 extra\nACGTACGT\n+\nFFFFFFFF\n@r2\nGGGGCCCC\n+r2\n@FF+FFFF\n"
    )
    rows = {r["header"]: r for r in srcs.read_fastq(spark, str(p)).collect()}
    assert rows["r1"]["nucleotides"] == "ACGTACGT"
    assert rows["r2"]["nucleotides"] == "GGGGCCCC"


def test_paired_fastq_join(world, tmp_path):
    spark = world["spark"]
    p1, p2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    p1.write_text("@r1/1\nACGT\n+\nFFFF\n")
    p2.write_text("@r1/2\nTTTT\n+\nFFFF\n")
    row = srcs.read_paired_fastq(spark, str(p1), str(p2)).first()
    assert row["header"] == "r1"
    assert row["nucleotides"] == "ACGT"
    assert row["nucleotides2"] == "TTTT"


def test_indexed_fasta_overlap(world, tmp_path):
    spark = world["spark"]
    seq = random_genome(5000)
    p = tmp_path / "big.fna"
    lines = [seq[i : i + 60] for i in range(0, len(seq), 60)]
    p.write_text(">chr1\n" + "\n".join(lines) + "\n")
    # fai: name, length, offset, linebases, linewidth
    (tmp_path / "big.fna.fai").write_text(
        f"chr1\t{len(seq)}\t6\t60\t61\n"
    )
    df = srcs.read_indexed_fasta(spark, str(p), k=21, max_chunk=1000)
    rows = sorted(df.collect(), key=lambda r: r["location"])
    # chunks reassemble the sequence (dropping the k-1 overlaps)
    recon = rows[0]["nucleotides"]
    for r in rows[1:]:
        recon = recon[: r["location"]] + r["nucleotides"]
    assert recon == seq
    # each chunk except the last carries the k-1 overlap
    for r in rows[:-1]:
        assert len(r["nucleotides"]) == 1000 + 20
    # same read through an explicit pyarrow-fs URI (the any-FS path:
    # file:// locally; s3:// / hdfs:// in production)
    df_uri = srcs.read_indexed_fasta(spark, "file://" + str(p), k=21, max_chunk=1000)
    rows_uri = sorted(df_uri.collect(), key=lambda r: r["location"])
    assert [r["nucleotides"] for r in rows_uri] == [
        r["nucleotides"] for r in rows
    ]


def test_gzipped_fasta_and_list_indirection(world, tmp_path):
    """Compression rides Spark's text reader; @list files union multiple
    inputs with format dispatch (S4)."""
    spark = world["spark"]
    p1 = tmp_path / "a.fasta.gz"
    with gzip.open(p1, "wt") as f:
        f.write(">s1\nACGTACGT\n")
    p2 = tmp_path / "b.fastq"
    p2.write_text("@r1\nGGGGCCCC\n+\nFFFFFFFF\n")
    lst = tmp_path / "inputs.txt"
    lst.write_text(f"{p1}\n{p2}\n")
    rows = {
        r["header"]: r["nucleotides"]
        for r in srcs.read_sequences(spark, "@" + str(lst)).collect()
    }
    assert rows == {"s1": "ACGTACGT", "r1": "GGGGCCCC"}


def test_rc_fragments(world):
    spark = world["spark"]
    df = spark.createDataFrame(
        [("h", 0, "AACGT", None)],
        "header string, location long, nucleotides string, nucleotides2 string",
    )
    seqs = {r["nucleotides"] for r in srcs.add_rc_fragments(df).collect()}
    assert seqs == {"AACGT", "ACGTT"}


def test_wide_exact_write_load_classify(world, tmp_path, spark):
    """Wide-exact (m=45) index: two-column (id1, id2) records, bucketed
    on both; write/load roundtrip preserves the scheme and the
    classification join stays Exchange-free on the index side."""
    import re as _re

    from slacken_spark.kernels.minimizers import MinimizerConfig

    cfg = MinimizerConfig(k=50, m=45, spaces=0, canonical=True, wide="exact")
    tax = world["tax"]
    gdf = spark.createDataFrame(
        [(f"g{t}", s) for t, s in world["genomes"].items()],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [(f"g{t}", t) for t in world["genomes"]], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=4)
    assert set(idx.records.columns) == {"id1", "id2", "taxon"}
    loc = str(tmp_path / "wide_idx")
    idx.write(loc)
    loaded = KeyValueIndex.load(spark, loc)
    assert loaded.cfg.wide == "exact" and loaded.cfg.m == 45
    assert loaded.stats() == idx.stats()
    # classify reads drawn from the genomes: all must resolve in-lineage
    reads = spark.createDataFrame(
        [(f"r{t}", seq[100:260]) for t, seq in world["genomes"].items()],
        "header string, nucleotides string",
    )
    out = {r["header"]: r for r in Classifier(loaded).classify(
        reads, ClassifyParams(min_hit_groups=2)
    ).collect()}
    for t in world["genomes"]:
        row = out[f"r{t}"]
        assert row["classified"] and tax.has_ancestor(t, row["taxon"])
    # no Exchange on the bucketed index side of the (id1, id2) join
    spans = extract_spans(reads, loaded.cfg)
    joined = spans.join(loaded.records, ["id1", "id2"], "left")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 1, plan


def test_wide_hashed_roundtrip_params(world, tmp_path, spark):
    """Opt-in hashed wide scheme survives the params sidecar roundtrip
    (version field records the scheme for future readers)."""
    import json as _json
    import os as _os

    from slacken_spark.kernels.minimizers import MinimizerConfig

    cfg = MinimizerConfig(k=50, m=45, spaces=0, wide="hashed")
    gdf = spark.createDataFrame(
        [(f"g{t}", s) for t, s in world["genomes"].items()],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [(f"g{t}", t) for t in world["genomes"]], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, gdf, ldf, world["tax"], cfg, buckets=4)
    assert set(idx.records.columns) == {"id1", "taxon"}
    loc = str(tmp_path / "hashed_idx")
    idx.write(loc)
    with open(_os.path.join(loc, "_index_params.json")) as f:
        params = _json.load(f)
    assert params["version"] == 2
    assert params["splitter"]["wide"] == "hashed"
    assert params["key_cols"] == ["id1"]
    assert KeyValueIndex.load(spark, loc).cfg.wide == "hashed"
