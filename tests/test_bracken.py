"""Bracken weight tests: total-read accounting, an independent k-mer-level
naive model of the window classification (the reference gates this layer
on a hand-verified golden table, BrackenWeightsTest.scala:31-46 — here
the model plays that role), fragment splitting, and output format."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.bracken import BrackenWeights, classify_all_reads, split_fragments
from slacken_spark.index import KeyValueIndex
from slacken_spark.kernels import bitseq
from slacken_spark.kernels.minimizers import (
    MinimizerConfig,
    genome_minimizers,
    mmer_priorities,
    window_minimizers,
)
from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy

CFG = MinimizerConfig(k=15, m=9, spaces=0, canonical=True)
RNG = np.random.default_rng(4242)
READ_LEN = 60


def _genome(n):
    return "".join("ACGT"[i] for i in RNG.integers(0, 4, n))


@pytest.fixture(scope="module")
def world(spark):
    # lineage: ROOT ← brand 5 ← leaves 101, 102 (shared core || unique)
    ids = [5, 101, 102]
    parents = [ROOT, 5, 5]
    tax = Taxonomy.from_edges(ids, parents)
    core = _genome(300)
    genomes = {t: core + _genome(300) for t in (101, 102)}
    genomes_df = spark.createDataFrame(
        [(f"g{t}", s) for t, s in genomes.items()], "header string, nucleotides string"
    )
    labels_df = spark.createDataFrame(
        [(f"g{t}", t) for t in genomes], "header string, taxon int"
    )
    idx = KeyValueIndex.build(spark, genomes_df, labels_df, tax, CFG, buckets=4)
    idx.records = idx.records.persist()
    return dict(
        tax=tax, genomes=genomes, idx=idx, gdf=genomes_df, ldf=labels_df, spark=spark
    )


def _naive_dests(seq: str, lookup: dict[int, int], tax: Taxonomy) -> list[int]:
    """Independent k-mer-level model: per k-mer minimizer → LCA; window
    dest = deepest taxon present; require ≥2 minimizer runs in window."""
    codes = bitseq.encode_codes(seq)
    ranks = mmer_priorities(codes, CFG)
    _, pos = window_minimizers(ranks, CFG.window)
    mmers = bitseq.pack_kmers(codes, CFG.m)
    mmers = bitseq.canonical_packed(mmers, CFG.m)
    M = mmers[pos]  # minimizer per k-mer position
    lca = np.array([lookup.get((int(m), 0), NONE) for m in M])
    # run ids (consecutive equal minimizers)
    run_id = np.zeros(len(M), dtype=int)
    run_id[1:] = np.cumsum(M[1:] != M[:-1])
    W = READ_LEN - CFG.k + 1
    sd = tax.sdepth
    out = []
    for w in range(len(seq) - READ_LEN + 1):
        seg = slice(w, w + W)
        groups = len(set(run_id[seg].tolist()))
        taxa = [t for t in lca[seg] if t != NONE]
        if groups < 2 or not taxa:
            out.append(NONE)
            continue
        out.append(int(max(taxa, key=lambda t: sd[t])))
    return out


def test_vectorized_window_matches_naive_model(world):
    tax = world["tax"]
    records = {(r["id1"], 0): r["taxon"] for r in world["idx"].records.collect()}
    for t, seq in world["genomes"].items():
        dests = classify_all_reads(seq, CFG, records, tax, READ_LEN)
        naive = _naive_dests(seq, records, tax)
        assert dests.tolist() == naive


def test_core_windows_lift_to_brand(world):
    tax = world["tax"]
    records = {(r["id1"], 0): r["taxon"] for r in world["idx"].records.collect()}
    seq = world["genomes"][101]
    dests = classify_all_reads(seq, CFG, records, tax, READ_LEN)
    # windows fully inside the shared 300bp core must classify to brand 5;
    # windows containing unique-region k-mers to leaf 101
    core_only = dests[: 300 - READ_LEN - CFG.k]
    assert set(core_only.tolist()) <= {5, NONE}
    assert (core_only == 5).mean() > 0.9
    tail = dests[300:]
    assert set(tail.tolist()) <= {101, NONE}
    assert (tail == 101).mean() > 0.9


def test_build_weights_accounts_every_read(world):
    bw = BrackenWeights(world["idx"], READ_LEN)
    weights = bw.build_weights(world["gdf"], world["ldf"]).collect()
    per_source = {}
    for r in weights:
        per_source[r["source"]] = per_source.get(r["source"], 0) + r["count"]
    expect = len(world["genomes"][101]) - READ_LEN + 1
    assert per_source == {101: expect, 102: expect}


def test_fragment_splitting_preserves_reads(world):
    spark = world["spark"]
    bw = BrackenWeights(world["idx"], READ_LEN)
    direct = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights(world["gdf"], world["ldf"]).collect()
    }
    split = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights(world["gdf"], world["ldf"], max_len=150).collect()
    }
    assert direct == split


def test_split_fragments_overlap(world):
    spark = world["spark"]
    df = spark.createDataFrame(
        [(1, "A" * 100, "h", 0)], "taxon int, nucleotides string, header string, location long"
    )
    rows = sorted(
        split_fragments(df, read_len=20, max_len=50).collect(),
        key=lambda r: r["location"],
    )
    # stride = max_len - (read_len - 1) = 31; range(0, 100-20+1, 31)
    assert [r["location"] for r in rows] == [0, 31, 62]
    # window starts across fragments tile 0..80 exactly once
    starts = []
    for r in rows:
        starts.extend(
            range(r["location"], r["location"] + len(r["nucleotides"]) - 20 + 1)
        )
    assert starts == list(range(0, 81))


def test_kmer_distrib_output(world, tmp_path):
    bw = BrackenWeights(world["idx"], READ_LEN)
    out = tmp_path / "database60mers.kmer_distrib"
    bw.build_and_write(world["gdf"], world["ldf"], {101, 102}, str(out))
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "mapped_taxid\tgenome_taxids:kmers_mapped:total_genome_kmers"
    for line in lines[1:]:
        dest, rest = line.split("\t")
        for trip in rest.split(" "):
            s, c, tot = trip.split(":")
            assert int(tot) >= int(c) > 0


def test_kmer_distrib_distributed_write_matches_driver_lines(world, tmp_path):
    """The single-file executor-side writer (write_kmer_distrib) must
    produce byte-for-byte the same artifact the driver-side line list
    renders: header first, one row per dest, trailing newline, and no
    temp-dir / _SUCCESS residue next to the target."""
    bw = BrackenWeights(world["idx"], READ_LEN)
    grouped = bw.group_data(
        bw.build_weights(world["gdf"], world["ldf"], {101, 102})
    ).persist()
    try:
        out = tmp_path / "distrib.txt"
        bw.write_kmer_distrib(grouped, str(out))
        text = out.read_text()
        assert text.endswith("\n")
        lines = text[:-1].split("\n")
        expect = bw.kmer_distrib_lines(grouped)
        assert lines[0] == expect[0]  # header row is first
        assert sorted(lines[1:]) == sorted(expect[1:])
        # multi-source dest exists in this fixture (shared core → 5)
        multi = [l for l in lines[1:] if " " in l.split("\t")[1]]
        assert multi, "fixture must exercise a multi-source line"
        residue = [p.name for p in tmp_path.iterdir() if p.name != "distrib.txt"]
        assert residue == [], residue
    finally:
        grouped.unpersist()


def test_gradual_build_matches_direct(world, tmp_path):
    bw = BrackenWeights(world["idx"], READ_LEN)
    direct = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights(world["gdf"], world["ldf"]).collect()
    }
    grad = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights_gradually(
            world["gdf"], world["ldf"], {101, 102}, str(tmp_path / "tmp_tbl"), chunks=2
        ).collect()
    }
    assert direct == grad


def test_build_weights_large_taxa_set_no_literal_isin(world):
    """A full-library Bracken build restricts to the whole label set
    (10⁴–10⁵ taxa on refseq); the restriction must be a broadcast mask
    (BrackenWeights.scala:318-326 uses a broadcast BitSet), never a
    plan-literal In list."""
    bw = BrackenWeights(world["idx"], READ_LEN)
    big = set(range(100_000))  # covers both leaves 101 and 102
    restricted = bw.build_weights(world["gdf"], world["ldf"], taxa=big)
    plan = restricted._jdf.queryExecution().toString()
    assert " IN " not in plan and len(plan) < 100_000
    got = {(r["dest"], r["source"]): r["count"] for r in restricted.collect()}
    full = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights(world["gdf"], world["ldf"]).collect()
    }
    assert got == full
    # and a restriction that excludes taxon 102 keeps only source 101
    only101 = bw.build_weights(world["gdf"], world["ldf"], taxa=set(range(102)))
    assert {r["source"] for r in only101.collect()} == {101}


def test_taxa_restriction_keeps_out_of_taxonomy_labels(world):
    """A genome label may reference a taxid absent from the taxonomy
    (e.g. a newer assembly than the dmp drop). The reference's BitSet
    restriction (BrackenWeights.scala:318) still matches such genomes,
    so the broadcast mask must too — it must not be clipped to
    taxonomy.n_nodes."""
    spark = world["spark"]
    outside = world["tax"].n_nodes + 400  # well past every node id
    gdf = world["gdf"].union(
        spark.createDataFrame(
            [("g_out", _genome(300))], "header string, nucleotides string"
        )
    )
    ldf = world["ldf"].union(
        spark.createDataFrame([("g_out", outside)], "header string, taxon int")
    )
    bw = BrackenWeights(world["idx"], READ_LEN)
    full = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights(gdf, ldf).collect()
    }
    assert any(src == outside for _d, src in full), "fixture must simulate g_out"
    restricted = bw.build_weights(gdf, ldf, taxa={101, 102, outside})
    got = {(r["dest"], r["source"]): r["count"] for r in restricted.collect()}
    assert got == full


def test_lexicographic_all_a_minimizer_kept(spark):
    """xor_mask=0 gives lexicographic ordering, so a poly-A run's minimizer
    packs to id 0. Regression: id 0 was conflated with the no-minimizer
    sentinel and dropped from the distributed LCA lookup, so boundary
    windows lost a hit group and fell to NONE (the reference keeps real
    id-0 minimizers, BrackenWeights.scala taxonHits)."""
    from collections import Counter

    cfg = MinimizerConfig(k=15, m=9, spaces=0, xor_mask=0, canonical=True)
    tax = Taxonomy.from_edges([5, 101], [ROOT, 5])
    seq = _genome(120) + "A" * 80 + _genome(120)
    gdf = spark.createDataFrame([("g", seq)], "header string, nucleotides string")
    ldf = spark.createDataFrame([("g", 101)], "header string, taxon int")
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=2)
    records = {(r["id1"], 0): r["taxon"] for r in idx.records.collect()}
    assert (0, 0) in records  # the all-A minimizer is a real index key
    expected = Counter(
        (int(d), 101) for d in classify_all_reads(seq, cfg, records, tax, READ_LEN)
    )
    bw = BrackenWeights(idx, READ_LEN)
    got = {
        (r["dest"], r["source"]): r["count"]
        for r in bw.build_weights(gdf, ldf).collect()
    }
    assert got == dict(expected)


def test_batch_classify_matches_per_fragment(world):
    """The whole-batch kernel (_batch_classify_reads) must agree with the
    per-fragment reference path (classify_all_reads) on every (fragment,
    dest) count — across ambiguous runs, short fragments, no-minimizer
    fragments and plain genomes."""
    from slacken_spark.bracken import (
        _batch_classify_reads,
        lookup_arrays,
    )

    tax = world["tax"]
    records = {(r["id1"], 0): r["taxon"] for r in world["idx"].records.collect()}
    g101, g102 = world["genomes"][101], world["genomes"][102]
    frags = [
        g101,
        g102[:80],                      # one window's worth
        g101[:59],                      # < read_len → zero reads
        g102[100:400],
        "ACGT" * 10 + "N" * 20 + g101[300:500],   # ambiguous run ≥ k
        "N" * 70,                       # no valid minimizer at all
        "ACGTNNA" * 30,                 # short valid runs (< k) only
        g102,
        # mixed sizes WELL past the routing cutoff — the batch kernel
        # must agree with the per-fragment path on large fragments too
        g101 + g102 + _genome(1500),    # 2.7 kb
        _genome(5000),                  # 5 kb, mostly unindexed
    ]
    n_ids = 2
    keys, taxa_sorted = lookup_arrays(records, n_ids)

    expected = {}
    for i, s in enumerate(frags):
        dests = classify_all_reads(s, CFG, records, tax, READ_LEN)
        for d, c in zip(*np.unique(dests, return_counts=True)):
            expected[(i, int(d))] = int(c)

    n_frag = len(frags)
    per = len(keys)
    lk_words = [
        np.tile(keys[f"w{j}"], n_frag) for j in range(n_ids)
    ]
    lk_taxa = np.tile(taxa_sorted, n_frag)
    lk_lens = np.full(n_frag, per, dtype=np.int64)
    frag_ids, dests, cnts = _batch_classify_reads(
        frags, CFG, lk_words, lk_taxa, lk_lens, tax, READ_LEN,
        np.random.default_rng(0),
    )
    got = {
        (int(f), int(d)): int(c) for f, d, c in zip(frag_ids, dests, cnts)
    }
    assert got == expected


def test_build_weights_batch_and_per_fragment_routes_agree(world):
    """End-to-end A/B of the two physical routes on a MIXED-size genome
    set (0.3-5 kb): batch_cutoff=0 forces every fragment through the
    per-fragment path, a huge cutoff forces the whole-batch kernel, and
    the default hybrid must equal both."""
    spark = world["spark"]
    g101, g102 = world["genomes"][101], world["genomes"][102]
    gdf = spark.createDataFrame(
        [
            ("m101", g101[:300]),                  # small → batch side
            ("m102", g102 + _genome(2000)),        # 2.6 kb → per-fragment side
            ("m103", g101 + g102 + _genome(4000)), # 5.2 kb
        ],
        "header string, nucleotides string",
    )
    ldf = spark.createDataFrame(
        [("m101", 101), ("m102", 102), ("m103", 101)], "header string, taxon int"
    )
    bw = BrackenWeights(world["idx"], READ_LEN)

    def run(cutoff):
        return {
            (r["dest"], r["source"]): r["count"]
            for r in bw.build_weights(gdf, ldf, batch_cutoff=cutoff).collect()
        }

    per_fragment = run(0)
    batch = run(1 << 30)
    hybrid = run(1024)
    assert per_fragment, "fixture must classify something"
    assert batch == per_fragment
    assert hybrid == per_fragment
