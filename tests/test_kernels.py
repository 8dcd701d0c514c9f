"""Property + model-based tests for the sequence kernels, mirroring the
reference's test pillars (SURVEY §5: NTBitArrayProps, MinSplitterProps,
ShiftScannerProps semantics) with hypothesis."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from slacken_spark.kernels import bitseq
from slacken_spark.kernels.minimizers import (
    FLAG_AMBIGUOUS,
    FLAG_MATE_PAIR_BORDER,
    FLAG_SEQUENCE,
    MinimizerConfig,
    genome_minimizers,
    naive_minimizer_positions,
    read_spans,
    split_by_ambiguity,
    supermers_of_codes,
    window_minimizers,
)

dna = st.text(alphabet="ACGT", min_size=0, max_size=300)
dna_with_n = st.text(alphabet="ACGTN", min_size=0, max_size=300)
small_cfgs = st.integers(4, 31).flatmap(
    lambda m: st.builds(
        MinimizerConfig,
        k=st.integers(m, 40),
        m=st.just(m),
        spaces=st.integers(0, 7),
        canonical=st.booleans(),
    )
)


# ---------------- bitseq ----------------


@given(dna)
def test_encode_decode_roundtrip(s):
    codes = bitseq.encode_codes(s)
    assert bitseq.decode_codes(codes) == s


@given(dna.filter(lambda s: len(s) > 0))
def test_revcomp_involution(s):
    assert bitseq.revcomp_str(bitseq.revcomp_str(s)) == s


@given(dna, st.integers(1, 32))
def test_pack_kmers_matches_substrings(s, k):
    if len(s) < k:
        assert len(bitseq.pack_kmers(bitseq.encode_codes(s), k)) == 0
        return
    packed = bitseq.pack_kmers(bitseq.encode_codes(s), k)
    assert len(packed) == len(s) - k + 1
    for i, p in enumerate(packed):
        assert bitseq.unpack_kmer(int(p), k) == s[i : i + k]


@given(dna.filter(lambda s: len(s) >= 1), st.integers(1, 32))
def test_revcomp_packed_matches_string(s, m):
    if len(s) < m:
        return
    packed = bitseq.pack_kmers(bitseq.encode_codes(s), m)
    rc = bitseq.revcomp_packed(packed, m)
    for i, p in enumerate(rc):
        assert bitseq.unpack_kmer(int(p), m) == bitseq.revcomp_str(s[i : i + m])


@given(dna.filter(lambda s: len(s) >= 4))
def test_canonical_is_orientation_invariant(s):
    m = min(len(s), 16)
    fwd = bitseq.canonical_packed(bitseq.pack_kmers(bitseq.encode_codes(s), m), m)
    rc_s = bitseq.revcomp_str(s)
    rev = bitseq.canonical_packed(bitseq.pack_kmers(bitseq.encode_codes(rc_s), m), m)
    assert set(fwd.tolist()) == set(rev.tolist())


# ---------------- minimizer scanner ----------------


@settings(max_examples=50, deadline=None)
@given(dna.filter(lambda s: len(s) >= 45), small_cfgs)
def test_window_minimizers_match_naive_model(s, cfg):
    if len(s) < cfg.k:
        return
    codes = bitseq.encode_codes(s)
    from slacken_spark.kernels.minimizers import mmer_priorities

    ranks = mmer_priorities(codes, cfg)
    _, pos = window_minimizers(ranks, cfg.window)
    assert pos.tolist() == naive_minimizer_positions(s, cfg)


@settings(max_examples=50, deadline=None)
@given(dna.filter(lambda s: len(s) >= 45), small_cfgs)
def test_supermers_preserve_all_data(s, cfg):
    """MinSplitterProps 'splitting preserves all data': concatenating
    super-mers with (k-1)-overlap removed reconstructs the sequence, and
    k-mer counts sum to len(s)-k+1."""
    if len(s) < cfg.k:
        return
    sms = supermers_of_codes(bitseq.encode_codes(s), cfg, s)
    assert sum(sm.kmers for sm in sms) == len(s) - cfg.k + 1
    recon = sms[0].nucleotides + "".join(
        sm.nucleotides[cfg.k - 1 :] for sm in sms[1:]
    )
    assert recon == s
    for sm in sms:
        assert len(sm.nucleotides) == sm.kmers + cfg.k - 1


@settings(max_examples=50, deadline=None)
@given(dna.filter(lambda s: len(s) >= 45), small_cfgs)
def test_adjacent_supermers_differ(s, cfg):
    """MinSplitterProps 'adjacent minimizers are not identical'."""
    if len(s) < cfg.k:
        return
    sms = supermers_of_codes(bitseq.encode_codes(s), cfg, s)
    for a, b in zip(sms, sms[1:]):
        # positions differ by construction; values may rarely collide only
        # via distinct-position equal-value m-mers, which canonical XOR
        # ordering allows — assert on position via rank change OR value
        assert (a.minimizer, a.start) != (b.minimizer, b.start)


@settings(max_examples=30, deadline=None)
@given(dna.filter(lambda s: len(s) >= 60))
def test_supermers_invariant_under_revcomp(s):
    """Canonical minimizer sets are orientation-invariant
    (MinSplitterProps 'super-mers invariant under reverse complement')."""
    cfg = MinimizerConfig(k=21, m=11, spaces=0, canonical=True)
    a = set(genome_minimizers(s, cfg).tolist())
    b = set(genome_minimizers(bitseq.revcomp_str(s), cfg).tolist())
    assert a == b


# ---------------- ambiguity splitting / spans ----------------


@settings(max_examples=100, deadline=None)
@given(dna_with_n, st.integers(4, 20))
def test_split_by_ambiguity_partitions(s, k):
    segs = split_by_ambiguity(bitseq.encode_codes(s), k)
    # segments tile the sequence exactly
    assert sum(e - st_ for st_, e, _ in segs) == len(s)
    pos = 0
    for st_, e, is_valid in segs:
        assert st_ == pos
        pos = e
        seg = s[st_:e]
        if is_valid:
            assert "N" not in seg and len(seg) >= k
        else:
            assert "N" in seg or len(seg) < k


@settings(max_examples=50, deadline=None)
@given(dna_with_n)
def test_read_spans_kmer_accounting(s):
    cfg = MinimizerConfig(k=12, m=7, spaces=0)
    spans = read_spans(s, cfg)
    # every span ≥1 kmer; ordinals sequential; distinct only on SEQUENCE
    for i, sp in enumerate(spans):
        assert sp.ordinal == i
        assert sp.kmers >= 1
        if sp.flag != FLAG_SEQUENCE:
            assert not sp.distinct
    # valid spans' kmers == per-valid-segment k-mer counts
    total_valid = sum(sp.kmers for sp in spans if sp.flag == FLAG_SEQUENCE)
    codes = bitseq.encode_codes(s)
    expect = sum(
        (e - st_) - cfg.k + 1
        for st_, e, v in split_by_ambiguity(codes, cfg.k)
        if v
    )
    assert total_valid == expect


def test_read_spans_mate_pair_border():
    cfg = MinimizerConfig(k=8, m=5, spaces=0)
    r1 = "ACGTACGTACGT"
    r2 = "TTTTACGTACGT"
    spans = read_spans(r1, cfg, seq2=r2)
    flags = [sp.flag for sp in spans]
    assert FLAG_MATE_PAIR_BORDER in flags
    b = flags.index(FLAG_MATE_PAIR_BORDER)
    assert all(f != FLAG_MATE_PAIR_BORDER for f in flags[b + 1 :][flags[b + 1 :].index(FLAG_SEQUENCE) + 1 :] if f == FLAG_MATE_PAIR_BORDER)


def test_distinct_flag_consecutive_suppression():
    """A read whose every window shares one minimizer yields one distinct
    span; repeating the same minimizer non-consecutively re-flags."""
    cfg = MinimizerConfig(k=8, m=5, spaces=0)
    s = "ACGTACGTACGTACGTACGT"
    spans = [sp for sp in read_spans(s, cfg) if sp.flag == FLAG_SEQUENCE]
    assert spans[0].distinct
    for a, b in zip(spans, spans[1:]):
        if a.minimizer == b.minimizer:
            assert not b.distinct
        else:
            assert b.distinct


@settings(max_examples=50, deadline=None)
@given(dna_with_n, st.booleans())
def test_read_span_arrays_matches_read_spans(s, paired):
    """Array-native extraction ≡ the object API (modulo random
    ambiguous-minimizer values)."""
    from slacken_spark.kernels.minimizers import read_span_arrays

    cfg = MinimizerConfig(k=12, m=7, spaces=1)
    seq2 = s[::-1] if paired and s else None
    obj = read_spans(s, cfg, seq2=seq2, rng=np.random.default_rng(1))
    mins, mins2, dist, kmers, flags = read_span_arrays(
        s, cfg, np.random.default_rng(2), seq2=seq2
    )
    assert len(obj) == len(mins)
    for i, sp in enumerate(obj):
        assert sp.flag == flags[i]
        assert sp.kmers == kmers[i]
        assert sp.distinct == bool(dist[i])
        if sp.flag == FLAG_SEQUENCE:
            assert sp.minimizer == mins[i]
            assert sp.minimizer2 == mins2[i]


def test_lexicographic_ordering():
    """xor_mask=0 selects the lexicographically smallest m-mer per
    window (classic minimizers)."""
    cfg = MinimizerConfig(k=9, m=4, spaces=0, xor_mask=0, canonical=False)
    s = "TTTTACGTTTTT"
    from slacken_spark.kernels.minimizers import mmer_priorities

    ranks = mmer_priorities(bitseq.encode_codes(s), cfg)
    _, pos = window_minimizers(ranks, cfg.window)
    # the smallest 4-mer in the first window (TTTTACGTT) is ACGT at pos 4
    assert pos[0] == 4
    assert bitseq.unpack_kmer(
        int(bitseq.pack_kmers(bitseq.encode_codes(s), 4)[pos[0]]), 4
    ) == "ACGT"


# ---------------- wide minimizers (31 < m <= 62) ----------------


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="ACGT", min_size=120, max_size=300), st.integers(32, 62))
def test_wide_minimizers_orientation_invariant(s, m):
    cfg = MinimizerConfig(k=min(m + 8, 70), m=m, spaces=0, canonical=True)
    a = set(genome_minimizers(s, cfg).tolist())
    b = set(genome_minimizers(bitseq.revcomp_str(s), cfg).tolist())
    assert a == b


def _wide_test_seq(rng, core):
    return (
        "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
        + core
        + "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
        + bitseq.revcomp_str(core)
        + "".join("ACGT"[i] for i in rng.integers(0, 4, 60))
    )


@pytest.mark.parametrize("wide", ["exact", "hashed"])
def test_wide_minimizer_identity_matches_string_model(wide):
    """Positions sharing the same canonical m-mer string get the same
    (id1, id2) key; distinct m-mers get distinct keys (structurally for
    the exact scheme; no collisions at test scale for hashed)."""
    from slacken_spark.kernels.minimizers import scan_mmers_full

    cfg = MinimizerConfig(k=60, m=45, spaces=0, canonical=True, wide=wide)
    rng = np.random.default_rng(8)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, 45))
    s = _wide_test_seq(rng, core)
    id1, id2, _ = scan_mmers_full(bitseq.encode_codes(s), cfg)
    by_string: dict[str, set] = {}
    for i in range(len(s) - 45 + 1):
        mm = s[i : i + 45]
        canon = min(mm, bitseq.revcomp_str(mm))
        by_string.setdefault(canon, set()).add((int(id1[i]), int(id2[i])))
    # same canonical string → one key (incl. the planted rc duplicate)
    assert all(len(v) == 1 for v in by_string.values())
    # distinct strings → distinct keys
    all_ids = [next(iter(v)) for v in by_string.values()]
    assert len(set(all_ids)) == len(all_ids)
    # the planted core and its revcomp share a key
    canon_core = min(core, bitseq.revcomp_str(core))
    assert len(by_string[canon_core]) == 1
    if wide == "exact":
        # exact keys are invertible: (id1=31 bases, id2=m-31 bases)
        for canon, keys in by_string.items():
            i1, i2 = next(iter(keys))
            assert bitseq.unpack_kmer(i1, 31) + bitseq.unpack_kmer(i2, 14) == canon
    else:
        assert (id2 == 0).all()  # hashed keeps the single-column layout


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="ACGT", min_size=45, max_size=200))
def test_wide_exact_key_bijection(s):
    """Property: the exact wide key is a bijection of the canonical
    m-mer — no two distinct m-mers share (id1, id2), and every key
    unpacks back to its canonical string (m=45)."""
    from slacken_spark.kernels.minimizers import scan_mmers_full

    cfg = MinimizerConfig(k=45, m=45, spaces=0, canonical=True, wide="exact")
    id1, id2, _ = scan_mmers_full(bitseq.encode_codes(s), cfg)
    for i in range(len(id1)):
        mm = s[i : i + 45]
        canon = min(mm, bitseq.revcomp_str(mm))
        assert bitseq.unpack_kmer(int(id1[i]), 31) + bitseq.unpack_kmer(
            int(id2[i]), 14
        ) == canon


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="ACGTN", min_size=0, max_size=300))
def test_wide_span_accounting(s):
    cfg = MinimizerConfig(k=40, m=35, spaces=0)
    spans = read_spans(s, cfg)
    codes = bitseq.encode_codes(s)
    expect = sum(
        (e - st_) - cfg.k + 1
        for st_, e, v in split_by_ambiguity(codes, cfg.k)
        if v
    )
    assert sum(sp.kmers for sp in spans if sp.flag == FLAG_SEQUENCE) == expect


def test_wide_spaces_and_masked_validation():
    # spaced seeds compose with wide ids (rank-side mask per word);
    # masked STORAGE works for exact wide ids (per-word seed-mask
    # slices) but not for the irreversible hashed scheme
    cfg = MinimizerConfig(k=50, m=45, spaces=3)
    assert cfg.seed_mask != cfg.mask_2m
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MinimizerConfig(k=50, m=45, spaces=3, masked=True, wide="hashed")
    cfg_m = MinimizerConfig(k=50, m=45, spaces=3, masked=True, wide="exact")
    # per-word masks recompose to the full seed mask
    full = 0
    for w, msk in zip(cfg_m.word_widths, cfg_m.word_masks):
        full = (full << (2 * w)) | msk
    assert full == cfg_m.seed_mask
    # emitted ids of a masked config are the per-word-masked exact ids
    rng = np.random.default_rng(33)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 500))
    from slacken_spark.kernels.minimizers import supermer_words

    codes = bitseq.encode_codes(seq)
    cfg_e = MinimizerConfig(k=50, m=45, spaces=3, wide="exact")
    we, _s, _k = supermer_words(codes, cfg_e)
    wm, _s2, _k2 = supermer_words(codes, cfg_m)
    # same selection (rank function identical), masked identity
    for exact, masked, msk in zip(we, wm, cfg_m.word_masks):
        assert np.array_equal(exact & np.uint64(msk), masked)


def _mix62_int(hi: int, lo: int) -> int:
    """Pure-python splitmix mirror of kernels._mix62 (uint64 wraparound)."""
    M64 = (1 << 64) - 1
    h = (hi ^ ((lo * 0x9E3779B97F4A7C15) & M64)) & M64
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & M64
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & M64
    h = h ^ (h >> 31)
    return h & ((1 << 62) - 1)


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="ACGT", min_size=60, max_size=200), st.integers(0, 5))
def test_wide_supermers_match_naive_model(s, spaces):
    """Wide minimizers (incl. spaced seeds): the kernel's supermer
    minimizers must match a pure-python per-window model — pack halves,
    canonicalize, mask halves, splitmix rank, leftmost min."""
    from slacken_spark.kernels.minimizers import (
        spaced_seed_mask,
        supermer_arrays,
    )

    m, k = 45, 50
    cfg = MinimizerConfig(k=k, m=m, spaces=spaces, canonical=True, wide="exact")
    codes = bitseq.encode_codes(s)
    if len(s) < k:
        return
    m1, m2, starts, kmers = supermer_arrays(codes, cfg)
    # naive model
    full = spaced_seed_mask(m, spaces)
    lo_bits = 2 * (m - 31)
    mask_lo, mask_hi = full & ((1 << lo_bits) - 1), full >> lo_bits
    packs = []
    for i in range(len(s) - m + 1):
        mm = s[i : i + m]
        rcm = bitseq.revcomp_str(mm)
        canon = min(mm, rcm)
        hi = sum(
            {"A": 0, "C": 1, "G": 2, "T": 3}[c] << (2 * (30 - j))
            for j, c in enumerate(canon[:31])
        )
        lo = sum(
            {"A": 0, "C": 1, "G": 2, "T": 3}[c] << (2 * (m - 32 - j))
            for j, c in enumerate(canon[31:])
        )
        rank = (
            _mix62_int(hi & mask_hi, lo & mask_lo)
            if spaces
            else _mix62_int(hi, lo)
        )
        packs.append((rank, hi, lo))
    w = k - m + 1
    expect = []
    last = None
    for ws in range(len(s) - k + 1):
        rank, pos = min((packs[p][0], p) for p in range(ws, ws + w))
        if ws == 0 or pos != last:
            expect.append((packs[pos][1], packs[pos][2]))
        last = pos
    got = list(zip(m1.tolist(), m2.tolist()))
    assert got == expect
    assert kmers.sum() == len(s) - k + 1


def test_spaced_seed_mask_example():
    """MinimizerPriorities.scala:282-321 doc example: s=3 zeroes every
    other 2-bit position starting second-from-right."""
    from slacken_spark.kernels.minimizers import spaced_seed_mask

    m = 9
    mask = spaced_seed_mask(m, 3)
    # TTCTGTGGG with positions 1,3,5 (from right) zeroed → TTCAGAGAG
    seq = "TTCTGTGGG"
    packed = int(bitseq.pack_kmers(bitseq.encode_codes(seq), m)[0])
    masked = packed & mask
    assert bitseq.unpack_kmer(masked, m) == "TTCAGAGAG"


# ---------------- batched scanning ----------------

batch_of_reads = st.lists(
    st.text(alphabet="ACGTN", min_size=0, max_size=120), min_size=0, max_size=12
)


def _spans_model(seqs, cfg, seqs2=None):
    """Per-read model output: (unit, minimizer-or-None, distinct, kmers, flag)
    rows; ambiguous/border minimizers are random spreading keys, compared
    as None."""
    from slacken_spark.kernels.minimizers import read_span_arrays

    rng = np.random.default_rng(1)
    rows = []
    for i, s in enumerate(seqs):
        s2 = seqs2[i] if seqs2 is not None else None
        mins, mins2, dist, kmers, flags = read_span_arrays(s, cfg, rng, seq2=s2)
        for mz, mz2, d, km, fl in zip(mins, mins2, dist, kmers, flags):
            key = (int(mz), int(mz2)) if fl == FLAG_SEQUENCE else None
            rows.append((i, key, bool(d), int(km), int(fl)))
    return rows


def _spans_batched(seqs, cfg, seqs2=None):
    from slacken_spark.kernels.minimizers import batch_span_arrays

    rng = np.random.default_rng(2)
    counts, mins, mins2, dist, kmers, flags = batch_span_arrays(seqs, cfg, rng, seqs2)
    unit = np.repeat(np.arange(len(seqs)), counts)
    return [
        (
            int(u),
            (int(mz), int(mz2)) if fl == FLAG_SEQUENCE else None,
            bool(d),
            int(km),
            int(fl),
        )
        for u, mz, mz2, d, km, fl in zip(unit, mins, mins2, dist, kmers, flags)
    ]


@settings(max_examples=120, deadline=None)
@given(batch_of_reads, small_cfgs)
def test_batch_span_arrays_matches_per_read(seqs, cfg):
    assert _spans_batched(seqs, cfg) == _spans_model(seqs, cfg)


@settings(max_examples=60, deadline=None)
@given(batch_of_reads, batch_of_reads, small_cfgs)
def test_batch_span_arrays_paired_matches_per_read(s1, s2, cfg):
    n = min(len(s1), len(s2))
    s1, s2 = s1[:n], s2[:n]
    assert _spans_batched(s1, cfg, s2) == _spans_model(s1, cfg, s2)


@settings(max_examples=60, deadline=None)
@given(batch_of_reads)
def test_batch_genome_minimizers_matches_per_seq(seqs):
    from slacken_spark.kernels.minimizers import batch_genome_minimizers

    cfg = MinimizerConfig(k=15, m=9, spaces=0)
    unit_of, mins, _ = batch_genome_minimizers(seqs, cfg)
    got = {}
    for u, mz in zip(unit_of, mins):
        got.setdefault(int(u), []).append(int(mz))
    want = {}
    for i, s in enumerate(seqs):
        g = genome_minimizers(s, cfg)
        if len(g):
            want[i] = [int(x) for x in g.astype(np.int64)]
    assert got == want


def test_batch_span_arrays_wide_m(seqs=None):
    from slacken_spark.kernels.minimizers import MinimizerConfig as MC

    rng = np.random.default_rng(9)
    seqs = ["".join("ACGT"[i] for i in rng.integers(0, 4, 200)) for _ in range(5)]
    cfg = MC(k=50, m=45, spaces=0)
    assert _spans_batched(seqs, cfg) == _spans_model(seqs, cfg)


def _spans_model_words(seqs, cfg, seqs2=None):
    from slacken_spark.kernels.minimizers import read_span_words

    rows = []
    for i, s in enumerate(seqs):
        rng = np.random.default_rng(1)
        s2 = seqs2[i] if seqs2 is not None else None
        words, dist, kmers, flags = read_span_words(s, cfg, rng, s2)
        for j in range(len(dist)):
            key = (
                tuple(int(w[j]) for w in words)
                if flags[j] == FLAG_SEQUENCE
                else None
            )
            rows.append((i, key, bool(dist[j]), int(kmers[j]), int(flags[j])))
    return rows


def _spans_batched_words(seqs, cfg, seqs2=None):
    from slacken_spark.kernels.minimizers import batch_span_words

    rng = np.random.default_rng(2)
    counts, words, dist, kmers, flags = batch_span_words(seqs, cfg, rng, seqs2)
    unit = np.repeat(np.arange(len(seqs)), counts)
    return [
        (
            int(u),
            tuple(int(w[j]) for w in words) if fl == FLAG_SEQUENCE else None,
            bool(d),
            int(km),
            int(fl),
        )
        for j, (u, d, km, fl) in enumerate(zip(unit, dist, kmers, flags))
    ]


@pytest.mark.parametrize("m,k", [(70, 75), (100, 105), (124, 124)])
def test_batch_span_words_extra_wide_exact_matches_per_read(m, k):
    """Exact multi-word ids (3-4 words, the reference's id3/id4 range,
    KmerKeyedIndex.scala:44-53): batch pipeline == per-read model,
    ambiguity splits included."""
    from slacken_spark.kernels.minimizers import MinimizerConfig as MC

    cfg = MC(k=k, m=m, spaces=0, wide="exact")
    rng = np.random.default_rng(m)
    seqs = []
    for _ in range(6):
        s = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
        # plant an ambiguous run splitting the read
        p = int(rng.integers(50, 350))
        seqs.append(s[:p] + "N" * int(rng.integers(1, 2 * k)) + s[p:])
    assert _spans_batched_words(seqs, cfg) == _spans_model_words(seqs, cfg)


@pytest.mark.parametrize("m", [70, 100, 124])
def test_extra_wide_exact_key_bijection(m):
    """Exact id1..idN keys are invertible: word j unpacks to bases
    [31j, 31j+w_j) of the canonical m-mer, and distinct m-mers get
    distinct key tuples."""
    from slacken_spark.kernels.minimizers import scan_mmers_words

    cfg = MinimizerConfig(k=m, m=m, spaces=0, canonical=True, wide="exact")
    rng = np.random.default_rng(m + 1)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, m))
    s = (
        "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
        + core
        + "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
        + bitseq.revcomp_str(core)
        + "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    )
    words, _ = scan_mmers_words(bitseq.encode_codes(s), cfg)
    assert len(words) == cfg.n_words
    widths = [min(31, m - 31 * j) for j in range(cfg.n_words)]
    by_string: dict[str, set] = {}
    for i in range(len(s) - m + 1):
        mm = s[i : i + m]
        canon = min(mm, bitseq.revcomp_str(mm))
        key = tuple(int(w[i]) for w in words)
        by_string.setdefault(canon, set()).add(key)
        # key unpacks back to the canonical m-mer
        assert "".join(
            bitseq.unpack_kmer(kk, w) for kk, w in zip(key, widths)
        ) == canon
    assert all(len(v) == 1 for v in by_string.values())
    all_ids = [next(iter(v)) for v in by_string.values()]
    assert len(set(all_ids)) == len(all_ids)
    # the planted core and its revcomp share a key
    canon_core = min(core, bitseq.revcomp_str(core))
    assert len(by_string[canon_core]) == 1


def test_min_table_uint32_and_cap():
    from slacken_spark.kernels.minimizers import (
        table_from_frequencies,
        uniform_random_table,
    )

    t = uniform_random_table(8)
    assert t.dtype == np.uint32
    assert len(t) == 4**8 and sorted(set(t.tolist())) == list(range(4**8))
    f = table_from_frequencies(4, {0: 100, 7: 1})
    assert f.dtype == np.uint32
    # rarer m-mer 7 outranks (lower value) the frequent m-mer 0
    assert f[7] < f[0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        uniform_random_table(16)


@pytest.mark.parametrize("m", [80, 124])
def test_extra_wide_hashed_identity(m):
    """63 < m ≤ 124 (3-4 words, the reference's id3/id4 range): hashed
    ids are canonical-string functions — equal strings (incl. planted
    revcomp) share an id, distinct strings get distinct ids."""
    from slacken_spark.kernels.minimizers import scan_mmers_full

    cfg = MinimizerConfig(k=m, m=m, spaces=0, canonical=True, wide="hashed")
    rng = np.random.default_rng(m)
    core = "".join("ACGT"[i] for i in rng.integers(0, 4, m))
    s = (
        "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
        + core
        + "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
        + bitseq.revcomp_str(core)
        + "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
    )
    id1, id2, ranks = scan_mmers_full(bitseq.encode_codes(s), cfg)
    assert (id2 == 0).all()
    by_string: dict[str, set] = {}
    for i in range(len(s) - m + 1):
        mm = s[i : i + m]
        canon = min(mm, bitseq.revcomp_str(mm))
        by_string.setdefault(canon, set()).add(int(id1[i]))
    assert all(len(v) == 1 for v in by_string.values())
    ids = [next(iter(v)) for v in by_string.values()]
    assert len(set(ids)) == len(ids)
    canon_core = min(core, bitseq.revcomp_str(core))
    assert len(by_string[canon_core]) == 1


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="ACGTN", min_size=0, max_size=400))
def test_extra_wide_span_accounting(s):
    cfg = MinimizerConfig(k=100, m=95, spaces=0, wide="hashed")
    spans = read_spans(s, cfg)
    codes = bitseq.encode_codes(s)
    expect = sum(
        (e - st_) - cfg.k + 1
        for st_, e, v in split_by_ambiguity(codes, cfg.k)
        if v
    )
    assert sum(sp.kmers for sp in spans if sp.flag == FLAG_SEQUENCE) == expect


def test_extra_wide_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MinimizerConfig(k=130, m=125, spaces=0, wide="hashed")  # > 4 words
    cfg = MinimizerConfig(k=90, m=80, spaces=0, wide="hashed")
    assert cfg.key_cols == ["id1"]
    cfg = MinimizerConfig(k=90, m=80, spaces=0, wide="exact")
    assert cfg.key_cols == ["id1", "id2", "id3"]
    assert cfg.id_cols == ["id1", "id2", "id3"]
    cfg = MinimizerConfig(k=124, m=124, spaces=0, wide="exact")
    assert cfg.key_cols == ["id1", "id2", "id3", "id4"]
    cfg = MinimizerConfig(k=35, m=31)
    assert cfg.key_cols == ["id1"] and cfg.id_cols == ["id1", "id2"]


def test_extra_wide_orientation_invariant():
    cfg = MinimizerConfig(k=100, m=93, spaces=0, canonical=True, wide="hashed")
    rng = np.random.default_rng(5)
    s = "".join("ACGT"[i] for i in rng.integers(0, 4, 400))
    a = set(genome_minimizers(s, cfg).tolist())
    b = set(genome_minimizers(bitseq.revcomp_str(s), cfg).tolist())
    assert a == b
