"""Minimizer scanning kernels: m-mer priorities, sliding-window minimum,
super-mer grouping, ambiguity splitting — numpy-vectorized.

Re-derives (not translates) the reference's scanner pipeline:
  - ShiftScanner.allMatches (kmers/minimizer/ShiftScanner.scala:90-159):
    single pass producing the m-mer priority at every position;
  - PosRankWindow (kmers/minimizer/PosRankWindow.scala:33-97): O(n)
    sliding-window minimum → minimizer per k-window;
  - MinSplitter.superkmerPositions (kmers/minimizer/MinSplitter.scala:98-216):
    group consecutive k-mers sharing a minimizer into super-mers;
  - Supermers.splitByAmbiguity (slacken/Supermers.scala:49-66,135-189):
    maximal valid segments; ambiguous spans; the `distinct` flag rule
    (Supermers.scala:70-97).

Priority orders (kmers/minimizer/MinimizerPriorities.scala):
  - RandomXOR (:144-179): priority = m-mer ⊕ toggle mask (Kraken 2
    default mask 0xe37e28c4271b5a2d), optionally over the canonical
    orientation;
  - SpacedSeed (:282-321): zero out ``s`` 2-bit positions (every other
    position from the right) before comparison.

All functions operate on whole sequences (numpy) and are called from
Arrow-batched Spark boundaries (mapInPandas) — never per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from slacken_spark.kernels import bitseq

DEFAULT_XOR_MASK = 0xE37E28C4271B5A2D  # minimizer/package.scala:32

# span flags (slacken/package.scala:36-62)
FLAG_SEQUENCE = 1
FLAG_AMBIGUOUS = 2
FLAG_MATE_PAIR_BORDER = 3


def spaced_seed_mask(m: int, spaces: int) -> int:
    """AND-mask zeroing ``spaces`` 2-bit positions, every other position
    starting second-from-right (MinimizerPriorities.scala:282-321:
    TTCTGTGGG, s=3 → TTCAGAGAG — positions 1,3,5 from the right)."""
    mask = (1 << (2 * m)) - 1
    for i in range(spaces):
        pos = 2 * i + 1
        if pos >= m:
            break
        mask &= ~(0b11 << (2 * pos))
    return mask


@dataclass(frozen=True)
class MinimizerConfig:
    """Splitter parameters (mirrors the reference's IndexParams core)."""

    k: int = 35
    m: int = 31
    spaces: int = 7
    xor_mask: int = DEFAULT_XOR_MASK
    canonical: bool = True
    # When True, emitted minimizer ids are masked with the spaced-seed
    # mask (rank space modulo the XOR bijection) — the reference's
    # SpacedSeed storage semantics, required for respace projections
    # (KeyValueIndex.scala:347-383). Default False stores exact m-mers.
    masked: bool = False
    # Wide-minimizer (m > 31) key scheme: "exact" stores the packed
    # 31-base words as (id1..idN) columns, N = ceil(m/31) ≤ 4 — the
    # reference's multi-long id1..idN columns (KmerKeyedIndex.scala:44-53)
    # — collision-free and invertible; "hashed" stores one 62-bit mixed
    # hash (round-1 scheme; ~n²/2⁶³ collision bound, irreversible) as an
    # opt-in for single-column compatibility. Ignored for m ≤ 31.
    wide: str = "exact"

    def __post_init__(self):
        if not (0 < self.m <= 124):
            raise ValueError("m must be in 1..124 (4 packed words, like the"
                             " reference's id1..id4 cap at 128 bp)")
        if self.m > 31 and self.masked and self.wide == "hashed":
            # a mixed hash is not maskable; masked wide storage needs
            # the exact multi-word ids so each word can be re-masked
            raise ValueError(
                "masked storage for m > 31 requires wide='exact'"
            )
        if self.k < self.m:
            raise ValueError("k must be >= m")
        if self.wide not in ("exact", "hashed"):
            raise ValueError("wide must be 'exact' or 'hashed'")

    @property
    def n_words(self) -> int:
        """Packed 31-base words needed for an exact m-mer identity."""
        return (self.m + 30) // 31

    @property
    def wide_exact(self) -> bool:
        """True when minimizer identity is the multi-column (id1..idN) tuple."""
        return self.m > 31 and self.wide == "exact"

    @property
    def key_cols(self) -> list[str]:
        """Join/grouping key columns of the stored minimizer id."""
        if self.wide_exact:
            return [f"id{j + 1}" for j in range(self.n_words)]
        return ["id1"]

    @property
    def id_cols(self) -> list[str]:
        """Physical id columns of span/record rows: always at least
        (id1, id2) — id2 rides along as zero for single-word schemes —
        plus id3/id4 for exact m > 62."""
        return [f"id{j + 1}" for j in range(max(2, len(self.key_cols)))]

    @property
    def window(self) -> int:
        """Number of m-mer positions per k-window."""
        return self.k - self.m + 1

    @property
    def mask_2m(self) -> int:
        return (1 << (2 * self.m)) - 1

    @property
    def seed_mask(self) -> int:
        return spaced_seed_mask(self.m, self.spaces)

    @property
    def word_widths(self) -> list[int]:
        """Base width of each packed word: 31, 31, ..., remainder."""
        widths, off = [], 0
        while off < self.m:
            widths.append(min(31, self.m - off))
            off += 31
        return widths

    @property
    def word_masks(self) -> list[int]:
        """``seed_mask`` sliced per packed word (aligned with
        ``word_widths``) — the per-column masks a respace projection
        applies to exact multi-word ids."""
        full = self.seed_mask
        shift = 2 * self.m
        out = []
        for w in self.word_widths:
            shift -= 2 * w
            out.append((full >> shift) & ((1 << (2 * w)) - 1))
        return out

    def to_dict(self) -> dict:
        return {
            "k": self.k,
            "m": self.m,
            "spaces": self.spaces,
            "xor_mask": self.xor_mask,
            "canonical": self.canonical,
            "masked": self.masked,
            "wide": self.wide,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "MinimizerConfig":
        return cls(
            k=int(d["k"]),
            m=int(d["m"]),
            spaces=int(d["spaces"]),
            xor_mask=int(d["xor_mask"]),
            canonical=bool(d["canonical"]),
            masked=bool(d.get("masked", False)),
            # round-1 sidecars predate the field and stored hashed ids
            wide=str(d.get("wide", "hashed")),
        )


def uniform_random_table(m: int, seed: int = 42) -> np.ndarray:
    """Explicit-priority table (MinTable, MinimizerPriorities.scala:192-271):
    a random permutation of all 4^m m-mers as uint32 (4^15 < 2³², so the
    reference's m ≤ 15 cap fits; m=15 is a 4 GiB broadcast — size for
    executor memory accordingly). Ship to executors via sc.broadcast and
    pass as ``priority_table``."""
    if m > 15:
        raise ValueError("priority tables supported for m <= 15")
    rng = np.random.default_rng(seed)
    return rng.permutation(1 << (2 * m)).astype(np.uint32)


def table_from_frequencies(m: int, counts: dict[int, int]) -> np.ndarray:
    """Frequency-ordered priority table: rarer m-mers win (lower rank),
    unseen m-mers ranked before seen ones by value — the
    frequency-counted ordering the reference builds MinTables for."""
    if m > 15:
        raise ValueError("priority tables supported for m <= 15")
    n = 1 << (2 * m)
    freq = np.zeros(n, dtype=np.int64)
    for mm, c in counts.items():
        freq[mm] = c
    # sort by (frequency asc, m-mer asc) → rank
    order = np.lexsort((np.arange(n), freq))
    table = np.empty(n, dtype=np.uint32)
    table[order] = np.arange(n, dtype=np.uint32)
    return table


def _mix62(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Deterministic 62-bit mix of two packed words (splitmix64-style)."""
    h = hi ^ (lo * np.uint64(0x9E3779B97F4A7C15))
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    return h & np.uint64((1 << 62) - 1)


def scan_mmers_wide(
    codes: np.ndarray, cfg: MinimizerConfig
) -> tuple[list[np.ndarray], np.ndarray]:
    """Wide minimizers (31 < m ≤ 124): the reference widens the key to
    id1..idN long columns (KmerKeyedIndex.scala:44-53). The default
    ``wide="exact"`` scheme does the same: word j is the canonical
    m-mer's bases [31j, 31j+w_j) packed, N = ceil(m/31) ≤ 4 —
    collision-free and invertible; the index buckets on id1 and joins on
    ALL columns. The selection rank is a 62-bit mix of the words (a
    pseudo-random ordering, which is exactly what RandomXOR provides for
    m ≤ 31). ``wide="hashed"`` opts into the round-1 single-column
    scheme: id1 = the mix itself (expected colliding minimizer PAIRS
    among n distinct minimizers ≈ n²/2⁶³ — a collision merely merges two
    LCA records — but stored ids are irreversible).

    Returns (words, ranks): words has n_words arrays under "exact", one
    under "hashed".
    """
    m = cfg.m
    n = len(codes) - m + 1
    if n <= 0:
        e = np.empty(0, dtype=np.uint64)
        return [e.copy() for _ in range(1 if cfg.wide == "hashed" else cfg.n_words)], e
    # word j covers bases [31j, 31j + w_j), w_j = min(31, m - 31j)
    widths = []
    off = 0
    while off < m:
        widths.append(min(31, m - off))
        off += 31
    packs = {w: bitseq.pack_kmers(codes, w) for w in set(widths)}
    fwd = []
    offs = [31 * j for j in range(len(widths))]
    for j, (w, o) in enumerate(zip(widths, offs)):
        fwd.append(packs[w][o : o + n])
    if cfg.canonical:
        # word j of the rc m-mer = revcomp of fwd bases
        # [m - 31j - w_j, m - 31j) — the mirrored slice
        rc = []
        for j, (w, o) in enumerate(zip(widths, offs)):
            src = m - o - w
            rc.append(bitseq.revcomp_packed(packs[w][src : src + n], w))
        # lexicographic min across word tuples
        take_rc = np.zeros(n, dtype=bool)
        tied = np.ones(n, dtype=bool)
        for f, r in zip(fwd, rc):
            take_rc |= tied & (r < f)
            tied &= r == f
        fwd = [np.where(take_rc, r, f) for f, r in zip(fwd, rc)]
    if cfg.spaces > 0:
        # spaced seeds over wide ids: zero the masked 2-bit positions of
        # each packed word BEFORE the rank mix, so m-mers equal on the
        # unmasked positions rank identically (SpacedSeed wraps the
        # inner ordering, MinimizerPriorities.scala:282-321); stored ids
        # stay exact unless cfg.masked opts into SpacedSeed STORAGE
        # semantics (respace projections, KeyValueIndex.scala:347-383)
        masked = [
            word & np.uint64(wmask)
            for word, wmask in zip(fwd, cfg.word_masks)
        ]
        rank_words = masked
        if cfg.masked and cfg.wide == "exact":
            fwd = masked
    else:
        rank_words = fwd
    ranks = rank_words[0]
    for word in rank_words[1:]:
        ranks = _mix62(ranks, word)
    if cfg.wide == "hashed":
        if cfg.spaces == 0:
            ids = ranks
        else:
            ids = fwd[0]
            for word in fwd[1:]:
                ids = _mix62(ids, word)
        return [ids], ranks
    return fwd, ranks


def scan_mmers_words(
    codes: np.ndarray,
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[list[np.ndarray], np.ndarray]:
    """One packing pass → (words, ranks).

    ``words`` is the stored/joined minimizer identity (canonical, masked
    when cfg.masked): one array for m ≤ 31 and hashed-wide, ceil(m/31)
    arrays for exact-wide; ranks are the selection priorities (XOR ⊕
    spaced mask).

    Orderings (MinimizerPriorities.scala variants): the default
    ``xor_mask`` gives the Kraken 2 pseudo-random ordering (RandomXOR,
    :144-179); ``xor_mask=0`` degenerates to classic LEXICOGRAPHIC
    minimizers; an explicit-priority MinTable (:192-271) is the
    remaining variant (frequency-ordered tables — see NOTES.md).
    """
    if cfg.m > 31:
        if priority_table is not None:
            raise ValueError("priority tables require m <= 15")
        return scan_mmers_wide(codes, cfg)
    mmers = bitseq.pack_kmers(codes, cfg.m)
    if cfg.canonical:
        mmers = bitseq.canonical_packed(mmers, cfg.m)
    if priority_table is not None:
        if cfg.spaces > 0:
            raise ValueError("priority tables don't compose with spaced seeds")
        return [mmers], priority_table[mmers.astype(np.int64)].astype(np.uint64)
    ranks = mmers ^ (np.uint64(cfg.xor_mask) & np.uint64(cfg.mask_2m))
    if cfg.spaces > 0:
        ranks = ranks & np.uint64(cfg.seed_mask)
    emit = mmers
    if cfg.masked and cfg.spaces > 0:
        emit = emit & np.uint64(cfg.seed_mask)
    return [emit], ranks


def scan_mmers_full(
    codes: np.ndarray,
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-word compatibility wrapper over :func:`scan_mmers_words` →
    (id1, id2, ranks); id2 is all-zero for single-word schemes. Exact
    configs wider than two words (m > 62) must use scan_mmers_words."""
    words, ranks = scan_mmers_words(codes, cfg, priority_table)
    if len(words) > 2:
        raise ValueError("m > 62 exact ids need scan_mmers_words (id1..idN)")
    id2 = words[1] if len(words) > 1 else np.zeros(len(words[0]), dtype=np.uint64)
    return words[0], id2, ranks


def scan_mmers(
    codes: np.ndarray,
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(id1, ranks) — single-id compatibility wrapper over
    scan_mmers_full. NOTE: for wide-exact configs id1 alone is NOT a
    unique minimizer identity; pair-aware callers must use
    scan_mmers_full."""
    id1, _, ranks = scan_mmers_full(codes, cfg, priority_table)
    return id1, ranks


def mmer_priorities(codes: np.ndarray, cfg: MinimizerConfig) -> np.ndarray:
    """Priority (rank) of the m-mer starting at every position.

    Lower rank = higher priority (the minimizer is the min-rank m-mer).
    Caller guarantees codes are all valid (0-3).
    """
    return scan_mmers(codes, cfg)[1]


def window_minimizers(ranks: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """Sliding-window minimum over m-mer ranks.

    Returns (min_rank_per_window, argmin_position_per_window); argmin is
    the LEFTMOST minimal position (PosRankWindow keeps the earliest
    minimum). Sparse-table doubling over (value, position) pairs:
    log2(w) rounds of contiguous compares/selects — ~2-3× faster than a
    strided-view argmin (non-contiguous reduction), and O(n log w) vs a
    Python monotonic queue's interpreted O(n). Ties keep the left
    operand at every combine, so the leftmost minimum survives.
    """
    n = len(ranks) - window + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    val = np.asarray(ranks)
    pos = np.arange(len(ranks), dtype=np.int64)
    p = 1
    while p * 2 <= window:
        m = len(val) - p
        take = val[p:][:m] < val[:m]  # strictly smaller → right wins
        val = np.where(take, val[p:][:m], val[:m])
        pos = np.where(take, pos[p:][:m], pos[:m])
        p *= 2
    off = window - p  # overlapping tail block [i+off, i+off+p)
    v1, p1 = val[:n], pos[:n]
    v2, p2 = val[off : off + n], pos[off : off + n]
    take = v2 < v1
    return np.where(take, v2, v1), np.where(take, p2, p1)


def supermer_words(
    codes: np.ndarray,
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray]:
    """Array fast path of supermer splitting: returns
    (minimizer word arrays, start, kmers) per super-mer, no Python
    objects or string slicing — the index-build/classify hot path.
    Same boundary semantics as supermers_of_codes."""
    n_k = len(codes) - cfg.k + 1
    empty = np.empty(0, dtype=np.int64)
    n_key = len(cfg.key_cols)
    if n_k <= 0:
        return [empty.copy() for _ in range(n_key)], empty, empty.copy()
    words, ranks = scan_mmers_words(codes, cfg, priority_table)
    _, min_pos = window_minimizers(ranks, cfg.window)
    change = np.empty(n_k, dtype=bool)
    change[0] = True
    change[1:] = min_pos[1:] != min_pos[:-1]
    starts = np.flatnonzero(change).astype(np.int64)
    ends = np.append(starts[1:], n_k)
    sel = min_pos[starts]
    return (
        [w[sel].astype(np.int64) for w in words],
        starts,
        (ends - starts).astype(np.int64),
    )


def supermer_arrays(
    codes: np.ndarray,
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Two-word compatibility wrapper over :func:`supermer_words` →
    (minimizer1, minimizer2, start, kmers); minimizer2 is all-zero for
    single-word schemes."""
    words, starts, kmers = supermer_words(codes, cfg, priority_table)
    if len(words) > 2:
        raise ValueError("m > 62 exact ids need supermer_words (id1..idN)")
    m2 = words[1] if len(words) > 1 else np.zeros(len(words[0]), dtype=np.int64)
    return words[0], m2, starts, kmers


@dataclass
class Supermer:
    """One super-k-mer: consecutive k-mers sharing a minimizer."""

    minimizer: int  # packed canonical m-mer (uint64 value)
    rank: int  # its priority
    start: int  # offset of the first k-mer in the segment
    kmers: int  # number of consecutive k-mers
    nucleotides: str  # the super-mer's sequence (kmers + k - 1 bases)


def supermers_of_codes(
    codes: np.ndarray, cfg: MinimizerConfig, seq: str | None = None
) -> list[Supermer]:
    """Split a fully-valid code array into super-mers.

    Groups consecutive k-positions whose window minimizer position is
    identical (MinSplitter.scala:98-216 semantics: a new super-mer starts
    exactly when the minimizer *position* changes).
    """
    n_k = len(codes) - cfg.k + 1
    if n_k <= 0:
        return []
    mmers, ranks = scan_mmers(codes, cfg)
    min_ranks, min_pos = window_minimizers(ranks, cfg.window)
    # boundaries where the minimizer position changes
    change = np.empty(n_k, dtype=bool)
    change[0] = True
    change[1:] = min_pos[1:] != min_pos[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n_k)  # exclusive, in k-mer positions
    out = []
    if seq is None:
        seq = bitseq.decode_codes(codes)
    for s, e in zip(starts, ends):
        p = min_pos[s]
        out.append(
            Supermer(
                minimizer=int(mmers[p]),
                rank=int(min_ranks[s]),
                start=int(s),
                kmers=int(e - s),
                nucleotides=seq[s : e + cfg.k - 1],
            )
        )
    return out


def split_by_ambiguity(
    codes: np.ndarray, k: int
) -> list[tuple[int, int, bool]]:
    """Maximal alternating valid/ambiguous runs as (start, end, is_valid).

    Matches Supermers.splitByAmbiguity (Supermers.scala:135-189): valid
    runs shorter than k are flagged ambiguous (they cannot produce a
    k-mer); adjacent ambiguous runs stay separate segments.
    """
    n = len(codes)
    if n == 0:
        return []
    valid = codes <= 3
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = valid[1:] != valid[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return [
        (int(s), int(e), bool(valid[s]) and (e - s) >= k)
        for s, e in zip(starts, ends)
    ]


def valid_segments(codes: np.ndarray, min_len: int) -> list[tuple[int, int]]:
    """Maximal runs of valid (0-3) codes with length ≥ min_len."""
    return [
        (s, e) for s, e, is_valid in split_by_ambiguity(codes, min_len) if is_valid
    ]


@dataclass
class OrdinalSpan:
    """A span of a read: super-mer hit group or ambiguous/border marker
    (slacken/package.scala:36-62)."""

    minimizer: int  # packed m-mer (id1); random for ambiguous spans
    distinct: bool  # first span with this minimizer in the read
    kmers: int  # number of k-mers (or ambiguous pseudo-k-mer count)
    flag: int  # FLAG_SEQUENCE / FLAG_AMBIGUOUS / FLAG_MATE_PAIR_BORDER
    ordinal: int  # position of the span within the read
    minimizer2: int = 0  # second id word (wide-exact configs only)


def read_spans(
    seq: str,
    cfg: MinimizerConfig,
    seq2: str | None = None,
    rng: np.random.Generator | None = None,
) -> list[OrdinalSpan]:
    """Split a read (or mate pair) into ordered spans.

    Implements the reference's span pipeline (Supermers.scala:49-97,
    113-125):
    - segments < k bases are dropped entirely (splitFragment's
      ``if ntseq.length >= k`` guard);
    - ambiguous segments (invalid chars, or valid runs < k) count
      ``len − (k−1)`` pseudo-k-mers and get random minimizers so their
      rows spread evenly across shuffle partitions (Supermers.scala:34-42);
    - a MATE_PAIR_BORDER pseudo-span separates R1 and R2;
    - ``distinct`` marks a valid span whose minimizer differs from the
      PREVIOUS valid span's (consecutive-duplicate suppression → hit
      groups, Supermers.scala:79-91).
    """
    if rng is None:
        rng = np.random.default_rng(0x5EED)
    spans: list[OrdinalSpan] = []
    last_valid_minimizer: int | None = None

    def one_read(s: str) -> None:
        nonlocal last_valid_minimizer
        codes = bitseq.encode_codes(s)
        for st, en, is_valid in split_by_ambiguity(codes, cfg.k):
            if en - st < cfg.k:
                continue
            if not is_valid:
                spans.append(
                    OrdinalSpan(
                        minimizer=int(rng.integers(0, 1 << 62)),
                        distinct=False,
                        kmers=(en - st) - (cfg.k - 1),
                        flag=FLAG_AMBIGUOUS,
                        ordinal=0,
                    )
                )
                continue
            mins, mins2, _, kmers = supermer_arrays(codes[st:en], cfg)
            for mz, mz2, km in zip(mins.tolist(), mins2.tolist(), kmers.tolist()):
                spans.append(
                    OrdinalSpan(
                        minimizer=mz,
                        distinct=(mz, mz2) != last_valid_minimizer,
                        kmers=km,
                        flag=FLAG_SEQUENCE,
                        ordinal=0,
                        minimizer2=mz2,
                    )
                )
                last_valid_minimizer = (mz, mz2)

    one_read(seq)
    if seq2 is not None:
        spans.append(
            OrdinalSpan(
                minimizer=int(rng.integers(0, 1 << 62)),
                distinct=False,
                kmers=0,
                flag=FLAG_MATE_PAIR_BORDER,
                ordinal=0,
            )
        )
        one_read(seq2)
    for i, sp in enumerate(spans):
        sp.ordinal = i
    return spans


def read_span_words(
    seq: str,
    cfg: MinimizerConfig,
    rng: np.random.Generator,
    seq2: str | None = None,
    priority_table: np.ndarray | None = None,
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray, np.ndarray]:
    """Array-native read_spans: (words, distinct, kmers, flags),
    ordinal = position. Same semantics as read_spans without per-span
    Python objects. ``words`` holds ``len(cfg.id_cols)`` arrays —
    trailing arrays all-zero for schemes with fewer key words."""
    n_key = len(cfg.key_cols)
    n_ids = len(cfg.id_cols)
    words_l: list[list[np.ndarray]] = [[] for _ in range(n_key)]
    dist_l: list[np.ndarray] = []
    kmers_l: list[np.ndarray] = []
    flags_l: list[np.ndarray] = []
    last_valid = tuple(np.int64(-1) for _ in range(n_key))  # packed ids are ≥ 0
    have_last = False

    def pseudo_span(kmers: int, flag: int) -> None:
        words_l[0].append(rng.integers(0, 1 << 62, size=1, dtype=np.int64))
        for j in range(1, n_key):
            words_l[j].append(np.zeros(1, dtype=np.int64))
        dist_l.append(np.zeros(1, dtype=bool))
        kmers_l.append(np.array([kmers], dtype=np.int64))
        flags_l.append(np.full(1, flag, dtype=np.int64))

    def one_read(s: str) -> None:
        nonlocal last_valid, have_last
        codes = bitseq.encode_codes(s)
        for st, en, is_valid in split_by_ambiguity(codes, cfg.k):
            if en - st < cfg.k:
                continue
            if not is_valid:
                pseudo_span((en - st) - (cfg.k - 1), FLAG_AMBIGUOUS)
                continue
            ws, _, kmers = supermer_words(codes[st:en], cfg, priority_table)
            n = len(ws[0])
            d = np.empty(n, dtype=bool)
            if n:
                first = tuple(w_[0] for w_ in ws)
                d[0] = (not have_last) or first != last_valid
                d[1:] = False
                for w_ in ws:
                    d[1:] |= w_[1:] != w_[:-1]
                last_valid = tuple(w_[-1] for w_ in ws)
                have_last = True
            for j in range(n_key):
                words_l[j].append(ws[j])
            dist_l.append(d)
            kmers_l.append(kmers)
            flags_l.append(np.full(n, FLAG_SEQUENCE, dtype=np.int64))

    one_read(seq)
    if seq2 is not None:
        pseudo_span(0, FLAG_MATE_PAIR_BORDER)
        one_read(seq2)
    if not dist_l:
        e = np.empty(0, dtype=np.int64)
        return (
            [e.copy() for _ in range(n_ids)],
            np.empty(0, dtype=bool),
            e.copy(),
            e.copy(),
        )
    words = [np.concatenate(w_) for w_ in words_l]
    total = len(words[0])
    words += [np.zeros(total, dtype=np.int64) for _ in range(n_ids - n_key)]
    return (
        words,
        np.concatenate(dist_l),
        np.concatenate(kmers_l),
        np.concatenate(flags_l),
    )


def read_span_arrays(
    seq: str,
    cfg: MinimizerConfig,
    rng: np.random.Generator,
    seq2: str | None = None,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Two-word compatibility wrapper over :func:`read_span_words` →
    (minimizers, minimizers2, distinct, kmers, flags)."""
    words, distinct, kmers, flags = read_span_words(
        seq, cfg, rng, seq2, priority_table
    )
    if len(words) > 2:
        raise ValueError("m > 62 exact ids need read_span_words (id1..idN)")
    return words[0], words[1], distinct, kmers, flags


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def batch_span_words(
    seqs: list[str],
    cfg: MinimizerConfig,
    rng: np.random.Generator,
    seqs2: list | None = None,
    priority_table: np.ndarray | None = None,
    return_pos: bool = False,
) -> tuple:
    """Whole-batch read_span_arrays: ONE encode/scan/window-min/supermer
    pass over every read of an Arrow batch instead of ~30 small numpy
    calls per 150 bp read (whose fixed overhead dominated classification
    throughput). Reads — mate pairs joined by one separator — are
    concatenated with single ``\\x00`` separators, which encode as
    INVALID so no k-mer, m-mer or ambiguous run ever crosses a read or
    mate boundary; spans are then recovered by offset arithmetic.

    Returns ``(counts, words, distinct, kmers, flags)``: counts[i] is
    the span count of read unit i; span rows are unit-major in sequence
    order (ordinal = position within unit); ``words`` holds
    ``len(cfg.id_cols)`` arrays — trailing arrays are all-zero for
    schemes with fewer key words. Semantics match read_span_arrays /
    Supermers.scala:49-97 — segments shorter than k are dropped,
    ambiguous runs ≥ k become one pseudo-span with a random spreading
    minimizer, paired units get a MATE_PAIR_BORDER pseudo-span, and the
    ``distinct`` consecutive-duplicate suppression persists across
    ambiguity and the mate border but resets per unit. (Random
    minimizers of ambiguous/border spans are drawn batch-at-once, so
    their VALUES differ from the per-read path — they are shuffle-
    spreading keys only, Supermers.scala:34-42.)

    With ``return_pos=True`` a sixth array is appended: each span's
    START position local to its unit string — the k-mer start for
    sequence spans, the run start for ambiguous spans, the border index
    for mate borders. For paired units the position counts the one
    ``\\x00`` separator, so R2 positions are offset by len(R1)+1.
    """
    n_units = len(seqs)
    counts = np.zeros(n_units, dtype=np.int64)
    e64 = np.empty(0, dtype=np.int64)
    n_ids = len(cfg.id_cols)
    n_key = len(cfg.key_cols)

    def empty():
        out = (
            counts,
            [e64.copy() for _ in range(n_ids)],
            np.empty(0, dtype=bool),
            e64.copy(),
            e64.copy(),
        )
        return out + (e64.copy(),) if return_pos else out

    if n_units == 0:
        return empty()
    if seqs2 is None:
        seqs2 = [None] * n_units
    units: list[str] = []
    border_rel = np.full(n_units, -1, dtype=np.int64)
    for i, (s1, s2) in enumerate(zip(seqs, seqs2)):
        if isinstance(s2, str):
            units.append(s1 + "\x00" + s2)
            border_rel[i] = len(s1)
        else:
            units.append(s1)
    unit_lens = np.fromiter((len(u) for u in units), dtype=np.int64, count=n_units)
    unit_starts = np.zeros(n_units, dtype=np.int64)
    np.cumsum(unit_lens[:-1] + 1, out=unit_starts[1:])
    codes = bitseq.encode_codes("\x00".join(units))
    n = len(codes)
    if n == 0:
        return empty()
    k, m, w = cfg.k, cfg.m, cfg.window

    is_sep = np.zeros(n, dtype=bool)
    if n_units > 1:
        is_sep[unit_starts[1:] - 1] = True
    border_pos = (unit_starts + border_rel)[border_rel >= 0]
    if len(border_pos):
        is_sep[border_pos] = True

    valid = codes <= 3
    inv_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(~valid, out=inv_cum[1:])

    # ----- super-mers over k-valid positions -----
    sm_pos, sm_kmers = e64, e64
    sm_words = [e64.copy() for _ in range(n_key)]
    n_k = n - k + 1
    if n_k > 0:
        # neutralize invalid codes for the packer (garbage values would
        # overflow 2-bit packing / priority-table indexing); their ranks
        # are forced to +inf and never selected for a k-valid window
        codes_clean = np.where(valid, codes, 0).astype(np.uint8)
        emit_words, ranks = scan_mmers_words(codes_clean, cfg, priority_table)
        m_ok = (inv_cum[m:] - inv_cum[:-m]) == 0
        k_ok = (inv_cum[k:] - inv_cum[:-k]) == 0
        ranks = np.where(m_ok, ranks, _U64_MAX)
        _, min_pos = window_minimizers(ranks, w)
        prev_k = np.zeros(n_k, dtype=bool)
        prev_k[1:] = k_ok[:-1]
        prev_pos = np.full(n_k, -1, dtype=np.int64)
        prev_pos[1:] = min_pos[:-1]
        change = k_ok & (~prev_k | (min_pos != prev_pos))
        sm_pos = np.flatnonzero(change)
        if len(sm_pos):
            run_start = k_ok & ~prev_k
            nxt_k = np.zeros(n_k, dtype=bool)
            nxt_k[:-1] = k_ok[1:]
            run_ends = np.flatnonzero(k_ok & ~nxt_k)  # inclusive, one per run
            run_id = np.cumsum(run_start)[sm_pos] - 1
            next_sm = np.append(sm_pos[1:], n_k)
            sm_kmers = np.minimum(next_sm, run_ends[run_id] + 1) - sm_pos
            sel = min_pos[sm_pos]
            sm_words = [w_[sel].astype(np.int64) for w_ in emit_words]

    # ----- ambiguous runs (per mate, ≥ k long; separators break runs) ---
    inv_real = (~valid) & (~is_sep)
    prev_ir = np.zeros(n, dtype=bool)
    prev_ir[1:] = inv_real[:-1]
    nxt_ir = np.zeros(n, dtype=bool)
    nxt_ir[:-1] = inv_real[1:]
    a_starts = np.flatnonzero(inv_real & ~prev_ir)
    a_ends = np.flatnonzero(inv_real & ~nxt_ir)  # inclusive
    a_len = a_ends - a_starts + 1
    keep = a_len >= k
    a_pos = a_starts[keep]
    a_kmers = (a_len[keep] - (k - 1)).astype(np.int64)

    # ----- assemble in global position order (== unit-major order) -----
    n_sm, n_amb, n_bord = len(sm_pos), len(a_pos), len(border_pos)
    total = n_sm + n_amb + n_bord
    if total == 0:
        return empty()
    pos = np.concatenate([sm_pos, a_pos, border_pos])
    zeros_ab = np.zeros(n_amb + n_bord, dtype=np.int64)
    words = [
        np.concatenate(
            [
                sm_words[j],
                rng.integers(0, 1 << 62, size=n_amb + n_bord, dtype=np.int64)
                if j == 0
                else zeros_ab,
            ]
        )
        for j in range(n_key)
    ]
    kmers = np.concatenate([sm_kmers, a_kmers, np.zeros(n_bord, dtype=np.int64)])
    flags = np.concatenate(
        [
            np.full(n_sm, FLAG_SEQUENCE, dtype=np.int64),
            np.full(n_amb, FLAG_AMBIGUOUS, dtype=np.int64),
            np.full(n_bord, FLAG_MATE_PAIR_BORDER, dtype=np.int64),
        ]
    )
    order = np.argsort(pos)  # positions are unique across the three kinds
    pos, kmers, flags = pos[order], kmers[order], flags[order]
    words = [w_[order] for w_ in words]
    unit_of = np.searchsorted(unit_starts, pos, side="right") - 1
    counts = np.bincount(unit_of, minlength=n_units).astype(np.int64)

    distinct = np.zeros(total, dtype=bool)
    vi = np.flatnonzero(flags == FLAG_SEQUENCE)
    if len(vi):
        vunit = unit_of[vi]
        d = np.empty(len(vi), dtype=bool)
        d[0] = True
        d[1:] = vunit[1:] != vunit[:-1]
        for w_ in words:
            vw = w_[vi]
            d[1:] |= vw[1:] != vw[:-1]
        distinct[vi] = d
    # pad to the physical column count (id2 rides along as zero)
    words += [np.zeros(total, dtype=np.int64) for _ in range(n_ids - n_key)]
    if return_pos:
        local = pos - unit_starts[unit_of]
        return counts, words, distinct, kmers, flags, local
    return counts, words, distinct, kmers, flags


def batch_span_arrays(
    seqs: list[str],
    cfg: MinimizerConfig,
    rng: np.random.Generator,
    seqs2: list | None = None,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Two-word compatibility wrapper over :func:`batch_span_words` →
    (counts, minimizers, minimizers2, distinct, kmers, flags)."""
    counts, words, distinct, kmers, flags = batch_span_words(
        seqs, cfg, rng, seqs2, priority_table
    )
    if len(words) > 2:
        raise ValueError("m > 62 exact ids need batch_span_words (id1..idN)")
    return counts, words[0], words[1], distinct, kmers, flags


def batch_genome_words(
    seqs: list[str],
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Batched genome_minimizers: every super-mer minimizer of every
    sequence in one kernel pass. Returns (unit_idx, words)."""
    rng = np.random.default_rng(0)  # ambiguous spans are discarded below
    counts, words, _, _, flags = batch_span_words(
        seqs, cfg, rng, None, priority_table
    )
    unit_of = np.repeat(np.arange(len(seqs), dtype=np.int64), counts)
    sel = flags == FLAG_SEQUENCE
    return unit_of[sel], [w_[sel] for w_ in words]


def batch_genome_minimizers(
    seqs: list[str],
    cfg: MinimizerConfig,
    priority_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-word compatibility wrapper over :func:`batch_genome_words` →
    (unit_idx, min1, min2)."""
    unit_of, words = batch_genome_words(seqs, cfg, priority_table)
    if len(words) > 2:
        raise ValueError("m > 62 exact ids need batch_genome_words (id1..idN)")
    return unit_of, words[0], words[1]


def genome_minimizers(
    seq: str, cfg: MinimizerConfig, priority_table: np.ndarray | None = None
) -> np.ndarray:
    """All (non-distinct-filtered) super-mer minimizers of a genome —
    the index-build extraction (Minimizers.find, Minimizers.scala:43-76).
    Returns one packed minimizer (id1) per super-mer; pair-aware callers
    (wide-exact) use batch_genome_minimizers."""
    codes = bitseq.encode_codes(seq)
    out = []
    for st, en in valid_segments(codes, cfg.k):
        mins, _, _, _ = supermer_arrays(codes[st:en], cfg, priority_table)
        out.append(mins)
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(out).astype(np.uint64)


def naive_minimizer_positions(seq: str, cfg: MinimizerConfig) -> list[int]:
    """Obviously-correct reference model for property tests: for each
    k-window, scan its m-mers linearly and take the leftmost min-rank
    position. O(n·w·m) — test-only."""
    codes = bitseq.encode_codes(seq)
    if (codes > 3).any() or len(codes) < cfg.k:
        raise ValueError("naive model expects a fully-valid sequence ≥ k")
    ranks = []
    for i in range(len(codes) - cfg.m + 1):
        v = 0
        for c in codes[i : i + cfg.m]:
            v = (v << 2) | int(c)
        if cfg.canonical:
            rc = 0
            for c in codes[i : i + cfg.m][::-1]:
                rc = (rc << 2) | (3 - int(c))
            v = min(v, rc)
        r = v ^ (cfg.xor_mask & cfg.mask_2m)
        if cfg.spaces > 0:
            r &= cfg.seed_mask
        ranks.append(r)
    out = []
    w = cfg.window
    for i in range(len(codes) - cfg.k + 1):
        win = ranks[i : i + w]
        best = min(win)
        out.append(i + win.index(best))
    return out
