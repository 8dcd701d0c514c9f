"""2-bit DNA encoding kernels, numpy-vectorized.

Re-derives the semantics of the reference's bit-level sequence model
(reference: kmers/util/BitRepresentation.scala:31-84,
kmers/util/NTBitArray.scala:81-271) as array programs over whole
sequences/batches — never per-character Python.

Encoding: A=0, C=1, G=2, T=3 (U=3), chosen so that complement is XOR
with all-ones. Invalid characters map to INVALID (4); whitespace to
WHITESPACE (5). K-mers/m-mers up to 32 bp pack into one uint64, MSB
first (leftmost base in the highest bits), matching the reference's
left-aligned layout.
"""

from __future__ import annotations

import numpy as np

INVALID = 4
WHITESPACE = 5

# ASCII → 2-bit code lookup (BitRepresentation.scala:127-167 semantics)
_CODE = np.full(256, INVALID, dtype=np.uint8)
for ch, code in (("A", 0), ("C", 1), ("G", 2), ("T", 3), ("U", 3)):
    _CODE[ord(ch)] = code
    _CODE[ord(ch.lower())] = code
for ch in " \t\n\r":
    _CODE[ord(ch)] = WHITESPACE

_DECODE = np.frombuffer(b"ACGT", dtype=np.uint8)

# complement = XOR with 3 in this encoding
_COMP = np.array([3, 2, 1, 0, INVALID, WHITESPACE], dtype=np.uint8)


def encode_codes(seq: str | bytes) -> np.ndarray:
    """Sequence string → uint8 code array (0-3 valid, 4 invalid, 5 ws)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii", errors="replace")
    return _CODE[np.frombuffer(seq, dtype=np.uint8)]


def decode_codes(codes: np.ndarray) -> str:
    """Code array (values 0-3) → ACGT string."""
    return _DECODE[np.asarray(codes, dtype=np.uint8)].tobytes().decode("ascii")


def revcomp_str(seq: str) -> str:
    """Reverse complement of an ACGT string (invalid chars pass through N)."""
    codes = encode_codes(seq)
    rc = _COMP[codes[::-1]]
    out = np.where(rc <= 3, _DECODE[np.minimum(rc, 3)], ord("N")).astype(np.uint8)
    return out.tobytes().decode("ascii")


def pack_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """All k-mers of a code array packed into uint64 (k ≤ 32), MSB-first.

    Doubling construction (the numpy answer to the reference's rolling
    ``shiftAddBP`` scan, ShiftScanner.scala:90-159): pack runs of
    2,4,8,… bases by combining shifted halves, then assemble k from its
    binary decomposition — O(n·log k) contiguous vector ops. (The naive
    sliding-window × weights multiply materializes an (n,k) strided temp
    and is ~100× slower at genome scale.) Caller guarantees codes are
    valid (0-3); invalid positions are handled by segmenting upstream.
    """
    codes = np.asarray(codes, dtype=np.uint64)
    n_out = len(codes) - k + 1
    if n_out <= 0:
        return np.empty(0, dtype=np.uint64)
    # packs[j][i] = bases i..i+j-1 packed, for j = powers of two
    packs: dict[int, np.ndarray] = {1: codes}
    j = 1
    while j * 2 <= k:
        prev = packs[j]
        packs[j * 2] = (prev[: len(prev) - j] << np.uint64(2 * j)) | prev[j:]
        j *= 2
    result: np.ndarray | None = None
    consumed = 0
    for size in sorted(packs, reverse=True):
        if consumed + size > k:
            continue
        piece = packs[size][consumed : consumed + n_out]
        if result is None:
            result = piece.astype(np.uint64, copy=True)
        else:
            result = (result << np.uint64(2 * size)) | piece
        consumed += size
    return result


def unpack_kmer(packed: int, k: int) -> str:
    """uint64 → ACGT string of length k (for tests/debug)."""
    codes = [(int(packed) >> (2 * (k - 1 - i))) & 3 for i in range(k)]
    return decode_codes(np.array(codes, dtype=np.uint8))


def revcomp_packed(x: np.ndarray, m: int) -> np.ndarray:
    """Vectorized reverse complement of packed m-mers (m ≤ 32).

    Bit-parallel: complement every base (XOR all-ones), swap adjacent
    2-bit bases, then bytes, then words — the same O(log w) swizzle the
    reference adapts from Kraken 2 (BitRepresentation.scala:57-84).
    """
    x = np.asarray(x, dtype=np.uint64)
    mask_m = (
        np.uint64(0xFFFFFFFFFFFFFFFF)
        if m == 32
        else ((np.uint64(1) << np.uint64(2 * m)) - np.uint64(1))
    )
    y = (~x) & mask_m  # complement
    # swap adjacent 2-bit groups
    y = ((y >> np.uint64(2)) & np.uint64(0x3333333333333333)) | (
        (y & np.uint64(0x3333333333333333)) << np.uint64(2)
    )
    # swap nibbles
    y = ((y >> np.uint64(4)) & np.uint64(0x0F0F0F0F0F0F0F0F)) | (
        (y & np.uint64(0x0F0F0F0F0F0F0F0F)) << np.uint64(4)
    )
    # swap bytes via byteswap
    y = y.byteswap()
    # now the m-mer occupies the TOP 2m bits; shift back down
    y = y >> np.uint64(64 - 2 * m)
    return y


def canonical_packed(x: np.ndarray, m: int) -> np.ndarray:
    """Elementwise min(forward, reverse-complement) — canonical m-mers
    (NTBitArray.scala:231-271 canonical semantics)."""
    rc = revcomp_packed(x, m)
    return np.minimum(np.asarray(x, dtype=np.uint64), rc)
