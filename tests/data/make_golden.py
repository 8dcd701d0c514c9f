"""Golden-constant generator for the committed micro-corpus.

Computes expected scanner/index counts with PURE PYTHON string/int
arithmetic — no numpy, no engine kernels — playing the role of the
reference's independently-computed counts (KMC3 + Discount,
Testing.scala:158-173). Re-run to regenerate golden_tiny.fna,
golden_labels.tsv and golden_expected.json; the committed JSON is what
tests/test_golden_constants.py asserts against.

Corpus: g101 = core(400) + uniq101(500) + N-run + uniq101b(300);
g102 = core(400) + uniq102(700) (core shared → LCA lifts to brand 5);
g201 = uniq201(900) with a lowercase region and a short N-run.
Taxonomy: ROOT(1) ← 5 ← {101, 102}; ROOT ← 20 ← 201.
"""

import json
import os
import random

K, M, SPACES = 35, 31, 7
XOR = 0xE37E28C4271B5A2D
HERE = os.path.dirname(os.path.abspath(__file__))

rng = random.Random(20260813)


def rand_dna(n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def spaced_seed_mask(m, spaces):
    mask = (1 << (2 * m)) - 1
    for i in range(spaces):
        pos = 2 * i + 1
        if pos >= m:
            break
        mask &= ~(0b11 << (2 * pos))
    return mask


CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def pack(s):
    v = 0
    for ch in s:
        v = (v << 2) | CODE[ch]
    return v


def revcomp(s):
    return "".join(COMP[c] for c in reversed(s))


MASK_2M = (1 << (2 * M)) - 1
SEED_MASK = spaced_seed_mask(M, SPACES)


def window_stats(seq):
    """(valid_kmers, span_kmer_total, distinct_minimizers, supermers)
    by brute-force window scanning over case-folded runs."""
    s = seq.upper()
    n = len(s)
    # maximal valid runs
    runs = []
    i = 0
    while i < n:
        j = i
        is_valid = s[i] in CODE
        while j < n and (s[j] in CODE) == is_valid:
            j += 1
        runs.append((i, j, is_valid))
        i = j
    valid_kmers = 0
    span_total = 0
    minimizers = set()
    supermers = 0
    for st, en, ok in runs:
        ln = en - st
        if ln < K:
            continue
        if not ok:
            span_total += ln - (K - 1)
            continue
        valid_kmers += ln - K + 1
        span_total += ln - K + 1
        # per-window leftmost-min rank m-mer
        seg = s[st:en]
        ranks, emits = [], []
        for p in range(len(seg) - M + 1):
            mm = seg[p : p + M]
            canon = min(pack(mm), pack(revcomp(mm)))
            ranks.append(((canon ^ (XOR & MASK_2M)) & SEED_MASK, p))
            emits.append(canon)
        last_pos = None
        w = K - M + 1
        for wstart in range(len(seg) - K + 1):
            best_rank, best_pos = min(
                (ranks[p][0], p) for p in range(wstart, wstart + w)
            )
            minimizers.add(emits[best_pos])
            if wstart == 0 or best_pos != last_pos:
                supermers += 1
            last_pos = best_pos
    return valid_kmers, span_total, minimizers, supermers


def main():
    core = rand_dna(400)
    genomes = {
        "g101": core + rand_dna(500) + "N" * 60 + rand_dna(300),
        "g102": core + rand_dna(700),
        "g201": rand_dna(400) + rand_dna(200).lower() + "NNNNN" + rand_dna(300),
    }
    labels = {"g101": 101, "g102": 102, "g201": 201}

    with open(os.path.join(HERE, "golden_tiny.fna"), "w") as f:
        for h, seq in genomes.items():
            f.write(f">{h}\n")
            for i in range(0, len(seq), 60):
                f.write(seq[i : i + 60] + "\n")
    with open(os.path.join(HERE, "golden_labels.tsv"), "w") as f:
        for h, t in labels.items():
            f.write(f"{h}\t{t}\n")

    per_genome = {}
    all_mins = {}
    for h, seq in genomes.items():
        vk, st_total, mins, sm = window_stats(seq)
        per_genome[h] = {
            "valid_kmers": vk,
            "span_kmer_total": st_total,
            "distinct_minimizers": len(mins),
            "supermers": sm,
        }
        for mz in mins:
            all_mins.setdefault(mz, set()).add(labels[h])

    # LCA over ROOT(1) ← 5 ← {101,102}; ROOT ← 20 ← 201
    parent = {101: 5, 102: 5, 201: 20, 5: 1, 20: 1, 1: 0}

    def lca(taxa):
        paths = []
        for t in taxa:
            p, cur = [], t
            while cur:
                p.append(cur)
                cur = parent[cur]
            paths.append(p[::-1])
        out = None
        for level in zip(*paths):
            if len(set(level)) == 1:
                out = level[0]
        return out

    per_taxon = {}
    for mz, owners in all_mins.items():
        t = lca(owners)
        per_taxon[t] = per_taxon.get(t, 0) + 1

    expected = {
        "config": {"k": K, "m": M, "spaces": SPACES, "xor_mask": XOR},
        "per_genome": per_genome,
        "index_records": len(all_mins),
        "records_per_taxon": {str(t): n for t, n in sorted(per_taxon.items())},
    }
    with open(os.path.join(HERE, "golden_expected.json"), "w") as f:
        json.dump(expected, f, indent=2)
    print(json.dumps(expected, indent=2))


if __name__ == "__main__":
    main()
