"""Property test: vectorized resolve_tree_batch ≡ scalar resolve_tree
over random taxonomies, random hit maps, and random thresholds (the
model-based strategy of LowestCommonAncestorProps.scala:66-107)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy


@st.composite
def taxonomy_and_hits(draw):
    n = draw(st.integers(4, 40))
    rng_seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    ids = list(range(2, n + 2))
    parents = [int(rng.integers(1, i)) for i in ids]  # parent < child id
    tax = Taxonomy.from_edges(ids, parents)
    n_reads = draw(st.integers(1, 8))
    reads = []
    for _ in range(n_reads):
        k = min(draw(st.integers(1, 6)), len(ids) + 1)
        taxa = rng.choice(ids + [1], size=k, replace=False).astype(int)
        counts = rng.integers(1, 10, size=k)
        total = int(counts.sum())
        required = draw(
            st.one_of(
                st.just(0.0),
                st.floats(0, 1).map(lambda f, t=total: np.ceil(f * t)),
            )
        )
        reads.append((dict(zip(taxa.tolist(), counts.tolist())), float(required)))
    return tax, reads


@settings(max_examples=200, deadline=None)
@given(taxonomy_and_hits())
def test_batch_matches_scalar(tr):
    tax, reads = tr
    seg, taxa, counts, req = [], [], [], []
    for i, (hits, r) in enumerate(reads):
        for t, c in hits.items():
            seg.append(i)
            taxa.append(t)
            counts.append(c)
        req.append(r)
    usegs, winners = tax.resolve_tree_batch(
        np.array(seg), np.array(taxa), np.array(counts), np.array(req)
    )
    for i, (hits, r) in enumerate(reads):
        expect = tax.resolve_tree(hits, r)
        got = int(winners[list(usegs).index(i)])
        assert got == expect, (hits, r, got, expect)


def test_batch_with_none_key():
    tax = Taxonomy.from_edges([2, 3], [1, 2])
    # read 0: only NONE hits → NONE; read 1: normal
    usegs, winners = tax.resolve_tree_batch(
        np.array([0, 1, 1]),
        np.array([NONE, 3, NONE]),
        np.array([5, 2, 1]),
        np.array([0.0, 0.0]),
    )
    assert winners.tolist() == [NONE, 3]


def test_batch_lift_to_none_when_unreachable():
    tax = Taxonomy.from_edges([2, 3], [1, 2])
    usegs, winners = tax.resolve_tree_batch(
        np.array([0]), np.array([3]), np.array([2]), np.array([100.0])
    )
    assert winners.tolist() == [NONE]
