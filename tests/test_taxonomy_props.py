"""Taxonomy structural invariants over random trees — the
TaxonomyProps.scala:28-151 pillar: depth, children, leaf, LCA,
ancestorAtLevel and closure properties re-checked with hypothesis."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from slacken_spark.kernels.taxonomy import (
    NONE,
    RANK_DEPTH,
    RANKS,
    ROOT,
    Taxonomy,
)


@st.composite
def taxonomies(draw):
    n = draw(st.integers(3, 80))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    ids = list(range(2, n + 2))
    parents = [int(rng.integers(1, i)) for i in ids]  # parent id < child id
    rank_pool = list(RANKS[1:]) + ["no rank"] * 2
    ranks = [rank_pool[i] for i in rng.integers(0, len(rank_pool), n)]
    return Taxonomy.from_edges(ids, parents, ranks=ranks), ids, rng


@settings(max_examples=80, deadline=None)
@given(taxonomies())
def test_path_to_root_terminates_at_root(tw):
    tax, ids, rng = tw
    for t in rng.choice(ids, size=min(10, len(ids)), replace=False):
        path = tax.path_to_root(int(t))
        assert path[0] == t and path[-1] == ROOT
        # structural depth equals path length
        assert tax.sdepth[t] == len(path)
        # consecutive path elements are parent links
        for a, b in zip(path, path[1:]):
            assert int(tax.parents[a]) == b


@settings(max_examples=80, deadline=None)
@given(taxonomies())
def test_children_mirror_parents(tw):
    tax, ids, _ = tw
    for t in ids:
        p = int(tax.parents[t])
        assert t in tax.children[p]
        assert tax.is_leaf(t) == (len(tax.children[t]) == 0)


@settings(max_examples=80, deadline=None)
@given(taxonomies())
def test_lca_properties(tw):
    tax, ids, rng = tw
    pick = lambda: int(rng.choice(ids))  # noqa: E731
    for _ in range(8):
        a, b = pick(), pick()
        l = tax.lca(a, b)
        # commutative; idempotent; an ancestor of both
        assert tax.lca(b, a) == l
        assert tax.lca(a, a) == a
        assert tax.has_ancestor(a, l) and tax.has_ancestor(b, l)
        # deepest common ancestor: no deeper common node on either path
        common = set(tax.path_to_root(a)) & set(tax.path_to_root(b))
        assert l == max(common, key=lambda t: tax.sdepth[t])


@settings(max_examples=60, deadline=None)
@given(taxonomies())
def test_segment_lca_matches_pairwise(tw):
    tax, ids, rng = tw
    k = min(6, len(ids))
    taxa = rng.choice(ids, size=k, replace=True).astype(np.int64)
    seg = np.zeros(k, dtype=np.int64)
    useg, lcas = tax.segment_lca(seg, taxa)
    expect = int(taxa[0])
    for t in taxa[1:]:
        expect = tax.lca(expect, int(t))
    assert list(useg) == [0] and int(lcas[0]) == expect


@settings(max_examples=60, deadline=None)
@given(taxonomies())
def test_ancestor_at_level_and_depth(tw):
    tax, ids, rng = tw
    for t in rng.choice(ids, size=min(8, len(ids)), replace=False):
        t = int(t)
        d = tax.depth(t)
        if d > 0:
            anc = tax.ancestor_at_level(t, d)
            assert anc != NONE and tax.has_ancestor(t, anc)
            assert tax.depth(anc) == d
        # species query either finds a ranked ancestor or NONE
        s = tax.ancestor_at_level(t, RANK_DEPTH["species"])
        if s != NONE:
            assert tax.depth(s) == RANK_DEPTH["species"]


@settings(max_examples=60, deadline=None)
@given(taxonomies())
def test_closures(tw):
    tax, ids, rng = tw
    base = {int(t) for t in rng.choice(ids, size=min(5, len(ids)), replace=False)}
    up = tax.taxa_with_ancestors(base)
    assert base <= up and ROOT in up
    for t in up:  # closed under parent
        if t != ROOT:
            assert int(tax.parents[t]) in up
    down = tax.taxa_with_descendants(base)
    assert base <= down
    for t in down:  # closed under children
        for c in tax.children[t]:
            assert c in down
