"""functions.graph.pagerank_int vs a pure-Python reference of the
identical integer recurrence, on irregular graphs where centrality is
non-uniform."""

import pytest

from slacken_spark.functions.graph import pagerank_int


def _reference(pairs, iters, scale=1_000_000):
    """Model: same symmetric edges / floor-div recurrence as the
    engine, in plain dicts."""
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    deg = {u: len(vs) for u, vs in edges.items()}
    base = scale - (scale * 85) // 100
    rank = {u: scale for u in deg}
    for _ in range(iters):
        recv = {u: 0 for u in deg}
        for u, vs in edges.items():
            c = rank[u] // deg[u]
            for v in vs:
                recv[v] += c
        rank = {v: base + (85 * s) // 100 for v, s in recv.items()}
    return {u: (deg[u], rank[u]) for u in deg}


# star (hub 0), a pendant chain off leaf 3, and a triangle sharing
# node 5 — degrees 1..6, nothing regular
PAIRS = [
    (0, 1),
    (0, 2),
    (0, 3),
    (0, 4),
    (0, 5),
    (3, 6),
    (6, 7),
    (5, 8),
    (5, 9),
    (8, 9),
]


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_pagerank_matches_reference(spark, iters):
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    got = {
        r["id"]: (r["deg"], r["rank"])
        for r in pagerank_int(pairs, iters=iters).collect()
    }
    assert got == _reference(PAIRS, iters)


def test_pagerank_centrality_orders_hub_over_leaf(spark):
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    got = {r["id"]: r["rank"] for r in pagerank_int(pairs, iters=3).collect()}
    # the hub outranks every leaf; a pendant-chain end ranks lowest-ish
    assert got[0] > max(got[1], got[2], got[4])
    assert got[0] > got[7]
    # non-uniform: an irregular graph must not collapse to one value
    assert len(set(got.values())) > 1


def test_pagerank_rejects_bad_iters(spark):
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    with pytest.raises(ValueError):
        pagerank_int(pairs, iters=0)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_pagerank_matches_reference_on_random_graphs(spark, seed):
    """Randomized model equivalence: Erdős–Rényi-ish graphs with
    self-loop-free deduped edges, degrees 1..n-1."""
    import random

    rng = random.Random(seed)
    n = rng.randint(5, 25)
    pairs = sorted(
        {
            (a, b)
            for _ in range(rng.randint(n, 3 * n))
            for a, b in [sorted(rng.sample(range(n), 2))]
        }
    )
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["id"]: (r["deg"], r["rank"])
        for r in pagerank_int(df, iters=3).collect()
    }
    assert got == _reference(pairs, 3)


def test_pagerank_checkpoints_route_through_stats_free(spark, monkeypatch):
    """Every lineage-truncation checkpoint in the PageRank loop must
    rebuild through dedup._stats_free: round k's rank table is a JOIN
    over two earlier checkpoints, so preserved sizeInBytes estimates
    compound across rounds (the dedup BigInteger planning blowup,
    r9-deferred hygiene). Counts the wiring — directed pair list (pinned
    once so the symmetric union doesn't re-run the caller's
    pair-discovery subtree per branch, r13-opt) + edges + degrees + one
    per iteration — and re-checks the ranks still come out."""
    import slacken_spark.functions.dedup as dedup
    from slacken_spark.functions.graph import pagerank_int as pr

    calls = {"n": 0}
    orig = dedup._stats_free

    def counting(df):
        calls["n"] += 1
        return orig(df)

    monkeypatch.setattr(dedup, "_stats_free", counting)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = {r["id"]: r["rank"] for r in pr(pairs, iters=3).collect()}
    assert calls["n"] == 3 + 3, calls["n"]
    assert set(out) == {0, 1, 2, 3} and all(v > 0 for v in out.values())
