"""functions.dedup.lsh_pair_delta — incremental maintenance of the
MinHash-LSH candidate-pair graph (the dedup twin of the inverted-index
delta): the emitted diff must equal the full-graph before/after diff
restricted to pairs touching a changed doc, and pairs between two
unchanged docs must never be computed or emitted."""

from pyspark.sql import functions as F

from slacken_spark.functions import dedup as D


def _sig(df):
    return D.minhash_signature(df, "text", "doc_id", n_hashes=8, shingle_words=3)


def _pairs(df):
    return {
        (r["id_a"], r["id_b"])
        for r in D.minhash_band_pairs(
            _sig(df), "doc_id", n_hashes=8, bands=4
        ).collect()
    }


def test_lsh_pair_delta_equals_full_graph_diff(spark):
    """Ground truth by brute force: compute the FULL candidate graph
    before and after the update and diff it — lsh_pair_delta must
    reproduce exactly the added and dropped pairs (all of which touch
    a changed doc by construction), and nothing else."""
    text_a = "the quick brown fox jumps over the lazy dog today"
    text_b = "pack my box with five dozen liquor jugs right now"
    base_rows = [
        (0, text_a),
        (1, text_a + " extra"),       # near-dup of 0 in the base
        (2, text_b),
        (3, text_b + " indeed"),      # near-dup of 2 in the base
        (4, "completely unrelated words appear in this document body"),
    ]
    # update: doc 1 diverges (drops its pair with 0); doc 4 becomes a
    # copy of doc 2's text (adds pairs with 2 and 3)
    upd_rows = [
        (1, "totally different content with no overlap whatsoever here"),
        (4, text_b),
    ]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    upd = spark.createDataFrame(upd_rows, "doc_id long, text string")
    merged = base.where(~F.col("doc_id").isin([1, 4])).unionByName(upd)

    before, after = _pairs(base), _pairs(merged)
    changed = {1, 4}
    expect_add = {
        p for p in after - before if p[0] in changed or p[1] in changed
    }
    expect_drop = {
        p for p in before - after if p[0] in changed or p[1] in changed
    }
    # sanity: the fixture really exercises both branches, and no pair
    # between unchanged docs changed (so the restriction is vacuous
    # here — lsh_pair_delta must still equal the full diff)
    assert expect_add and expect_drop
    assert expect_add == after - before and expect_drop == before - after

    got = D.lsh_pair_delta(_sig(base), _sig(upd), "doc_id").collect()
    got_add = {(r["id_a"], r["id_b"]) for r in got if r["change"] == "add"}
    got_drop = {(r["id_a"], r["id_b"]) for r in got if r["change"] == "drop"}
    assert got_add == expect_add
    assert got_drop == expect_drop
    # the surviving base pair (2,3) is unchanged-unchanged: never emitted
    assert (2, 3) in after and (2, 3) not in got_add | got_drop


def test_lsh_pair_delta_empty_update(spark):
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    upd = spark.createDataFrame([], "doc_id long, text string")
    assert D.lsh_pair_delta(_sig(base), _sig(upd), "doc_id").count() == 0


def test_components_add_edges_equals_full_recompute(spark):
    """Add-only incremental components ≡ from-scratch propagation over
    base ∪ new edges, across every merge shape: comp↔comp,
    singleton↔singleton, brand-new nodes, a multi-comp chain, a
    within-component no-op edge, and a new node bridging a component
    and a singleton."""
    from pyspark.sql import functions as F  # noqa: F401

    from slacken_spark.functions.dedup import (
        components_add_edges,
        connected_components,
    )

    def full(pairs):
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        return {
            r["node"]: r["component"]
            for r in connected_components(df).collect()
        }

    base = [(1, 2), (2, 3), (10, 11), (20, 21)]
    nodes = sorted({x for p in base for x in p} | {30, 40})
    lab = full(base)
    labels_df = spark.createDataFrame(
        [(n, lab.get(n, n)) for n in nodes], "node long, component long"
    )
    cases = [
        [(3, 10)],
        [(30, 40)],
        [(50, 51)],
        [(11, 20), (21, 1)],
        [(1, 3)],
        [(5, 10), (5, 30)],
    ]
    for new in cases:
        got = {
            r["node"]: r["component"]
            for r in components_add_edges(
                labels_df,
                spark.createDataFrame(new, "id_a long, id_b long"),
            ).collect()
        }
        want_all = full(base + new)
        touched = set(nodes) | {x for p in new for x in p}
        want = {n: want_all.get(n, n) for n in touched}
        assert got == want, (new, got, want)


def test_components_add_edges_randomized(spark):
    """Randomized: grow a random graph by a random edge batch; the
    maintained labels must equal the full recompute for every node."""
    import random

    from slacken_spark.functions.dedup import (
        components_add_edges,
        connected_components,
    )

    rng = random.Random(77)
    n = 40
    base = sorted(
        {
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(30)
        }
    )
    new = sorted(
        {
            tuple(sorted(rng.sample(range(n + 10), 2)))
            for _ in range(15)
        }
        - set(base)
    )
    full_base = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(base, "id_a long, id_b long")
        ).collect()
    }
    labels_df = spark.createDataFrame(
        [(i, full_base.get(i, i)) for i in range(n)],
        "node long, component long",
    )
    got = {
        r["node"]: r["component"]
        for r in components_add_edges(
            labels_df, spark.createDataFrame(new, "id_a long, id_b long")
        ).collect()
    }
    want_all = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(base + new, "id_a long, id_b long")
        ).collect()
    }
    touched = set(range(n)) | {x for p in new for x in p}
    want = {i: want_all.get(i, i) for i in touched}
    assert got == want


def _labels_over(spark, edges, nodes):
    """(node, component) for every node in ``nodes`` — singletons coalesce
    to their own id, the components_* caller convention."""
    from slacken_spark.functions.dedup import connected_components

    comp = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long")
        ).collect()
    } if edges else {}
    return spark.createDataFrame(
        [(i, comp.get(i, i)) for i in sorted(nodes)],
        "node long, component long",
    )


def test_components_drop_edges_bridge_split(spark):
    """Removing a bridge splits its component; removing a redundant
    edge of a triangle does not — the two fixtures the drop path must
    distinguish (an add-only maintainer can do neither)."""
    from slacken_spark.functions.dedup import components_drop_edges

    # component A: triangle {0,1,2} + bridge 2-10 to chain {10,11}
    # component B: pair {20,21}; singleton 30
    edges = [(0, 1), (1, 2), (0, 2), (2, 10), (10, 11), (20, 21)]
    nodes = {0, 1, 2, 10, 11, 20, 21, 30}
    labels = _labels_over(spark, edges, nodes)

    # drop the bridge: {0,1,2} and {10,11} split
    dropped = [(2, 10)]
    surv = [e for e in edges if e not in dropped]
    got = {
        r["node"]: r["component"]
        for r in components_drop_edges(
            labels,
            spark.createDataFrame(surv, "id_a long, id_b long"),
            spark.createDataFrame(dropped, "id_a long, id_b long"),
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20, 30: 30}

    # drop a redundant triangle edge instead: nothing splits
    dropped2 = [(0, 2)]
    surv2 = [e for e in edges if e not in dropped2]
    got2 = {
        r["node"]: r["component"]
        for r in components_drop_edges(
            labels,
            spark.createDataFrame(surv2, "id_a long, id_b long"),
            spark.createDataFrame(dropped2, "id_a long, id_b long"),
        ).collect()
    }
    assert got2 == {0: 0, 1: 0, 2: 0, 10: 0, 11: 0, 20: 20, 21: 20, 30: 30}


def test_components_drop_edges_isolates_and_passes_through(spark):
    """A member losing ALL its edges becomes a singleton labeled by its
    own id; components untouched by any drop keep their labels row for
    row (the passthrough branch)."""
    from slacken_spark.functions.dedup import components_drop_edges

    edges = [(0, 1), (0, 2), (5, 6)]
    nodes = {0, 1, 2, 5, 6}
    labels = _labels_over(spark, edges, nodes)
    dropped = [(0, 1)]
    surv = [(0, 2), (5, 6)]
    got = {
        r["node"]: r["component"]
        for r in components_drop_edges(
            labels,
            spark.createDataFrame(surv, "id_a long, id_b long"),
            spark.createDataFrame(dropped, "id_a long, id_b long"),
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0, 5: 5, 6: 5}


def test_components_drop_edges_randomized_equals_full_recompute(spark):
    import random

    from slacken_spark.functions.dedup import (
        components_drop_edges,
        connected_components,
    )

    rng = random.Random(177)
    n = 40
    base = sorted(
        {tuple(sorted(rng.sample(range(n), 2))) for _ in range(45)}
    )
    dropped = sorted(rng.sample(base, 12))
    surv = [e for e in base if e not in set(dropped)]
    labels = _labels_over(spark, base, set(range(n)))
    got = {
        r["node"]: r["component"]
        for r in components_drop_edges(
            labels,
            spark.createDataFrame(surv, "id_a long, id_b long"),
            spark.createDataFrame(dropped, "id_a long, id_b long"),
        ).collect()
    }
    want_conn = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(surv, "id_a long, id_b long")
        ).collect()
    }
    want = {i: want_conn.get(i, i) for i in range(n)}
    assert got == want


def test_components_mixed_batch_composes_drop_then_add(spark):
    """A mixed CDC batch (edge drops AND adds) is maintained by
    composing the two one-directional maintainers — drop_edges over the
    surviving base graph, then add_edges for the batch's new pairs —
    and the composed labels must equal a from-scratch recompute over
    (base − dropped) ∪ added, node for node. Randomized so the batch
    exercises splits, merges, re-bridged splits (a dropped bridge whose
    halves an added edge reconnects) and brand-new nodes in one run."""
    import random

    from slacken_spark.functions.dedup import (
        components_add_edges,
        components_drop_edges,
        connected_components,
    )

    rng = random.Random(271)
    n = 40
    base = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(45)})
    dropped = sorted(rng.sample(base, 12))
    surv = [e for e in base if e not in set(dropped)]
    # adds: some among existing nodes (merges / re-bridges), some to
    # brand-new nodes — disjoint from the surviving base edges
    added = sorted(
        {tuple(sorted(rng.sample(range(n), 2))) for _ in range(6)}
        - set(surv)
    ) + [(5, n + 1), (n + 2, n + 3)]

    labels = _labels_over(spark, base, set(range(n)))
    after_drop = components_drop_edges(
        labels,
        spark.createDataFrame(surv, "id_a long, id_b long"),
        spark.createDataFrame(dropped, "id_a long, id_b long"),
    )
    got = {
        r["node"]: r["component"]
        for r in components_add_edges(
            after_drop,
            spark.createDataFrame(added, "id_a long, id_b long"),
        ).collect()
    }
    want_conn = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(surv + added, "id_a long, id_b long")
        ).collect()
    }
    touched = set(range(n)) | {x for p in added for x in p}
    want = {i: want_conn.get(i, i) for i in touched}
    assert got == want


def _cc_map(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_contract_equals_propagation_on_shapes(spark):
    """connected_components_contract shares connected_components'
    output contract exactly — min-node-id labels over every endpoint —
    across the shapes that stress different code paths: a
    high-diameter chain (the case contraction exists for), a clique, a
    bridge of two triangles, multiple components plus a self-pair
    node, and an empty edge set."""
    from slacken_spark.functions.dedup import (
        connected_components,
        connected_components_contract,
    )

    shapes = {
        "chain": [(i, i + 1) for i in range(25)],
        "clique": [(i, j) for i in range(6) for j in range(i + 1, 6)],
        "bridged_triangles": [
            (0, 1), (1, 2), (0, 2), (2, 10), (10, 11), (11, 12), (10, 12),
        ],
        "multi_plus_selfpair": [(0, 1), (5, 6), (6, 7), (9, 9)],
        "empty": [],
    }
    for name, edges in shapes.items():
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = _cc_map(connected_components_contract(df))
        want = _cc_map(connected_components(df))
        assert got == want, name


def test_contract_randomized_and_partition_invariant(spark):
    """Randomized graphs, scattered via ``loop_partitions`` (the knob
    that sizes the contraction's internal shuffles — a caller-side
    ``repartition`` is discarded by the internal ``.distinct()``): the
    result must be invariant to how the edges are partitioned
    (loop_partitions=1 = pure local union-find; 16 partitions of a
    40-node graph = heavy cross-partition reconciliation) and equal to
    min-label propagation's."""
    import random

    from slacken_spark.functions.dedup import (
        connected_components,
        connected_components_contract,
    )

    rng = random.Random(828)
    # AQE partition coalescing would collapse the 16-partition variant
    # back to one partition (the internal .distinct() discards the
    # input partitioning), making both variants run the identical pure
    # local-union-find path — the r8 review's vacuity finding. Disable
    # it so loop_partitions=16 genuinely scatters ~45 edges over 16
    # partitions and the multi-round reconcile/jump/compose path runs.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        for trial in range(3):
            n = 40
            edges = sorted(
                {tuple(sorted(rng.sample(range(n), 2))) for _ in range(n + 5)}
            )
            df = spark.createDataFrame(edges, "id_a long, id_b long")
            want = _cc_map(connected_components(df))
            for parts in (1, 16):
                got = _cc_map(
                    connected_components_contract(df, loop_partitions=parts)
                )
                assert got == want, (trial, parts)
    finally:
        spark.conf.set(coalesce_key, prev)


def test_stats_free_bounds_iterated_size_estimates(spark):
    """_stats_free must reset a checkpoint's size estimate to the
    constant default: Dataset.localCheckpoint preserves child stats,
    and the size-only estimator multiplies sizeInBytes across joins,
    so an iterative checkpoint+self-join loop otherwise doubles the
    estimate's BigInteger bit length per round until the driver pins
    in BigInteger.multiply (the r8 scattered-chain hang). Pins both
    the reset and that the JVM hook (internalCreateDataFrame) still
    exists — the guarded fallback would let the blowup quietly
    return."""
    from pyspark.sql import functions as F

    from slacken_spark.functions.dedup import _stats_free

    def size_bits(df):
        jstats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(jstats.sizeInBytes())).bit_length()

    base = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "k long, v long"
    ).localCheckpoint(eager=False)

    def self_join(df):
        return (
            df.select("k", "v")
            .join(df.select(F.col("k").alias("k2"), "v"), "v")
            .select("k", F.col("k2").alias("v"))
        )

    from slacken_spark.functions.dedup import _unpersist_local_ckpt

    raw, cur = base, _stats_free(base)
    made = [base]
    reset_bits = None
    try:
        for _ in range(6):
            raw = self_join(raw).localCheckpoint(eager=False)
            cur = _stats_free(self_join(cur).localCheckpoint(eager=False))
            made += [raw, cur]
            reset_bits = size_bits(cur)
            assert cur.columns == ["k", "v"]
        # the preserved-stats path really does compound (the trap
        # exists: bit length doubles per checkpointed self-join,
        # 63 -> ~4000)...
        assert size_bits(raw) > 1000, size_bits(raw)
        # ...and the reset keeps the estimate a machine-word size
        assert 1 <= reset_bits <= 72, reset_bits
    finally:
        # deregister the never-materialized checkpoints so the shared
        # session's persistent-RDD map stays clean for the leak test
        for df in made:
            _unpersist_local_ckpt(df)


def test_contract_releases_blocks_on_failure(spark, monkeypatch):
    """An exception mid-loop must not leak checkpoint blocks: every
    lazy checkpoint the contraction registered (edge list, union-find
    aggregate, label tables, relabeled edges) is drained by the
    finally, so the persistent-RDD map returns to its pre-call state
    (the r8 review's happy-path-only cleanup finding)."""
    import pytest as _pytest
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from slacken_spark.functions.dedup import connected_components_contract

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_a long, id_b long"
    )
    calls = {"n": 0}
    orig = CDF.count

    def flaky(self):
        calls["n"] += 1
        if calls["n"] == 2:  # round 1's relabeled-edge count — mid-loop,
            # with base/g0/g/e2 checkpoints all registered
            raise RuntimeError("injected mid-loop failure")
        return orig(self)

    monkeypatch.setattr(CDF, "count", flaky)
    # compare ID SETS, not map sizes: the persistent-RDD map is
    # weak-valued and asynchronously pruned, so unrelated entries from
    # earlier tests can vanish mid-run — only NEW survivors are leaks
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    with _pytest.raises(RuntimeError, match="injected mid-loop"):
        connected_components_contract(chain)
    assert calls["n"] == 2, "the injected failure must hit mid-loop"
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    leaked = after - before
    assert not leaked, f"mid-loop failure leaked persisted RDD ids {leaked}"


def test_drop_edges_high_diameter_chain(spark):
    """The drop path's worst case for round counts: a long surviving
    chain inside one affected component — the shape the contraction
    propagation collapses partition-locally instead of paying
    diameter rounds. Run through BOTH sides of the driver_threshold
    cutoff (r9): the driver fast path and the distributed loop must
    agree on it."""
    from slacken_spark.functions.dedup import components_drop_edges

    chain = [(i, i + 1) for i in range(30)]
    extra = (30, 40)
    edges = chain + [extra]
    nodes = set(range(31)) | {40}
    labels = _labels_over(spark, edges, nodes)
    want = {i: 0 for i in range(31)}
    want[40] = 40
    for thresh in (100_000, 0):
        got = _cc_map(
            components_drop_edges(
                labels,
                spark.createDataFrame(chain, "id_a long, id_b long"),
                spark.createDataFrame([extra], "id_a long, id_b long"),
                driver_threshold=thresh,
            )
        )
        assert got == want, thresh


def test_add_edges_round_budget_is_partition_span_not_diameter(spark):
    """components_add_edges' propagation runs on the union-find
    contraction engine (r9 switch): a NEW-edge chain bridging 2000
    existing singletons — a diameter-2000 CONTRACTED graph, the add
    path's worst case — collapses in ONE round when its edges sit in
    one partition, and within a 4-round budget when genuinely
    scattered over 16 partitions (stall-triggered pointer-doubling
    closure). Min-label propagation would pay diameter-bound rounds.
    Same vacuity guards as the drop-path twin in test_plans.py:
    createDataFrame fixtures (no distinct-key metadata), AQE
    coalescing disabled, and the max_iter=1 warning assertion pins
    that the 16-way scatter really leaves cross-partition work."""
    import warnings

    from pyspark.sql import functions as F

    from slacken_spark.functions import dedup as D
    from slacken_spark.functions.dedup import components_add_edges

    n = 2_000
    labels = spark.createDataFrame(
        [(i, i) for i in range(n)], "node long, component long"
    )
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )

    def run(loop_parts, budget):
        # the observer hook is the round count's source of truth (and
        # this pins its payload shape for the scale probes that use it)
        events = []
        D._round_observer = events.append
        try:
            with warnings.catch_warnings(record=True) as caught:
                warnings.simplefilter("always")
                comp = components_add_edges(
                    labels, chain, max_iter=budget,
                    loop_partitions=loop_parts, driver_threshold=0,
                ).persist()
                rows = comp.count()
        finally:
            D._round_observer = None
        warned = bool([w for w in caught if "no fixpoint" in str(w.message)])
        assert rows == n
        assert len(events) <= budget
        assert all(
            {"round", "remaining", "stalled", "label_passes"} <= set(ev)
            for ev in events
        )
        off = comp.where(F.col("component") != 0).count()
        comp.unpersist()
        return warned, off

    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        warned, off = run(16, 1)
        assert warned and off > 0, (
            "16-way scatter converged in one round — the scatter is"
            " not reaching the loop (vacuous test)"
        )
        warned, off = run(16, 4)
        assert not warned and off == 0, (
            "scattered add-path chain blew the 4-round budget"
        )
    finally:
        spark.conf.set(coalesce_key, prev)
    warned, off = run(1, 1)
    assert not warned and off == 0, (
        "single-partition contracted chain should collapse in one round"
    )


def test_add_edges_driver_path_equals_distributed(spark):
    """components_add_edges' small-graph driver fast path (one collect
    + the shared local union-find) and the distributed contraction
    path must produce identical labelings on the same randomized
    graph + batch — the two sides of the driver_threshold cutoff are
    interchangeable by contract."""
    import random

    from slacken_spark.functions.dedup import components_add_edges

    rng = random.Random(991)
    n = 50
    base = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(35)})
    new = sorted(
        {tuple(sorted(rng.sample(range(n + 12), 2))) for _ in range(18)}
        - set(base)
    )
    labels = _labels_over(spark, base, set(range(n)))
    new_df = spark.createDataFrame(new, "id_a long, id_b long")
    via_driver = {
        r["node"]: r["component"]
        for r in components_add_edges(labels, new_df).collect()
    }
    via_loop = {
        r["node"]: r["component"]
        for r in components_add_edges(
            labels, new_df, driver_threshold=0
        ).collect()
    }
    assert via_driver == via_loop
    # the driver path really engaged (sanity: batch far below cutoff)
    assert len(new) < 100_000


def test_uf_min_labels_matches_reachability_model():
    """Property test for the shared local union-find step (no Spark):
    on random graphs, _uf_min_labels must label every endpoint with
    the minimum node id reachable from it — checked against a plain
    BFS closure model, including parallel edges, self-loops, chains
    and singleton pairs."""
    import random

    from slacken_spark.functions.dedup import _uf_min_labels

    def model(edges):
        adj: dict = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        out = {}
        seen: set = set()
        for start in adj:
            if start in seen:
                continue
            comp, stack = [], [start]
            seen.add(start)
            while stack:
                v = stack.pop()
                comp.append(v)
                for w in adj[v]:
                    if w not in seen:
                        seen.add(w)
                        stack.append(w)
            m = min(comp)
            for v in comp:
                out[v] = m
        return out

    rng = random.Random(1234)
    for trial in range(50):
        n = rng.randint(1, 60)
        n_edges = rng.randint(0, 90)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        # parallel edges + a guaranteed self-loop exercise the skips
        if edges:
            edges.append(edges[0])
        edges.append((0, 0))
        assert _uf_min_labels(edges) == model(edges), (trial, edges)


def test_add_edges_driver_path_plan_shape(spark):
    """The driver fast path's plan contract: the component mapping
    enters as a broadcast-sized local table — NO Arrow mapInPandas
    stage (the distributed loop never ran) and the mapping joins
    convert to broadcast under AQE; forcing the loop path brings the
    consolidated ExistingRDD back."""
    from slacken_spark.functions.dedup import components_add_edges

    labels = spark.createDataFrame(
        [(i, i) for i in range(20)], "node long, component long"
    )
    new = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")

    out = components_add_edges(labels, new)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, "distributed UF ran on the driver path"
    assert plan.count("BroadcastHashJoin") >= 1, (
        "batch-sized mapping did not broadcast under AQE"
    )

    loop = components_add_edges(labels, new, driver_threshold=0)
    loop.collect()
    lplan = loop._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in lplan, (
        "loop path should read the contraction's consolidated checkpoint"
    )


def test_maintainers_empty_batch_is_identity(spark):
    """An EMPTY CDC batch must leave the labeling untouched through
    both maintainers — including the r9 driver fast path, whose
    mapping table is then a zero-row createDataFrame (foreachBatch
    empty-batch semantics, the streaming-maintainer contract)."""
    from slacken_spark.functions.dedup import (
        components_add_edges,
        components_drop_edges,
    )

    edges = [(1, 2), (2, 3), (10, 11)]
    nodes = {1, 2, 3, 10, 11, 20}
    labels = _labels_over(spark, edges, nodes)
    want = _cc_map(labels)
    empty = spark.createDataFrame([], "id_a long, id_b long")
    got_add = _cc_map(components_add_edges(labels, empty))
    assert got_add == want
    surv = spark.createDataFrame(edges, "id_a long, id_b long")
    got_drop = _cc_map(components_drop_edges(labels, surv, empty))
    assert got_drop == want


def test_batch_mapping_threshold_boundary(spark):
    """The cutoff's boundary contract: a batch of EXACTLY
    driver_threshold edges stays on the driver path (no contraction
    rounds observed), one more edge routes to the distributed engine
    (rounds observed) — and both produce the same labeling."""
    from slacken_spark.functions import dedup as D
    from slacken_spark.functions.dedup import components_add_edges

    labels = spark.createDataFrame(
        [(i, i) for i in range(10)], "node long, component long"
    )
    chain3 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    chain4 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )

    def run(new, thresh):
        events = []
        D._round_observer = events.append
        try:
            got = _cc_map(
                components_add_edges(labels, new, driver_threshold=thresh)
            )
        finally:
            D._round_observer = None
        return got, len(events)

    got, rounds = run(chain3, 3)   # == threshold: driver path
    assert rounds == 0
    assert {n: got[n] for n in range(4)} == {0: 0, 1: 0, 2: 0, 3: 0}
    got, rounds = run(chain4, 3)   # threshold + 1: distributed engine
    assert rounds >= 1
    assert {n: got[n] for n in range(5)} == {i: 0 for i in range(5)}


def test_maintainers_generic_over_string_ids(spark):
    """The engine parameterizes its schemas by the input id type
    (``id_t``) — pin that both maintainers and both cutoff paths
    actually work on string ids (document digests are a realistic
    key), not just the longs every catalog fixture uses."""
    from slacken_spark.functions.dedup import (
        components_add_edges,
        components_drop_edges,
    )

    labels = spark.createDataFrame(
        [(x, x) for x in ["a", "b", "c", "x", "y"]],
        "node string, component string",
    )
    new = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    for thresh in (100_000, 0):
        got = _cc_map(
            components_add_edges(labels, new, driver_threshold=thresh)
        )
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "y"}, thresh
    surv = spark.createDataFrame([("x", "y")], "id_a string, id_b string")
    dropped = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    labels2 = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")],
        "node string, component string",
    )
    for thresh in (100_000, 0):
        got = _cc_map(
            components_drop_edges(
                labels2, surv, dropped, driver_threshold=thresh
            )
        )
        assert got == {"a": "a", "b": "b", "c": "c", "x": "x", "y": "x"}, thresh


def test_contract_broadcast_window_result_identical(spark):
    """The r14 known-size label-broadcast hints must not change labels:
    run the contraction engine with the hints forced ON (min_edges=0)
    and forced OFF (broadcast_label_rows=0) over a multi-chain graph
    and compare the full labelings."""
    from slacken_spark.functions.dedup import connected_components_contract

    edges = spark.createDataFrame(
        [(i, i + 5) for i in range(0, 200)]  # 5 interleaved chains
        + [(1000, 2000), (2000, 3000)],
        "id_a long, id_b long",
    )

    def labels(**kw):
        return {
            r["node"]: r["component"]
            for r in connected_components_contract(edges, **kw).collect()
        }

    on = labels(broadcast_label_min_edges=0, broadcast_label_rows=10_000_000)
    off = labels(broadcast_label_rows=0)
    assert on == off
    # 5 chains over range(0,205) -> component = min of residue class
    assert on[204] == 4 and on[3000] == 1000


def test_pin_unless_materialized_skips_materialized_scans(spark):
    """r13 ADVICE: re-pinning an already-materialized scan pays a
    redundant block copy — the helper must return such frames
    unchanged (persisted InMemoryRelation, prior checkpoint, and one
    projection over either) and still pin computed plans."""
    from slacken_spark.functions.dedup import _pin_unless_materialized

    base = spark.range(10).selectExpr("id AS a", "id + 1 AS b")
    cached = base.persist()
    cached.count()
    try:
        assert _pin_unless_materialized(cached) is cached
        proj = cached.select("a", "b")
        assert _pin_unless_materialized(proj) is proj
        ckpt = base.localCheckpoint(eager=True)
        assert _pin_unless_materialized(ckpt) is ckpt
        computed = base.where("a > 2")
        pinned = _pin_unless_materialized(computed)
        assert pinned is not computed
        root = pinned._jdf.queryExecution().analyzed()
        assert root.getClass().getSimpleName() == "LogicalRDD"
    finally:
        cached.unpersist()
