"""Distributed k-means (IVF centroid training) invariants: determinism,
full coverage, and monotone-ish objective improvement over Lloyd rounds."""

import pytest
from pyspark.sql import functions as F

from slacken_spark.functions import similarity as SIM
from slacken_spark.plans.catalog import t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return t(spark, SF, "embeddings").persist()


def _objective(df, cents):
    """Mean cosine similarity to the assigned centroid (higher=better)."""
    a = SIM.ivf_assign(df, "embedding", cents)
    sims = F.array(
        *[
            SIM.dot(F.col("embedding"), F.array(*[F.lit(float(x)) for x in c]))
            / (SIM.l2_norm(F.col("embedding")) * F.lit(sum(x * x for x in c) ** 0.5))
            for c in cents
        ]
    )
    return (
        a.select(F.element_at(sims, F.col("centroid_id") + 1).alias("s"))
        .agg(F.avg("s"))
        .first()[0]
    )


def test_kmeans_deterministic_and_covering(emb):
    c1 = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=2)
    c2 = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=2)
    assert c1 == c2, "training must be bit-deterministic"
    assert len(c1) == 4 and all(len(c) == 64 for c in c1)
    assigned = SIM.ivf_assign(emb, "embedding", c1)
    n = emb.count()
    assert assigned.where(F.col("centroid_id").between(0, 3)).count() == n


def test_kmeans_improves_objective(emb):
    init = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=0)
    trained = SIM.kmeans_train(emb, "embedding", "vec_id", k=4, iters=3)
    assert _objective(emb, trained) >= _objective(emb, init) - 1e-9


def test_kmeans_converges_to_fixpoint(spark):
    """Well-separated clusters: once movement < tol the early stop fires,
    so a large iteration budget returns the same centroids as a small
    sufficient one."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for cid, base in enumerate([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)]):
        for i in range(30):
            v = np.array(base) + rng.normal(0, 0.01, 3)
            rows.append((cid * 100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = SIM.kmeans_train(df, "embedding", "vec_id", k=3, iters=8, tol=1e-6)
    b = SIM.kmeans_train(df, "embedding", "vec_id", k=3, iters=50, tol=1e-6)
    assert a == b, "extra iterations past convergence must be no-ops"


def test_kmeans_reseeds_empty_cluster(spark):
    """The three md5-smallest init vectors are IDENTICAL, so after the
    first assignment clusters 1 and 2 are empty (first-occurrence argmax
    gives everything to cluster 0). With reseed they must re-anchor
    EXACTLY on the two worst-served points (ascending (sim-to-own-
    centroid, id)); without reseed they stay on the stale init vector.
    Over more rounds the reseeded run must reach the far group."""
    import hashlib

    import numpy as np

    ids = list(range(40))
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    init_ids = set(order[:3])
    init_vec = [1.0, 0.05, 0.0]
    rng = np.random.default_rng(5)
    rows = []
    for i in ids:
        if i in init_ids:
            v = list(init_vec)
        elif i % 2 == 0:
            v = (np.array([1.0, 0.0, 0.0]) + rng.normal(0, 0.02, 3)).tolist()
        else:
            v = (np.array([0.0, 1.0, 0.0]) + rng.normal(0, 0.02, 3)).tolist()
        rows.append((i, [float(np.float32(x)) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    c = np.array(init_vec)
    sims = {
        i: float(np.dot(np.array(v, dtype=np.float64), c)
                 / (np.linalg.norm(np.array(v, dtype=np.float64)) * np.linalg.norm(c)))
        for i, v in rows
    }
    worst = sorted(ids, key=lambda i: (sims[i], i))[:2]

    one_noreseed = SIM.kmeans_train(
        df, "embedding", "vec_id", k=3, iters=1, reseed_empty=False
    )
    assert one_noreseed[1] == pytest.approx(init_vec)
    assert one_noreseed[2] == pytest.approx(init_vec)

    one = SIM.kmeans_train(
        df, "embedding", "vec_id", k=3, iters=1, reseed_empty=True
    )
    vecs = dict(rows)
    assert one[1] == pytest.approx(vecs[worst[0]], rel=1e-6)
    assert one[2] == pytest.approx(vecs[worst[1]], rel=1e-6)

    trained = SIM.kmeans_train(
        df, "embedding", "vec_id", k=3, iters=6, reseed_empty=True
    )
    near_y = max(cn[1] / (sum(x * x for x in cn) ** 0.5) for cn in trained)
    assert near_y > 0.9


def test_ivf_nprobe2_recall_not_worse(spark):
    """Boundary-straddling fixture: the query's true nearest neighbor is
    assigned to the OTHER centroid, so nprobe=1 misses it and nprobe=2
    finds it — recall(nprobe=2) ≥ recall(nprobe=1), strictly better here."""
    cents = [[1.0, 0.0], [0.0, 1.0]]
    queries = spark.createDataFrame(
        [(0, [0.72, 0.69])], "q_id long, q_vec array<float>"
    )
    corpus = spark.createDataFrame(
        [
            (10, [0.69, 0.72]),   # true NN — lands in centroid 1
            (11, [1.0, 0.05]),    # centroid 0
            (12, [0.95, 0.2]),    # centroid 0
            (13, [0.05, 1.0]),    # centroid 1
        ],
        "c_id long, c_vec array<float>",
    )
    exact = {
        r["c_id"]
        for r in SIM.cosine_topk(queries, corpus, k=2).collect()
    }
    got1 = {
        r["c_id"]
        for r in SIM.ivf_topk(queries, corpus, cents, k=2, nprobe=1).collect()
    }
    got2 = {
        r["c_id"]
        for r in SIM.ivf_topk(queries, corpus, cents, k=2, nprobe=2).collect()
    }
    r1 = len(got1 & exact) / len(exact)
    r2 = len(got2 & exact) / len(exact)
    assert r2 >= r1
    assert 10 not in got1 and 10 in got2
    assert r2 == 1.0


def _kmq_reference(rows, k, iters, scale, dim):
    """Pure-Python replay of kmeans_quantized: quantize (half away from
    zero), integer-sum centroids, Euclidean score (2c·dot − ‖s‖²)/(2c²)
    (one float div), argmax with smallest-index tie-break, empty
    clusters carry state."""
    import math

    def q(v):
        return [
            int(math.floor(abs(float(x)) * scale + 0.5)) * (1 if x >= 0 else -1)
            for x in v
        ]

    qrows = sorted((i, q(v)) for i, v in rows)
    state = [(list(qv), 1) for _i, qv in qrows[:k]]

    def assign(qv):
        # nearest-in-Euclidean via the integer-exact form:
        # argmin ‖q − s/c‖² = argmax (2c·dot − ‖s‖²) / (2c²)
        scores = [
            (2 * cnt * sum(a * b for a, b in zip(qv, s))
             - sum(x * x for x in s))
            / (2 * cnt * cnt)
            for s, cnt in state
        ]
        best = max(range(k), key=lambda j: (scores[j], -j))
        return best

    for r in range(iters):
        cids = {i: assign(qv) for i, qv in qrows}
        if r == iters - 1:
            return cids
        new = list(state)
        for c in range(k):
            members = [qv for i, qv in qrows if cids[i] == c]
            if members:
                new[c] = (
                    [sum(m[d] for m in members) for d in range(dim)],
                    len(members),
                )
        state = new
    return cids


def test_kmeans_quantized_matches_pure_python(spark):
    """The integer-exact trainer must replay exactly in pure Python —
    same quantization, same integer-sum centroids, same tie-break —
    on a fixture with negatives, exact .5 quantization points, and a
    duplicate vector (guaranteed score tie)."""
    dim, k = 4, 3
    rows = [
        (0, [0.5 / 4, -0.5 / 4, 0.1, 0.2]),   # ±0.5 rounding points at scale 4
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.9, 0.1, 0.0, 0.0]),
        (4, [0.9, 0.1, 0.0, 0.0]),            # duplicate of 3 → tie everywhere
        (5, [-0.8, -0.7, 0.2, 0.1]),
        (6, [0.05, 0.9, -0.1, 0.0]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    for iters in (1, 2, 3):
        assigned, state = SIM.kmeans_quantized(
            df, "embedding", "vec_id", k=k, iters=iters, scale=4, dim=dim
        )
        got = {
            r["vec_id"]: r["cluster_id"] for r in assigned.collect()
        }
        assert got == _kmq_reference(rows, k, iters, 4, dim), f"iters={iters}"
    # duplicate vectors always co-cluster (identical scores, same argmax)
    assert got[3] == got[4]


def test_kmeans_quantized_empty_cluster_carries_state(spark):
    """A centroid that wins no members keeps its (sum, count) state:
    seed 2 (an outlier among the k smallest ids) loses every point to
    nearer centroids in round 1, and in round 2 must still score with
    its ORIGINAL seed vector — pure-Python replay asserts the carry."""
    dim, k = 2, 2
    # ids 0,1 seed the two clusters; every later point sits near seed 0,
    # so cluster 1 (seeded by id 1 far away) empties after round 1 only
    # if seed 1 is strictly worse for every point — craft exactly that
    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, -1.0]),
        (2, [0.9, 0.1]),
        (3, [0.95, 0.05]),
        (4, [0.8, 0.2]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    assigned, state = SIM.kmeans_quantized(
        df, "embedding", "vec_id", k=k, iters=3, scale=4, dim=dim
    )
    ref = _kmq_reference(rows, k, 3, 4, dim)
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    assert got == ref
    # cluster 1 emptied: its carried state is still the seed of id 1
    assert state[1] == ([-4, -4], 1)


def test_kmeans_quantized_needs_k_rows(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        SIM.kmeans_quantized(df, "embedding", "vec_id", k=4, iters=1, dim=2)


def test_kmeans_quantized_is_euclidean_not_raw_dot(spark):
    """A point sitting EXACTLY on centroid 0's mean must be assigned to
    it. Raw dot(q, mean) argmax — monotone in centroid norm — would
    hand it to the farther, larger-norm centroid 1 ([5,0] scores 5 vs
    1); the Euclidean form (2c·dot − ‖s‖²)/(2c²) keeps it home."""
    rows = [
        (0, [0.25, 0.0]),   # seed 0 → q=[1,0] at scale 4
        (1, [1.25, 0.0]),   # seed 1 → q=[5,0]
        (2, [0.25, 0.0]),   # exactly on centroid 0
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    assigned, _ = SIM.kmeans_quantized(
        df, "embedding", "vec_id", k=2, iters=1, scale=4, dim=2
    )
    got = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    assert got[2] == 0, f"raw-dot bias: point on centroid 0 went to {got[2]}"


def test_lsh_delta_matches_reference_and_tombstones(spark):
    """LSH-bucket index maintenance: results must equal a pure-Python
    full-rebuild restricted to affected buckets, a bucket emptied by
    its sole member moving away must emit an n=0 tombstone, and
    UNTOUCHED buckets must not appear in the output at all."""
    planes = [[1.0, 0.0], [0.0, 1.0]]  # buckets = quadrant sign bits

    def bucket(v):
        b = 0
        for i, p in enumerate(planes):
            if sum(a * x for a, x in zip(v, p)) >= 0:
                b += 1 << i
        return b

    base_rows = [
        (0, [1.0, 1.0]),    # bucket 3 — sole member, moves away
        (1, [-1.0, 1.0]),   # bucket 2
        (2, [-1.0, 1.5]),   # bucket 2
        (3, [-1.0, -1.0]),  # bucket 0 — untouched, must NOT appear
        (4, [-2.0, -1.0]),  # bucket 0
    ]
    upd_rows = [(0, [1.0, -1.0])]  # moves bucket 3 → 1
    base = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in base_rows],
        "vec_id long, embedding array<float>",
    )
    upd = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in upd_rows],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["bucket"]: (r["n_vecs"], list(r["members"]))
        for r in SIM.lsh_delta(base, upd, planes).collect()
    }
    # affected: old bucket 3, new bucket 1
    assert got == {3: (0, []), 1: (1, [0])}
    assert 0 not in got and 2 not in got, "untouched buckets must not emit"


def test_lsh_delta_deletes_remove_vectors(spark):
    """lsh_delta(deletes=…): a PURE delete emptying a sole-member
    bucket emits the n=0 tombstone (no replacement arrives to mask the
    path), a shared-bucket delete rebuilds the list without the id, an
    id in BOTH upd and deletes is a replacement (the new vector wins),
    and untouched buckets still never emit."""
    planes = [[1.0, 0.0], [0.0, 1.0]]
    base = spark.createDataFrame(
        [
            (0, [1.0, 1.0]),    # bucket 3 — sole member, PURE delete
            (1, [-1.0, 1.0]),   # bucket 2 — deleted, bucket keeps 2
            (2, [-1.0, 1.5]),   # bucket 2
            (3, [-1.0, -1.0]),  # bucket 0 — untouched, must NOT appear
            (4, [1.0, -1.0]),   # bucket 1 — in upd AND deletes: replaced
        ],
        "vec_id long, embedding array<float>",
    )
    upd = spark.createDataFrame(
        [(4, [-2.0, 1.0])],  # moves bucket 1 → 2
        "vec_id long, embedding array<float>",
    )
    deletes = spark.createDataFrame([(0,), (1,), (4,)], "vec_id long")
    got = {
        r["bucket"]: (r["n_vecs"], list(r["members"]))
        for r in SIM.lsh_delta(base, upd, planes, deletes=deletes).collect()
    }
    # affected: 3 (0's old — emptied by the delete alone), 2 (1's old +
    # 4's new), 1 (4's old — emptied by the move)
    assert got == {3: (0, []), 2: (2, [2, 4]), 1: (0, [])}
    assert 0 not in got, "untouched bucket must not emit"
