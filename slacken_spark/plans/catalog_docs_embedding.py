"""Query catalog, part 2c: EMBEDDING / similarity-search operators
over the ``embeddings`` table — brute-force and IVF cosine top-k, LSH
buckets, near-dup pairs, SemDedup, random projection, quantized
k-means training, int8 quantization, retrieval hydration. Split from
``catalog_docs`` (round 7); registers into the same QUERIES registry
and shares its portability constants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.functions import dedup as D
from slacken_spark.functions import similarity as SIM
from slacken_spark.plans.catalog import register, register_demoted, t, tp


@register(
    "embedding_random_projection",
    f"""
    SELECT vec_id,
           {SIM.rp_sql('embedding', 64, 16)}
    FROM embeddings
    """,
)
def embedding_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss 64→16 reduction with md5-derived ±1 signs
    folded into the plan as literals: ONE codegen'd map-only projection
    (no shuffle, no UDF, no interpreted array lambda), elements promoted
    to double before left-to-right accumulation so Spark and the oracle
    produce identical IEEE doubles. The cheap front half of any
    ANN/clustering pipeline at 100 TB — a pure scan→project stage."""
    return SIM.random_projection(
        t(spark, sf_dir, "embeddings"), "embedding", "vec_id", in_dim=64, out_dim=16
    )

# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "embedding_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
    sims AS (
        SELECT q.q_id, c.vec_id AS c_id,
               round(
                 list_sum(list_transform(range(1, len(q.q_vec)+1),
                   i -> CAST(q.q_vec[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 4) AS sim
        FROM q CROSS JOIN embeddings c
        WHERE q.q_id != c.vec_id
    ),
    r AS (SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
          FROM sims)
    SELECT q_id, c_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def embedding_cosine_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = SIM.cosine_topk(queries, corpus, k=3, round_digits=4)
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def _centroids(n: int = 4, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish centroids (integer-derived
    literals embedded identically in the oracle SQL)."""
    out = []
    for i in range(n):
        row = []
        for j in range(dim):
            v = ((i * dim + j) * 1103515245 + 12345) % 2000
            row.append((v - 1000) / 1000.0)
        out.append(row)
    return out


def _cos_sql(vec_expr: str, lits: list[float]) -> str:
    arr = ", ".join(repr(x) for x in lits)
    nrm = sum(x * x for x in lits) ** 0.5
    return (
        f"(list_sum(list_transform(range(1, 65), i ->"
        f" CAST({vec_expr}[CAST(i AS INT)] AS DOUBLE) * (ARRAY[{arr}])[CAST(i AS INT)]))"
        f" / (sqrt(list_sum(list_transform({vec_expr}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform(ARRAY[{arr}], x -> x*x)))))"
    )


def _ivf_assign_sql(vec_expr: str) -> str:
    """Sequential strict-> argmax over the centroid literals, matching
    similarity.ivf_assign's fold order exactly."""
    cents = _centroids()
    sims = [_cos_sql(vec_expr, c) for c in cents]
    return (
        f"CASE WHEN {sims[3]} > greatest({sims[0]}, {sims[1]}, {sims[2]}) THEN 3"
        f" WHEN {sims[2]} > greatest({sims[0]}, {sims[1]}) THEN 2"
        f" WHEN {sims[1]} > {sims[0]} THEN 1 ELSE 0 END"
    )


@register_demoted(
    "embedding_ivf_topk",
    f"""
    WITH assigned AS (
        SELECT vec_id, embedding, {_ivf_assign_sql("embedding")} AS centroid_id
        FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, centroid_id FROM assigned WHERE vec_id < 10),
    sims AS (
        SELECT q.q_id, c.vec_id AS c_id,
               round(
                 list_sum(list_transform(range(1, len(q.q_vec)+1),
                   i -> CAST(q.q_vec[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 4) AS sim
        FROM q JOIN assigned c ON q.centroid_id = c.centroid_id
        WHERE q.q_id != c.vec_id
    ),
    r AS (SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
          FROM sims)
    SELECT q_id, c_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def embedding_ivf_topk(spark, sf_dir):
    """IVF (nprobe=1) approximate top-k: centroid equi-join instead of a
    cross join — the billion-vector scale path. The oracle reproduces the
    coarse quantization and candidate ranking exactly.

    DEMOTED r13 (capacity-ceiling consolidation, VERDICT r12 item 2):
    ``embedding_ivf_topk_nprobe2`` runs the SAME ``SIM.ivf_topk`` engine
    with a strictly wider probe set, and ``ann_retrieve_docs`` exercises
    this exact nprobe=1 call end-to-end inside its retrieval join — both
    stay driver-gated, so the family keeps two driver rows. This entry
    remains pytest-grade: test_oracle_parity runs it through the same
    exact DuckDB compare every session."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = SIM.ivf_topk(queries, corpus, _centroids(), k=3, round_digits=4)
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def _ivf_probe_union_sql() -> str:
    """Per-(query, centroid) similarity rows — the oracle's probe-ranking
    input (one SELECT per centroid literal, same fold as _cos_sql)."""
    cents = _centroids()
    return " UNION ALL ".join(
        f"SELECT q_id, q_vec, CAST({i} AS INT) AS cid,"
        f" {_cos_sql('q_vec', c)} AS sim FROM q"
        for i, c in enumerate(cents)
    )


@register(
    "embedding_ivf_topk_nprobe2",
    f"""
    WITH assigned AS (
        SELECT vec_id, embedding, {_ivf_assign_sql("embedding")} AS centroid_id
        FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
    qs AS ({_ivf_probe_union_sql()}),
    qp AS (
        SELECT q_id, cid FROM (
            SELECT q_id, cid,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY sim DESC, cid) AS rn
            FROM qs) t
        WHERE rn <= 2
    ),
    sims AS (
        SELECT q.q_id, c.vec_id AS c_id,
               round(
                 list_sum(list_transform(range(1, len(q.q_vec)+1),
                   i -> CAST(q.q_vec[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 4) AS sim
        FROM q JOIN qp ON q.q_id = qp.q_id
               JOIN assigned c ON qp.cid = c.centroid_id
        WHERE q.q_id != c.vec_id
    ),
    r AS (SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
          FROM sims)
    SELECT q_id, c_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def embedding_ivf_topk_nprobe2(spark, sf_dir):
    """IVF top-k with nprobe=2: the query side probes its two nearest
    centroids (recall control for boundary-straddling queries); the
    corpus keeps one inverted list per vector, so candidates stay an
    equi-join and need no dedup. The oracle ranks the probe centroids
    per query with the same (sim DESC, cid) tiebreak."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = SIM.ivf_topk(
        queries, corpus, _centroids(), k=3, round_digits=4, nprobe=2
    )
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def _planes(n_planes: int = 6, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from integer arithmetic
    (identical literals are embedded in the oracle SQL — no libm calls)."""
    out = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            v = ((i * dim + j) * 2654435761 + 104729) % 2000
            row.append((v - 1000) / 1000.0)
        out.append(row)
    return out


def _lsh_bucket_sql_expr(vec_expr: str) -> str:
    """The hyperplane sign-bit bucket id of ``vec_expr``, as DuckDB SQL
    with the plane literals inlined (mirrors
    similarity.lsh_hyperplane_buckets bit for bit)."""
    terms = []
    for i, p in enumerate(_planes()):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(({vec_expr})[CAST(i AS INT)] AS DOUBLE) * (ARRAY[{lits}])[CAST(i AS INT)])) >= 0 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {i})"
        )
    return " + ".join(terms)


def _lsh_sql() -> str:
    return f"""
    SELECT {_lsh_bucket_sql_expr('embedding')} AS bucket, count(*) AS n_vecs
    FROM embeddings
    GROUP BY 1
    """


@register("embedding_lsh_buckets", _lsh_sql())
def embedding_lsh_buckets(spark, sf_dir):
    emb = tp(spark, sf_dir, "embeddings")
    bucketed = SIM.lsh_hyperplane_buckets(emb, "embedding", _planes())
    return bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))


def _lsh_delta_sql() -> str:
    b = _lsh_bucket_sql_expr("embedding")
    bu = _lsh_bucket_sql_expr("list_reverse(embedding)")
    return f"""
    WITH b AS MATERIALIZED (
        SELECT vec_id, {b} AS bucket FROM embeddings),
    u AS MATERIALIZED (
        SELECT vec_id, {bu} AS bucket FROM embeddings WHERE vec_id % 50 = 0),
    aff AS MATERIALIZED (
        SELECT DISTINCT bucket FROM (
            SELECT bucket FROM b WHERE vec_id % 50 = 0 OR vec_id % 70 = 0
            UNION ALL SELECT bucket FROM u)),
    m AS MATERIALIZED (
        SELECT vec_id, bucket FROM b
        WHERE vec_id % 50 <> 0 AND vec_id % 70 <> 0
        UNION ALL SELECT vec_id, bucket FROM u),
    rebuilt AS MATERIALIZED (
        SELECT m.bucket, count(*) AS n_vecs,
               md5(string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id))
                 AS members_digest
        FROM m JOIN aff USING (bucket) GROUP BY m.bucket)
    SELECT a.bucket, CAST(coalesce(r.n_vecs, 0) AS BIGINT) AS n_vecs,
           coalesce(r.members_digest, md5('')) AS members_digest
    FROM aff a LEFT JOIN rebuilt r USING (bucket)
    """


@register("embedding_lsh_delta", _lsh_delta_sql())
def embedding_lsh_delta(spark, sf_dir):
    """Incremental maintenance of the LSH-bucket ANN index — the vector
    twin of ``inverted_index_delta``. A CDC batch replaces every 50th
    vector (deterministically: the reversed embedding) and DELETES
    every 70th outright (r9: the ``deletes`` path gates with the rest
    of the entry — a delete is a replacement with nothing, so it only
    widens the changed-id set; ids 0 and 350 sit in BOTH sets, so the
    replacement-wins precedence executes on gate data, plus 6
    pure-delete ids). Only the AFFECTED buckets' member lists rebuild:
    affected = old bucket ∪ new bucket of each changed vector
    (≤ 2·|batch| of the 2^6 = 64 buckets), broadcast as a semi-join
    filter ahead of the per-bucket shuffle, with an explicit
    n=0 / md5('') tombstone when a bucket empties. Bucket ids are
    map-only sign-bit hashes, so unlike the token case the corpus scan
    is one cheap projection — the delta bound applies to the SHUFFLE
    (collect_list reduces only affected buckets' rows), which is what
    hurts at 100 TB. One left outer join emits rebuilt lists and
    tombstones without re-evaluating the aggregation (the delta_index
    lesson; functions.similarity.lsh_delta)."""
    from slacken_spark.functions.inverted import postings_digest

    emb = tp(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    upd = emb.where(F.col("vec_id") % 50 == 0).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    deletes = emb.where(F.col("vec_id") % 70 == 0).select("vec_id")
    out = SIM.lsh_delta(emb, upd, _planes(), deletes=deletes)
    return out.select(
        "bucket",
        "n_vecs",
        postings_digest(F.col("members")).alias("members_digest"),
    )


def _bucket_sql() -> str:
    planes = _planes()
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * (ARRAY[{lits}])[CAST(i AS INT)])) >= 0 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {i})"
        )
    return " + ".join(terms)


_NEARDUP_PAIR_SQL = f"""
    WITH b AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round(
             list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) AS sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round(
             list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) >= 0.2
    """


@register("embedding_neardup_pairs", _NEARDUP_PAIR_SQL)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate candidates: LSH-bucket equi-join
    (one shuffle, no all-pairs) + exact cosine threshold (0.2) — the
    embedding twin of MinHash dedup. ``embedding_semdedup_keep`` builds
    its component graph over these same pairs.

    Scale note (measured, 10x decorrelated corpus probe): with the
    plane count FIXED the within-bucket join is quadratic — candidate
    pairs grew ~100x on 10x vectors. The fixture pins 6 planes so the
    oracle SQL stays literal; at corpus scale the plane count is the
    sizing knob (lsh_hyperplane_buckets takes the planes as input:
    ~log2(n / target_bucket_size) planes keeps bucket occupancy — and
    the join's per-bucket cost — constant as n grows)."""
    return _emb_neardup_pairs(spark, sf_dir)


def _emb_neardup_pairs(spark, sf_dir):
    emb = tp(spark, sf_dir, "embeddings")
    b = SIM.lsh_hyperplane_buckets(emb, "embedding", _planes()).select(
        "vec_id",
        "embedding",
        "bucket",
        SIM.l2_norm(F.col("embedding")).alias("norm"),
    )
    a, c = b.alias("a"), b.alias("c")
    # per-row norms materialized before the join: the interpreted norm
    # aggregate runs once per vector, not once per candidate pair
    sim = F.round(
        SIM.dot(F.col("a.embedding"), F.col("c.embedding"))
        / (F.col("a.norm") * F.col("c.norm")),
        4,
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= 0.2)
    )


# SemDedup-style keep-one-per-embedding-cluster: components over the
# near-dup pair graph, memoized per (application, sf_dir) like the text
# component labels (tiny label table, persisted).
_EMB_COMPONENTS_CACHE: dict = {}


def _emb_components(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get

    def build():
        pairs = _emb_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
        return D.connected_components_contract(
            pairs, loop_partitions=8
        ).persist()

    return app_scoped_get(_EMB_COMPONENTS_CACHE, spark, sf_dir, build)


_SEMDEDUP_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({_NEARDUP_PAIR_SQL}),
edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                       UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
    SELECT vec_id AS node, vec_id AS lbl FROM embeddings
    UNION
    SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT CAST(component AS BIGINT) AS vec_id,
       CAST(count(*) AS BIGINT) AS cluster_size
FROM comp GROUP BY component
"""


@register("embedding_semdedup_keep", _SEMDEDUP_SQL)
def embedding_semdedup_keep(spark, sf_dir):
    """SemDedup-shaped embedding dedup: weakly-connected components
    over the cosine near-dup pair graph (LSH-bucketed, never
    all-pairs), keep ONE vector per cluster (the min vec_id — the
    component label) with its cluster size — the embedding twin of
    ``dedup_keep_canonical``. Composes the bucket equi-join with the
    union-find contraction loop
    (functions.dedup.connected_components_contract);
    singletons keep themselves. The oracle replays the closure as a
    recursive CTE over the SAME pair SQL (pairs/edges MATERIALIZED —
    the recursive member re-evaluates inlined CTEs per iteration:
    measured 62.6 s vs 5.0 s at sf0.01), tractable at oracle scale
    only."""
    emb = tp(spark, sf_dir, "embeddings").select("vec_id")
    comp = _emb_components(spark, sf_dir)
    labeled = emb.join(
        comp, emb["vec_id"] == comp["node"], "left"
    ).select(
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component")
    )
    return (
        labeled.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("component").alias("vec_id"), "cluster_size")
    )


# ---------------------------------------------------------------------------
# k-means training (distributed Lloyd's) — the INTEGER-EXACT quantized
# formulation, so even the iterative trainer sits under the hash gate.
# The float IVF trainer (similarity.kmeans_train: convergence, empty-
# cluster reseed) remains the production centroid path, pytest-pinned
# in tests/test_kmeans.py.
# ---------------------------------------------------------------------------


_KMEANSQ_K, _KMEANSQ_ITERS, _KMEANSQ_DIM = 4, 3, 64


def _kmeans_quantized_sql(k: int, iters: int, dim: int) -> str:
    """DuckDB replay of similarity.kmeans_quantized: the fixed Lloyd's
    rounds unroll as MATERIALIZED CTEs (default CTE inlining
    re-evaluates the whole prefix per reference — exponential in
    rounds, the BPE-unroll lesson). Assignment is true
    nearest-in-Euclidean: argmin ‖q − s/c‖² replayed as
    argmax (2c·dot − ‖s‖²)/(2c²) — every compared value is an
    integer-valued double (quantized coords, integer sum-centroids and
    sum-of-squares, one exact-operand IEEE division per score), so the
    hash gate is float-hazard-free; ties break to the smallest cluster
    id, matching the engine's >=-chain argmax."""
    parts = [
        f"""q AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
        FROM embeddings),
    c0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
               qv AS s, CAST(1 AS BIGINT) AS cnt,
               CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS ss
        FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k}))"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"""sc{r} AS MATERIALIZED (
        SELECT q.vec_id, c.cid,
               CAST(2 * min(c.cnt) * sum(q.qv[CAST(i AS INT)] * c.s[CAST(i AS INT)])
                    - min(c.ss) AS DOUBLE)
                 / CAST(2 * min(c.cnt) * min(c.cnt) AS DOUBLE) AS score
        FROM q, c{r - 1} c, range(1, {dim + 1}) t(i)
        GROUP BY q.vec_id, c.cid),
    a{r} AS MATERIALIZED (
        SELECT vec_id, cid FROM (
            SELECT sc.vec_id, sc.cid,
                   row_number() OVER (PARTITION BY sc.vec_id
                                      ORDER BY sc.score DESC, sc.cid) AS rn
            FROM sc{r} sc) WHERE rn = 1)"""
        )
        if r < iters:
            parts.append(
                f"""g{r} AS MATERIALIZED (
        SELECT a.cid, i, CAST(sum(q.qv[CAST(i AS INT)]) AS BIGINT) AS sv,
               CAST(count(*) AS BIGINT) AS cnt
        FROM a{r} a, q, range(1, {dim + 1}) t(i)
        WHERE a.vec_id = q.vec_id
        GROUP BY a.cid, i),
    c{r} AS MATERIALIZED (
        SELECT cid, list(sv ORDER BY i) AS s, min(cnt) AS cnt,
               CAST(sum(sv * sv) AS BIGINT) AS ss
        FROM g{r} GROUP BY cid
        UNION ALL
        SELECT c.cid, c.s, c.cnt, c.ss FROM c{r - 1} c
        WHERE c.cid NOT IN (SELECT cid FROM g{r}))"""
            )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           md5(string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id))
             AS members_digest
    FROM a{iters} GROUP BY cid
    """


# Training is a build artifact (like the genomic index and the BPE
# merges): one training per (application, sf_dir); the cached value is
# the lazy assignment plan over the persisted quantized projection.
_KMEANSQ_CACHE: dict = {}


def _kmeans_quantized_assigned(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get

    def build():
        emb = t(spark, sf_dir, "embeddings")
        assigned, _state = SIM.kmeans_quantized(
            emb,
            "embedding",
            "vec_id",
            k=_KMEANSQ_K,
            iters=_KMEANSQ_ITERS,
            dim=_KMEANSQ_DIM,
        )
        return assigned.persist()

    return app_scoped_get(_KMEANSQ_CACHE, spark, ("kmeansq", sf_dir), build)


@register(
    "embedding_kmeans_clusters",
    _kmeans_quantized_sql(_KMEANSQ_K, _KMEANSQ_ITERS, _KMEANSQ_DIM),
)
def embedding_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd's k-means training, hash-gated end to end
    (similarity.kmeans_quantized, k=4, 3 fixed rounds): vectors
    quantize to integers, centroids stay (integer-sum, count) pairs,
    assignment is nearest-centroid in EUCLIDEAN distance (argmax
    (2c·dot − ‖s‖²)/(2c²)), and each score is one IEEE division of
    exact operands —
    so the ITERATIVE TRAINER ITSELF is engine-portable and the oracle
    replays all three rounds as unrolled MATERIALIZED CTEs (this was
    the catalog's last rows-only entry). Assignment is a map-only
    codegen'd argmax with the round's centroids folded in as literals
    (no window, no shuffle — the plan that scales to 100 TB); each
    update round is one k×(dim+1)-cell aggregate. Output: per-cluster
    member counts + the md5 digest of the sorted member ids. The float
    trainer (kmeans_train: convergence, reseed) remains the production
    IVF path, pinned by tests/test_kmeans.py."""
    from slacken_spark.functions.inverted import postings_digest

    assigned = _kmeans_quantized_assigned(spark, sf_dir)
    return assigned.groupBy(F.col("cluster_id").cast("long").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        postings_digest(
            F.sort_array(F.collect_list("vec_id"))
        ).alias("members_digest"),
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization (storage compression for vector corpora)
# ---------------------------------------------------------------------------


@register(
    "embedding_quantize_int8",
    """
    WITH b AS (
        SELECT vec_id, embedding,
               list_min(embedding) AS lo, list_max(embedding) AS hi
        FROM embeddings
    )
    SELECT vec_id,
           CAST(round(CAST(lo AS DOUBLE) * 1000000) AS BIGINT) AS lo_micro,
           CAST(round(CAST(hi AS DOUBLE) * 1000000) AS BIGINT) AS hi_micro,
           md5(array_to_string(list_transform(embedding,
               x -> CAST(CASE WHEN hi > lo
                              THEN round((CAST(x AS DOUBLE) - CAST(lo AS DOUBLE))
                                         / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * 255)
                              ELSE 0 END AS BIGINT)), ',')) AS codes_digest
    FROM b
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Per-vector min-max int8 scalar quantization — the storage
    compression step for large vector corpora (4× smaller than float32;
    dequantize = lo + code/255*(hi-lo)). Map-only codegen'd array
    expressions; codes are exact integers so the digest compares
    bit-for-bit. Scale params surface as micro-units (exact ints)."""
    emb = t(spark, sf_dir, "embeddings")
    lo, hi = F.array_min("embedding"), F.array_max("embedding")
    b = emb.select(
        "vec_id",
        "embedding",
        lo.alias("lo"),
        hi.alias("hi"),
    )
    # promote to double BEFORE the arithmetic: float32 division rounds
    # differently from DuckDB's double-promoted division at .5 edges
    code = lambda x: F.when(  # noqa: E731
        F.col("hi") > F.col("lo"),
        F.round(
            (x.cast("double") - F.col("lo").cast("double"))
            / (F.col("hi").cast("double") - F.col("lo").cast("double"))
            * 255
        ),
    ).otherwise(F.lit(0.0)).cast("long")
    return b.select(
        "vec_id",
        F.round(F.col("lo").cast("double") * 1_000_000).cast("long").alias(
            "lo_micro"
        ),
        F.round(F.col("hi").cast("double") * 1_000_000).cast("long").alias(
            "hi_micro"
        ),
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col("embedding"), lambda x: code(x).cast("string"))
            )
        ).alias("codes_digest"),
    )


# ---------------------------------------------------------------------------
# End-to-end retrieval: ANN top-k + document metadata join
# ---------------------------------------------------------------------------

from slacken_spark.plans.catalog import DEMOTED as _DQ  # noqa: E402

_IVF_TOPK_SQL = _DQ["embedding_ivf_topk"][1]


@register(
    "ann_retrieve_docs",
    f"""
    WITH topk AS ({_IVF_TOPK_SQL})
    SELECT t.q_id, t.rnk, t.c_id, t.sim, d.source, d.lang
    FROM topk t JOIN documents d ON t.c_id = d.doc_id
    """,
)
def ann_retrieve_docs(spark, sf_dir):
    """The full retrieval stack in one query: IVF ANN top-k over the
    embedding corpus, then the tiny (queries × k) hit list joins BACK to
    the documents table for display metadata — broadcast on the hit
    side, so the metadata fetch is a map-only pass over the documents
    scan (the exact shape of serving-time candidate hydration at
    corpus scale; vec_id ≡ doc_id in the test tables)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    topk = SIM.ivf_topk(queries, corpus, _centroids(), k=3, round_digits=4)
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return (
        docs.join(F.broadcast(topk), docs.doc_id == topk.c_id)
        .select(
            "q_id",
            F.col("rnk").cast("long").alias("rnk"),
            "c_id",
            "sim",
            "source",
            "lang",
        )
    )


