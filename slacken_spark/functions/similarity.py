"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast nested-loop
of Q query vectors against the corpus — at 100 TB the corpus side stays
partition-parallel and only the (tiny) query set broadcasts, so the scan
is map-only with a final per-query top-k (partial top-k per partition via
AQE + window). The scale path is LSH bucketing (random hyperplanes):
signature is map-only; the candidate join shuffles once on the bucket key.

All arithmetic uses double-precision ``F.aggregate``/``F.zip_with``
(JVM codegen — no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from slacken_spark.session import pin as _pin


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k by cosine: broadcast(queries) × corpus, window top-k.

    Ties break on ascending corpus id (deterministic). ``round_digits``
    rounds the similarity BEFORE ranking so results are reproducible
    across engines/accumulation orders.
    """
    # norms are materialized per ROW before the join — computing them
    # inside the pair expression would re-run the interpreted aggregate
    # once per (query, corpus) pair instead of once per row
    q = queries.withColumn("_qnorm", l2_norm(F.col(q_vec)))
    c = corpus.withColumn("_cnorm", l2_norm(F.col(c_vec)))
    sim = dot(F.col(q_vec), F.col(c_vec)) / (F.col("_qnorm") * F.col("_cnorm"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    joined = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, sim.alias("sim"))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(q_id, c_id, "sim", "rnk")
    )


def lsh_hyperplane_buckets(
    df: DataFrame, vec_col: str, planes: list[list[float]]
) -> DataFrame:
    """Random-hyperplane LSH bucket id (one bit per plane, sign of dot).

    ``planes`` is a small driver-side list (broadcast as literals).
    Map-only; join candidates on ``bucket`` for the scale path.
    """
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return df.withColumn("bucket", bucket)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    round_digits: int | None = 4,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k via IVF coarse quantization.

    Both sides are assigned to their nearest centroid; candidates are the
    corpus vectors sharing the query's centroid — an EQUI-join on
    centroid_id instead of a cross join, which is what survives a
    billion-vector corpus. Recall < 1 by construction (vectors straddling
    centroid boundaries are missed); ``nprobe > 1`` unions the query's
    next-nearest centroid assignments for recall control — the CORPUS
    assignment is unchanged (each corpus vector lives in exactly one
    inverted list, so probe candidate sets are disjoint and need no
    dedup), only the tiny broadcast query side fans out ×nprobe.
    """
    if nprobe > 1:
        qa = (
            ivf_assign_probes(queries, q_vec, centroids, nprobe)
            .withColumn("centroid_id", F.explode("probe_ids"))
            .drop("probe_ids")
        )
    else:
        qa = ivf_assign(queries, q_vec, centroids)
    qa = qa.withColumn("_qnorm", l2_norm(F.col(q_vec)))
    ca = ivf_assign(corpus, c_vec, centroids).withColumn(
        "_cnorm", l2_norm(F.col(c_vec))
    )
    sim = dot(F.col(q_vec), F.col(c_vec)) / (F.col("_qnorm") * F.col("_cnorm"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    joined = (
        F.broadcast(qa)
        .join(ca, "centroid_id")
        .where(F.col(q_id) != F.col(c_id))
        .select(q_id, c_id, sim.alias("sim"))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(q_id, c_id, "sim", "rnk")
    )


def _centroid_sims(vec_col: str, centroids: list[list[float]], norm_col: str) -> Column:
    """Array of cosine similarities of a row's vector to every centroid
    literal; the row norm is read from ``norm_col`` (materialized once
    per row by the caller)."""
    cnorms = [sum(float(x) * float(x) for x in c) ** 0.5 for c in centroids]
    return F.array(
        *[
            dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
            / (F.col(norm_col) * F.lit(cn))
            for c, cn in zip(centroids, cnorms)
        ]
    )


def ivf_assign_probes(
    df: DataFrame, vec_col: str, centroids: list[list[float]], nprobe: int
) -> DataFrame:
    """Top-``nprobe`` nearest centroids per row as an array column
    ``probe_ids`` (nearest first; ties resolve to the smallest centroid
    index, consistent with ``ivf_assign``'s first-occurrence argmax).

    Map-only codegen: the sims array sorts as (−sim, idx) structs —
    no per-row Python, cost linear in len(centroids)·log(len(centroids)).
    """
    if not centroids:
        return df.withColumn("probe_ids", F.array().cast("array<int>"))
    pairs = F.transform(
        F.col("_ivf_sims"),
        lambda v, i: F.struct((-v).alias("neg"), i.alias("idx")),
    )
    probes = F.transform(
        F.slice(F.array_sort(pairs), 1, nprobe), lambda s: s["idx"].cast("int")
    )
    return (
        df.withColumn("_ivf_norm", l2_norm(F.col(vec_col)))
        .withColumn("_ivf_sims", _centroid_sims(vec_col, centroids, "_ivf_norm"))
        .withColumn("probe_ids", probes)
        .drop("_ivf_sims", "_ivf_norm")
    )


def ivf_assign(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid.

    Centroids are literals (tiny, driver-side — in production they come
    from a sampled k-means). The ANN query path then probes only matching
    centroid partitions: the candidate join is an equi-join on
    ``centroid_id`` instead of a cross join.

    The N per-centroid similarities are materialized ONCE as an array
    column in their own projection, and the argmax reads that array:
    ``array_position(sims, array_max(sims))`` — first occurrence, so ties
    resolve to the smallest centroid index, matching a sequential
    strictly-greater fold. Cost is linear in ``len(centroids)``.
    (A folded when-chain would embed every previous cosine expression
    inside the next step — ~2^N copies of the interpreted dot product.)
    """
    if not centroids:
        return df.withColumn("centroid_id", F.lit(-1))
    # the row's own norm is materialized once; centroid norms are plain
    # Python float literals (sum is left-to-right, matching the SQL
    # oracle's list_sum fold)
    sims = _centroid_sims(vec_col, centroids, "_ivf_norm")
    arr = F.col("_ivf_sims")
    centroid_id = (F.array_position(arr, F.array_max(arr)) - F.lit(1)).cast("int")
    return (
        df.withColumn("_ivf_norm", l2_norm(F.col(vec_col)))
        .withColumn("_ivf_sims", sims)
        .withColumn("centroid_id", centroid_id)
        .drop("_ivf_sims", "_ivf_norm")
    )


def kmeans_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 5,
    tol: float = 1e-9,
    reseed_empty: bool = True,
) -> list[list[float]]:
    """Distributed Lloyd's k-means — the trainer that produces
    ``ivf_assign``'s centroids (the docstring's "in production they come
    from a sampled k-means", now in-repo).

    Per iteration: assignment is the broadcast linear-argmax plan of
    ``ivf_assign`` (map-only); the update explodes vector positions and
    mean-aggregates per (cluster, position) — one shuffle keyed on
    k×dim cells with map-side partials — then collects exactly k×dim
    cells to the driver (centroids are driver-side literals by design;
    k×dim is tiny regardless of corpus size). Initialization is
    deterministic: the k vectors with the smallest md5(id) — a seeded
    spread sample, reproducible across runs and engines.

    Stops early once the max centroid movement (L2) drops below
    ``tol``. With ``reseed_empty`` (default), a cluster that won no
    points is reseeded from the worst-served point — the one least
    similar to its assigned centroid (deterministic ascending-(sim, id)
    pick; one extra small action only on the rounds where a cluster
    actually empties). ``reseed_empty=False`` keeps the old behavior:
    empty clusters retain their previous centroid.

    Returns the trained centroids as plain Python lists, ready for
    ``ivf_assign`` / ``ivf_topk``.
    """
    init_rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]
    for _ in range(iters):
        assigned = ivf_assign(df, vec_col, centroids)
        cells = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        seen = set()
        for r in cells:
            new[r["centroid_id"]][r["pos"]] = float(r["m"])
            seen.add(int(r["centroid_id"]))
        empty = [c for c in range(len(centroids)) if c not in seen]
        if empty and reseed_empty:
            far_rows = (
                df.withColumn("_n", l2_norm(F.col(vec_col)))
                .withColumn("_best", F.array_max(
                    _centroid_sims(vec_col, centroids, "_n")
                ))
                .orderBy(F.asc("_best"), F.col(id_col))
                .limit(len(empty))
                .collect()
            )
            for c, r in zip(empty, far_rows):
                new[c] = [float(x) for x in r[vec_col]]
        moved = max(
            (
                sum((a - b) ** 2 for a, b in zip(n_c, o_c)) ** 0.5
                for n_c, o_c in zip(new, centroids)
            ),
            default=0.0,
        )
        centroids = new
        if moved < tol:
            break
    return centroids


def kmeans_quantized(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 4,
    iters: int = 3,
    scale: int = 64,
    dim: int = 64,
) -> tuple[DataFrame, list[tuple[list[int], int]]]:
    """Integer-exact Lloyd's k-means over quantized vectors — the
    ENGINE-PORTABLE formulation that lets an iterative trainer sit
    under a hash gate (the float trainer above stays the production
    IVF path; this one exists so training itself is oracle-checkable).

    Every quantity both engines compare is an exactly-representable
    integer-valued double, so there is no cross-engine float hazard
    anywhere:

    - vectors quantize per-dimension to ``round(x * scale)`` (float →
      double is exact, the product is exact, and Spark and DuckDB both
      round half away from zero);
    - a centroid is its members' INTEGER SUM vector plus a count —
      never a float mean;
    - assignment is NEAREST-CENTROID IN EUCLIDEAN DISTANCE (true
      Lloyd's): argmin ‖q − s/c‖² = argmax (2c·dot(q,s) − ‖s‖²)/(2c²),
      and both numerator and denominator are exact integers (bounded
      well under 2^53), so the score is a single IEEE division of
      exact operands — correctly rounded, bit-equal on every engine.
      A raw dot(q, mean) argmax would NOT be k-means: it is monotone
      in centroid norm, so the largest-norm cluster absorbs points.
      Ties break to the smallest cluster id.

    Initialization: the ``k`` smallest ids' quantized vectors
    (count 1). Fixed ``iters`` assignment rounds; each of the first
    ``iters - 1`` re-aggregates sums/counts (one k×(dim+1)-cell
    shuffle + driver collect per round — centroid state is literal by
    design, like ``kmeans_train``); a cluster that wins no members
    carries its previous state. The final round is assignment-only.

    Returns ``(assigned, state)``: ``assigned`` is a LAZY map-only
    plan — the quantization projection plus a codegen'd CASE argmax
    with the final centroid state folded in as literals (no window, no
    shuffle: the 100 TB assignment shape) — with columns of ``df``
    plus ``cluster_id``; ``state`` is the final ``[(sum_vec, count)]``.
    """
    qcols = [
        F.round(F.element_at(F.col(vec_col), i + 1).cast("double") * scale)
        .cast("long")
        .alias(f"_q{i}")
        for i in range(dim)
    ]
    qdf = df.select("*", *qcols)

    def with_assignment(frame, state, out_col):
        # materialize the k scores as columns in their own projection:
        # embedding each 64-term sum directly in the argmax CASE would
        # repeat it O(k) times per comparison — past janino's method
        # limit, so the whole stage falls out of codegen (CollapseProject
        # leaves non-cheap expressions materialized, so this sticks)
        scores = []
        for s, cnt in state:
            dot = sum(
                (F.col(f"_q{i}") * F.lit(int(s[i])) for i in range(1, dim)),
                F.col("_q0") * F.lit(int(s[0])),
            )
            ss = sum(int(x) * int(x) for x in s)  # ‖s‖², exact Python int
            scores.append(
                (F.lit(2 * int(cnt)) * dot - F.lit(ss)).cast("double")
                / F.lit(float(2 * int(cnt) * int(cnt)))
            )
        sdf = frame.select(
            "*", *[sc.alias(f"_sc{j}") for j, sc in enumerate(scores)]
        )
        # >= chain: the first cluster whose score is >= every later one
        # — identical to argmax with smallest-index tie-break
        expr = F.lit(k - 1)
        for j in range(k - 2, -1, -1):
            cond = None
            for m in range(j + 1, k):
                c = F.col(f"_sc{j}") >= F.col(f"_sc{m}")
                cond = c if cond is None else (cond & c)
            expr = F.when(cond, F.lit(j)).otherwise(expr)
        return sdf.withColumn(out_col, expr.cast("long")).drop(
            *[f"_sc{j}" for j in range(k)]
        )

    init = (
        qdf.select(id_col, *[f"_q{i}" for i in range(dim)])
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init)}")
    state = [
        ([int(r[f"_q{i}"]) for i in range(dim)], 1) for r in init
    ]
    for _ in range(iters - 1):
        sums = (
            with_assignment(qdf, state, "_cid")
            .groupBy("_cid")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(f"_q{i}").alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        new = list(state)  # empty clusters keep their previous state
        for r in sums:
            new[int(r["_cid"])] = (
                [int(r[f"_s{i}"]) for i in range(dim)],
                int(r["_n"]),
            )
        state = new
    assigned = with_assignment(qdf, state, "cluster_id").drop(
        *[f"_q{i}" for i in range(dim)]
    )
    return assigned, state


def lsh_delta(
    base: DataFrame,
    upd: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Incremental maintenance of the hyperplane-LSH bucket index — the
    vector twin of ``inverted.delta_index``. Given the base corpus and
    a CDC batch of replacement vectors, rebuild ONLY the affected
    buckets' member lists → ``(bucket, n_vecs, members)``; a bucket
    that empties returns n_vecs = 0 with an empty members array (the
    delete tombstone).

    Affected buckets = old ∪ new bucket of each changed vector
    (≤ 2·|batch|), broadcast as a semi-join ahead of the per-bucket
    shuffle. Bucket ids are map-only sign-bit hashes, so the corpus
    cost is two projection scans (one to find the changed vectors' OLD
    buckets, one to assemble the merged assignment) — no corpus
    shuffle anywhere; a production maintainer that stores bucket
    assignments alongside the vectors reads them instead of
    recomputing. The delta bound applies to the SHUFFLE — collect_list
    reduces only affected buckets' rows, which is the cost that
    matters at scale. One left outer join (small side broadcast —
    build-right, the side a LeftOuter join can broadcast) emits
    rebuilt lists and tombstones without re-evaluating the aggregation
    (the delta_index lesson); the batch-sized update frames are
    local-checkpointed so their multiple references share one
    computation.

    ``deletes`` (optional, id-only rows) removes vectors outright —
    unlike component labels or zone-map min/max, bucket membership has
    no removal asymmetry: a delete is a replacement with nothing, so
    it only WIDENS the changed-id set (its old bucket joins the
    affected set, the merged assignment drops it, and a fully-emptied
    bucket falls out as the same n_vecs = 0 tombstone). An id in both
    ``upd`` and ``deletes`` is a replacement (the new vector wins)."""
    base = base.select(id_col, vec_col)
    upd = upd.select(id_col, vec_col).transform(_pin)
    base_b = lsh_hyperplane_buckets(base, vec_col, planes).select(
        id_col, "bucket"
    )
    upd_b = lsh_hyperplane_buckets(upd, vec_col, planes).select(
        id_col, "bucket"
    ).transform(_pin)
    changed_ids = upd.select(id_col)
    if deletes is not None:
        # plain union — both consumers are semi/anti joins, so an id in
        # upd ∩ deletes duplicating here is harmless (replacement wins
        # because only upd_b re-adds rows); checkpointed so the two
        # references below share one batch-sized computation
        changed_ids = changed_ids.unionByName(
            deletes.select(id_col)
        ).transform(_pin)
    upd_ids = F.broadcast(changed_ids)
    old_b = base_b.join(upd_ids, id_col, "left_semi").select("bucket")
    aff = old_b.unionByName(upd_b.select("bucket")).distinct().transform(_pin)
    merged_b = base_b.join(upd_ids, id_col, "left_anti").unionByName(upd_b)
    rebuilt = (
        merged_b.join(F.broadcast(aff), "bucket", "left_semi")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sort_array(F.collect_list(id_col)).alias("members"),
        )
    )
    return aff.join(F.broadcast(rebuilt), "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("n_vecs"), F.lit(0)).cast("long").alias("n_vecs"),
        F.coalesce(F.col("members"), F.array().cast("array<long>")).alias(
            "members"
        ),
    )


# ---------------------------------------------------------------------------
# Random projection (Johnson–Lindenstrauss, ±1 / Achlioptas signs)
# ---------------------------------------------------------------------------


def rp_signs(in_dim: int, out_dim: int, seed: str = "rp") -> list[list[int]]:
    """Deterministic ±1 sign matrix from md5 — the SAME literals are
    embedded in the Spark plan and in any SQL oracle, so projections are
    reproducible bit-for-bit across engines and runs."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{seed}_{i}_{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1
            for j in range(out_dim)
        ]
        for i in range(in_dim)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    in_dim: int,
    out_dim: int = 16,
    seed: str = "rp",
) -> DataFrame:
    """JL dimensionality reduction: out_j = (1/√out_dim) · Σ_i ±vec_i.

    The sign matrix is folded into the plan as literal +/− terms, so the
    whole projection is ONE codegen'd map-only projection — no shuffle,
    no UDF, no per-element interpreted lambda. Every element is cast to
    double BEFORE accumulation (the float→double promotion rule) and the
    terms accumulate left-to-right, so any engine that evaluates the
    same expression produces the identical IEEE doubles. At 100 TB this
    is a pure scan→project stage that pushes only the id and vector
    columns.

    Each output column is built as ONE ``F.expr`` SQL string: composing
    the 64-term chain from Python Column objects costs a py4j
    round-trip per ``+`` node (~14 s of driver time for 16×64 terms,
    measured); the string form is one call per column and produces the
    identical plan.
    """
    import math

    signs = rp_signs(in_dim, out_dim, seed)
    scale = repr(1.0 / math.sqrt(out_dim))
    cols = [F.col(id_col)]
    for j in range(out_dim):
        terms = "".join(
            ("-" if signs[i][j] < 0 else ("+" if i > 0 else ""))
            + f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            for i in range(in_dim)
        )
        cols.append(F.expr(f"{scale} * ({terms})").alias(f"p{j}"))
    return df.select(*cols)


def rp_sql(vec_expr: str, in_dim: int, out_dim: int = 16, seed: str = "rp") -> str:
    """ANSI-SQL select-list for the SAME projection (oracle side)."""
    import math

    signs = rp_signs(in_dim, out_dim, seed)
    scale = repr(1.0 / math.sqrt(out_dim))
    cols = []
    for j in range(out_dim):
        terms = "".join(
            ("-" if signs[i][j] < 0 else ("+" if i > 0 else ""))
            + f"CAST({vec_expr}[{i + 1}] AS DOUBLE)"
            for i in range(in_dim)
        )
        cols.append(f"{scale} * ({terms}) AS p{j}")
    return ",\n           ".join(cols)
