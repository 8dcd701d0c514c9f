"""Distributed graph operators over edge DataFrames.

``pagerank_int`` is the iterative companion to ``dedup.connected_
components``: where components LABEL the near-dup graph, PageRank
SCORES centrality inside it — the "which copy is the canonical one"
signal dedup pipelines use when keep-policies need more than min-id /
longest-text (the hub of a template cluster is its best representative).

Engine-portability: ranks are SCALED INTEGERS and every per-iteration
step is integer arithmetic (floor division for the degree split and
the damping multiply) — exactly the quantized-Lloyd's trick
(``similarity.kmeans_quantized``), so a fixed number of unrolled
rounds is bit-equal across Spark and DuckDB where float PageRank
would drift with summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from slacken_spark.session import pin as _pin

PR_SCALE = 1_000_000
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def pagerank_int(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 3,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Integer-scaled PageRank over an UNDIRECTED pair graph.

    ``pairs`` is one row per undirected edge (``id_a < id_b`` — the
    shape ``dedup.minhash_band_pairs`` emits); both directions are
    materialized, so every node has out-degree ≥ 1 and there is no
    dangling-mass term. Ranks start at ``scale`` and update as

        rank'(v) = base + (85 · Σ_{u→v} (rank(u) div deg(u))) div 100

    with ``base = scale - (scale·85) div 100`` — all 64-bit integer
    ops (both engines floor-divide identically on nonnegative values),
    so ``iters`` unrolled rounds are deterministic and an oracle can
    replay them as chained CTEs.

    Scale design: each iteration is the canonical distributed PageRank
    step — one edge⋈rank join keyed on the source and one sum shuffle
    keyed on the destination — O(iters · |E| / cluster), no driver
    state. The symmetric edge list and the degree table are shared
    across every round (and the final join) via lazy localCheckpoint:
    without truncation the unrolled plan re-derives the pair lineage
    once per REFERENCE (Spark does not dedupe common subplans), and
    each round's rank table is checkpointed so the logical plan stays
    round-sized instead of nesting. Block lifetime follows the
    apply_delta/lsh_delta convention: the checkpointed frames back the
    RETURNED plan, so they free with the JVM, not eagerly. Rank
    magnitudes stay ≤ scale · max-degree per round, far inside int64
    at the default scale. localCheckpoint blocks are executor-local —
    losing an executor mid-query fails the QUERY (idempotent retry),
    not the task; spot deployments set
    ``spark.slacken.reliableCheckpoint=true`` plus a checkpoint dir and
    every pin site here becomes reliable ``checkpoint()`` — see
    ``session.pin`` (ARCHITECTURE.md "localCheckpoint fault-tolerance
    posture").

    Returns ``(id, deg, rank)`` — one row per node of the pair graph
    (isolated documents are not nodes and do not rank).
    """
    from slacken_spark.functions.dedup import _stats_free

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # _stats_free on every checkpoint: each round's rank table is a
    # JOIN over two earlier checkpoints, so without the reset Catalyst's
    # size-only estimator compounds sizeInBytes multiplicatively across
    # rounds (the BigInteger planning blowup dedup's loops measured —
    # see dedup._stats_free). This loop broadcast-joins nothing, so
    # dropping the estimates costs no plan quality.
    # pin the DIRECTED pair list first: the symmetric union references
    # it twice, and without the pin each branch re-runs the caller's
    # pair-discovery subtree (often a corpus-scanning self-join +
    # distinct — Spark does not dedupe common subplans; r13-opt). The
    # union over the pinned blocks is then two block reads, so the
    # edges checkpoint costs one pair evaluation instead of two.
    directed = _stats_free(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .transform(_pin)
    )
    edges = _stats_free(
        directed.unionByName(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .transform(_pin)
    )
    deg = _stats_free(
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .transform(_pin)
    )
    # (src, dst, deg) — one join per round over the two checkpointed RDDs
    edges_deg = edges.join(deg, "src")
    base = scale - (scale * PR_DAMP_NUM) // PR_DAMP_DEN
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(scale).cast("long").alias("rank")
    )
    for _ in range(iters):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["id"]
        ).select(F.col("dst"), F.expr("rank div deg").alias("c"))
        ranks = _stats_free(
            contrib.groupBy(F.col("dst").alias("id"))
            .agg(
                (
                    F.lit(base)
                    + F.expr(f"({PR_DAMP_NUM} * sum(c)) div {PR_DAMP_DEN}")
                )
                .cast("long")
                .alias("rank")
            )
            .transform(_pin)
        )
    return (
        deg.select(F.col("src").alias("id"), "deg")
        .join(ranks, "id")
        .select("id", "deg", "rank")
    )
