"""Deduplication operators for training-data pipelines.

Scale notes (100 TB design):
- Exact dedup is a hash-groupBy: one shuffle on a 128-bit digest; with
  AQE the reducer count adapts. Never `distinct()` on wide rows — hash
  first, dedup on the digest, then rejoin if the full row is needed.
- MinHash+LSH: signature computation is embarrassingly parallel
  (map-only, codegen'd); candidate generation shuffles once on
  (band_id, band_hash) — the classic Broder scheme. The band join's key
  cardinality grows with corpus size, so skew is bounded by band width.
- SimHash: map-only signature + self-join on rotated prefixes.
All hashes derive from md5 so any engine (DuckDB oracle included) can
reproduce them bit-for-bit.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slacken_spark.functions.text import token_hash64, tokens
from slacken_spark.session import pin as _pin


def content_digest(col: Column) -> Column:
    """Stable 128-bit content digest (md5 hex) for exact dedup."""
    return F.md5(col)


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content digest.

    Returns (digest, keep_id, n_copies). One shuffle on the digest.
    """
    return (
        df.select(content_digest(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# Universal-hash permutation family over a Mersenne prime. One md5 per
# shingle (portable base hash), then cheap affine rehashes per
# permutation — integer-exact in any engine, 8× fewer digest calls than
# salted-md5-per-permutation, and small enough to never overflow int64
# ((P-1)*A + B < 2^62).
MINHASH_P = (1 << 31) - 1


def minhash_perm_constants(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A, B) pairs, A ∈ [1, P)."""
    out = []
    for p in range(n_hashes):
        a = (2654435761 * (p + 1) + 104729) % MINHASH_P
        b = (40503 * (p + 7) + 7919) % MINHASH_P
        out.append((a or 1, b))
    return out


def minhash_signature(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 8, shingle_words: int = 3
) -> DataFrame:
    """MinHash signature: (id, sig_0 … sig_{n-1}).

    Scale plan: shingles as codegen'd rows (text.shingle_rows), hash each
    ONCE (md5-derived base hash), derive the n permutations as affine
    rehashes, and take per-doc minima with a codegen'd partial-aggregated
    groupBy — no per-row array lambdas (Spark's higher-order functions
    run interpreted), one shuffle on the doc id. Docs with no shingles
    (shorter than the shingle width) keep NULL signatures via left join.
    """
    from slacken_spark.functions.text import shingle_rows

    shingled = shingle_rows(df, text_col, id_col, n=shingle_words).withColumnRenamed(
        "shingle", "_shingle"
    )
    h = (token_hash64(F.col("_shingle")) % MINHASH_P).alias("_h")
    hashed = shingled.select(id_col, h)
    aggs = [
        F.min((F.col("_h") * A + B) % MINHASH_P).alias(f"sig_{p}")
        for p, (A, B) in enumerate(minhash_perm_constants(n_hashes))
    ]
    sigs = hashed.groupBy(id_col).agg(*aggs)
    return df.select(id_col).join(sigs, id_col, "left")


def minhash_banded(
    sig: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Explode a signature frame into ``bands`` (id, band_id, band_key)
    rows — the LSH bucketing shared by the pair join and its
    incremental delta. NULL signature values (docs with no shingles)
    render as the literal 'null' so such docs still share a bucket,
    matching the oracle's coalesce."""
    rows_per_band = n_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "_",
                    *[
                        F.coalesce(
                            F.col(f"sig_{b * rows_per_band + i}").cast("string"),
                            F.lit("null"),
                        )
                        for i in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col(id_col), F.explode(band_structs).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")


def minhash_band_pairs(
    sig: DataFrame, id_col: str, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the signature.

    Explodes each signature into ``bands`` (band_id, band_key) rows and
    self-joins per band — ONE shuffle keyed on (band_id, band_key), which
    is how this stays tractable at corpus scale (no all-pairs join).
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    banded = minhash_banded(sig, id_col, n_hashes, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_pair_delta(
    base_sig: DataFrame,
    upd_sig: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Incremental maintenance of the LSH candidate-pair graph — the
    dedup twin of ``inverted.delta_index``: when a CDC batch replaces
    documents, emit the DIFF of the near-dup candidate set instead of
    re-joining the whole corpus → ``(id_a, id_b, change)`` with
    ``change ∈ {'add', 'drop'}``. 'add' pairs share a band only under
    the new state (the downstream verifier/union-find consumes them);
    'drop' pairs shared a band only through a changed doc's OLD text
    (the component maintainer retires them). Pairs between two
    unchanged docs cannot change and are never computed.

    Scale shape: the changed docs' band keys (≤ bands·|batch| rows,
    old + new) broadcast as a semi-join on the corpus banding, so only
    buckets CONTAINING a changed doc enter the pair join — per-batch
    cost is affected-bucket-sized, never the full banded self-join.
    TWO local checkpoints per call, both batch-sized: ``old_changed``
    (its lineage scans the corpus-sized base, so a second reference
    would rescan it) and ``upd_sig`` (its lineage is the CALLER's
    update construction — often corpus-scanning joins, as in the
    minhash_lsh_delta entry — and it feeds the broadcast id set plus
    both new-pair branches, so un-pinned it re-evaluated 3-4 times;
    r13-opt). Callers that store signatures/bands at ingest, the
    production shape, pay nothing. Cheap band derivations over the
    pinned rows still re-evaluate instead of accumulating more
    checkpoint blocks, and the add/drop diff is ONE full-outer join so
    each pair set evaluates once."""
    upd_sig = upd_sig.transform(_pin_unless_materialized)
    upd_ids = F.broadcast(upd_sig.select(id_col))
    base_banded = minhash_banded(base_sig, id_col, n_hashes, bands)
    upd_banded = minhash_banded(upd_sig, id_col, n_hashes, bands)
    # bands of the changed docs' OLD text — batch-sized rows, but the
    # lineage scans the base corpus: checkpoint so its two references
    # (pair side + broadcast keys) share one scan
    old_changed = base_banded.join(
        upd_ids, id_col, "left_semi"
    ).transform(_pin)
    merged_banded = base_banded.join(upd_ids, id_col, "left_anti").unionByName(
        upd_banded
    )

    def pairs_with(changed, universe):
        keys = F.broadcast(changed.select("band_id", "band_key").distinct())
        bucket_members = universe.join(keys, ["band_id", "band_key"], "left_semi")
        # `changed` is batch-bounded (≤ bands·|batch| pinned rows) but
        # checkpoint stats are reset, so the pair join sort-merged and
        # shuffled BOTH sides; broadcasting the batch side keeps the
        # semi-filtered universe map-side — only matched pairs reach
        # the distinct (r14, same shape as _delta_new_pairs).
        a, b = changed.alias("a"), bucket_members.alias("b")
        ida, idb = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
        return (
            F.broadcast(a)
            .join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (ida != idb),
            )
            .select(
                F.least(ida, idb).alias("id_a"),
                F.greatest(ida, idb).alias("id_b"),
            )
            .distinct()
        )

    new_pairs = pairs_with(upd_banded, merged_banded).withColumn(
        "_new", F.lit(1)
    )
    old_pairs = pairs_with(old_changed, base_banded).withColumn(
        "_old", F.lit(1)
    )
    keys = ["id_a", "id_b"]
    return (
        new_pairs.join(old_pairs, keys, "full_outer")
        .where(F.col("_new").isNull() | F.col("_old").isNull())
        .select(
            *keys,
            F.when(F.col("_old").isNull(), F.lit("add"))
            .otherwise(F.lit("drop"))
            .alias("change"),
        )
    )


def jaccard_similarity(set_a: Column, set_b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(set_a, set_b))
    union = F.size(F.array_union(set_a, set_b))
    return inter / F.greatest(union, F.lit(1))


def simhash_rows(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16
) -> DataFrame:
    """SimHash via exploded token rows — the scale path.

    One hash per token row, then ``bits`` conditional sums in a single
    codegen'd partial-aggregated groupBy (votes>0 → set bit). The array
    formulation (simhash_from_hashes) walks the token array once per bit
    through interpreted lambda evaluation — 16× the passes, none of them
    codegen'd. Returns (id, simhash).
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    hashed = toks.select(id_col, token_hash64(F.col("_tok")).alias("_h"))
    votes = [
        F.sum(
            F.when(
                F.col("_h").bitwiseAND(F.lit(1 << b).cast("long")) != 0, 1
            ).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        sig = sig + F.when(
            F.col(f"_v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    out = agg.select(id_col, sig.alias("simhash"))
    # docs with zero tokens: empty-token split yields one '' token, so
    # every doc appears; no left-join backfill needed
    return out


def simhash_from_hashes(hashes: Column, bits: int = 16) -> Column:
    """SimHash over a precomputed array<long> of token hashes: for each
    bit, sum +1/-1 votes across tokens; set the bit when the vote is
    positive. ``bits`` is a static Python int so the bit masks unroll to
    literals (pure codegen'd expressions, no shifts by columns)."""
    def bit_vote(mask: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(mask).cast("long")) != 0, 1).otherwise(-1),
        )

    result = F.lit(0).cast("long")
    for b in range(bits):
        mask = 1 << b
        result = result + F.when(bit_vote(mask) > 0, F.lit(mask).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return result


def simhash64(toks: Column, bits: int = 16) -> Column:
    """SimHash of a token array (see simhash_from_hashes)."""
    return simhash_from_hashes(F.transform(toks, token_hash64), bits)


def hamming_distance64(a: Column, b: Column) -> Column:
    """Hamming distance between two long-encoded bit signatures."""
    return F.bit_count(a.bitwiseXOR(b))


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: (id, n_shared) for every training doc
    sharing at least one word n-gram with the eval/benchmark set —
    the overlap count a decontamination pass filters or audits on.

    The eval side reduces to its DISTINCT shingle set and (by default)
    broadcasts — benchmark suites are tiny next to a pretraining corpus,
    so the scan stays map-side: exploded train shingles hash-join the
    broadcast set, then one shuffle on the doc id for the count.
    Shingles are exploded ROWS (codegen'd), never array lambdas.
    """
    from slacken_spark.functions.text import shingle_rows

    tr = shingle_rows(train, text_col, id_col, n=n)
    ev = shingle_rows(eval_df, text_col, id_col, n=n).select("shingle").distinct()
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def bloom_bitmap(
    df: DataFrame, col: str, m_bits: int = 8192, k: int = 2
) -> DataFrame:
    """Distributed Bloom-filter build over a string column: each value
    sets ``k`` md5-derived bit positions in an ``m_bits`` bitmap, stored
    as (word_idx, bits) rows of 32-bit words packed in longs.

    This is the FIXED-MEMORY membership structure for when the filter
    side is too big to broadcast exactly (e.g. 'seen in a previous crawl'
    with billions of keys): the build is explode + one bit_or partial-agg
    shuffle onto ≤ m_bits/32 rows, and the result broadcasts at
    m_bits/8 bytes no matter how many values went in. All hashes are
    md5-based (portable), so false positives are DETERMINISTIC and any
    engine reproduces the identical bitmap. 32-bit words keep every
    shift ≤ 31 — no sign-bit overflow disagreements between engines.
    """
    from slacken_spark.functions.text import token_hash64

    pos = [
        F.pmod(token_hash64(F.concat(F.lit(f"bloom{i}_"), F.col(col))), F.lit(m_bits))
        for i in range(k)
    ]
    # NULL keys set no bits (membership of null is not meaningful);
    # unfiltered they would hash to null and land as a junk
    # (null, null) word row that merges carry along forever
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(F.array(*pos)).alias("p"))
        .selectExpr(
            "p div 32 AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT)) AS mask",
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(words: DataFrame) -> DataFrame:
    """Merge partial Bloom word tables (a union of :func:`bloom_bitmap`
    outputs built with the SAME m_bits/k) by per-word bit_or — the
    mergeability that lets the filter build per-partition, per-shard,
    or per-micro-batch and combine losslessly:
    ``bitmap(A ∪ B) == bloom_merge(bitmap(A), bitmap(B))``, word for
    word. bit_or is add-monotone, so the table supports APPEND-ONLY
    maintenance; key deletions cannot clear a bit (the zone-map /
    HLL-register asymmetry — rebuild for delete-heavy workloads, or
    pair with a second "deleted" filter and subtract at probe time)."""
    return words.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_maintain(
    base_words: DataFrame,
    batch_df: DataFrame,
    col: str,
    m_bits: int = 8192,
    k: int = 2,
) -> DataFrame:
    """Incremental Bloom maintenance under an APPEND batch:
    ``words' = bloom_merge(words ∪ bitmap(batch))`` — batch-bounded
    work (one batch-sized partial bit_or + one ≤ m_bits/32-row merge
    shuffle, no corpus rescan), maintained ≡ rebuilt word for word.
    The 'seen in a previous crawl' filter stays current as crawls
    arrive instead of rebuilding over billions of historical keys."""
    return bloom_merge(
        base_words.unionByName(bloom_bitmap(batch_df, col, m_bits, k))
    )


def _pin_unless_materialized(df: DataFrame) -> DataFrame:
    """``_pin``, skipped when the plan is already a materialized scan —
    a LogicalRDD (an earlier pin/checkpoint) or a cached
    InMemoryRelation (a persisted stored table), possibly under one
    projection. Re-pinning those pays a redundant block copy per call
    (r13 ADVICE on bloom words / upd_sig). Block lifetime of the pins
    that DO fire: executor-local checkpoint blocks live until the
    session ends (there is no per-call unpersist path — the returned
    plan owns them); every call site bounds the pinned table by the
    CDC batch / filter size, so a bench pass accumulates batch-sized
    blocks, not corpus-sized ones."""
    try:
        # withCachedData = the analyzed plan AFTER CacheManager
        # substitution, so a persisted subtree shows as InMemoryRelation
        # (the bare analyzed plan would still print the original child)
        root = df._jdf.queryExecution().withCachedData()
        name = root.getClass().getSimpleName()
        if name == "Project":
            root = root.child()
            name = root.getClass().getSimpleName()
        if name in ("LogicalRDD", "InMemoryRelation"):
            return df
    except Exception:
        pass
    return _pin(df)


def bloom_membership_count(
    df: DataFrame,
    col: str,
    id_col: str,
    words: DataFrame,
    m_bits: int = 8192,
    k: int = 2,
) -> DataFrame:
    """(id, n_maybe) per id: how many of its ``col`` values the Bloom
    bitmap reports present (an upper bound on true membership — false
    positives possible, false negatives not; FP rate is set by
    m_bits/k vs the build cardinality).

    The words table broadcasts (≤ m_bits/32 rows); each probe is k
    broadcast joins + a bitwise check, so the scan side stays map-only
    until the final id-count shuffle.

    ``words`` is pinned (r13-opt): the k broadcast joins each re-print
    its subtree and Spark does not dedupe common subplans, so an
    expensive build upstream (e.g. the eval-set tokenize + shingle +
    bit_or pipeline in doc_bloom_decontaminate) would run once per
    hash. The pinned table is ≤ m_bits/32 rows — the profitable side
    of the pin trade by construction. A words table that is ALREADY a
    materialized scan (stored table / prior checkpoint) skips the pin
    instead of paying a redundant copy (r13 ADVICE).
    """
    from slacken_spark.functions.text import token_hash64

    words = _pin_unless_materialized(words.select("word_idx", "bits"))
    cur = df
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(
            token_hash64(F.concat(F.lit(f"bloom{i}_"), F.col(col))), F.lit(m_bits)
        )
        cur = (
            cur.withColumn(f"_p{i}", p)
            .withColumn(f"_w{i}", F.expr(f"_p{i} div 32"))
            .withColumn(
                f"_m{i}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(_p{i} % 32 AS INT))"),
            )
        )
    for i in range(k):
        w = words.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("bits").alias(f"_b{i}")
        )
        cur = cur.join(F.broadcast(w), F.col(f"_w{i}") == F.col(f"_wi{i}"), "left")
        cond = cond & (
            F.coalesce(F.col(f"_b{i}"), F.lit(0))
            .bitwiseAND(F.col(f"_m{i}"))
            != 0
        )
    return (
        cur.where(cond)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_maybe"))
    )


def _unpersist_local_ckpt(df: DataFrame) -> None:
    """Best-effort release of the blocks behind a materialized
    ``localCheckpoint(eager=False)`` DataFrame.

    The checkpoint lives on the plan's backing RDD (``LogicalRDD.rdd``),
    not in the CacheManager, so ``DataFrame.unpersist`` can't reach it;
    without an explicit release the blocks survive until the JVM
    garbage-collects the RDD handle — linear storage growth across an
    iterative loop's rounds. Only call this once no future plan
    references the DataFrame (an unpersisted local checkpoint cannot be
    recomputed). Silently a no-op if the JVM internals differ.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


@contextmanager
def _with_loop_partitions(spark, loop_partitions: int | None):
    """Scope ``spark.sql.shuffle.partitions`` to an iterative loop.

    Sizes the per-round shuffles to the loop's state cardinality
    (label tables are |V|-sized, far below the corpus setting) and
    restores the session value afterwards. NOT safe with CONCURRENT
    queries on the same session — pass ``None`` there and size via AQE
    instead (the ``connected_components`` docstring contract)."""
    if loop_partitions is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_partitions))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# Optional per-round telemetry hook for the contraction loop: when
# set to a callable it receives {"round", "remaining", "stalled",
# "label_passes"} after each round's action — the round-budget tests
# (tests/test_dedup_delta.py) and scale probes read convergence
# behavior through it instead of re-deriving rounds from warnings.
# None (the default) costs nothing. Set-try-finally-reset around the
# measured call; the hook is a module global, not concurrency-safe.
_round_observer = None


def _uf_min_labels(edges) -> dict:
    """Path-compressed, size-united union-find over an edge iterable;
    returns {node: min node id of its component} for every endpoint.
    The ONE local-step definition shared by the contraction engine's
    per-partition pass and ``components_add_edges``' small-graph driver
    path (dict UF measured at 0.83 M edges/s — within ~25% of the best
    vectorization on realistic graphs, NOTES r8)."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
                size[v] = 1
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if size[ra] < size[rb]:
            ra, rb = rb, ra
        parent[rb] = ra
        size[ra] += size[rb]
    mins: dict = {}
    for v in parent:
        r = find(v)
        m = mins.get(r)
        if m is None or v < m:
            mins[r] = v
    return {v: mins[find(v)] for v in parent}


def _batch_mapping(
    edges: DataFrame,
    id_a: str,
    id_b: str,
    out_a: str,
    out_b: str,
    driver_threshold: int,
    distributed,
) -> DataFrame:
    """Solve a batch-bounded component mapping with the small-graph
    driver cutoff — the ONE definition behind both CDC maintainers'
    fast paths (r9 review: the add/drop copies must not drift).

    ``count()`` materializes the persisted frame in ONE full-parallelism
    job and decides the cutoff; at or below the threshold a ``collect``
    then reads the already-cached blocks (near-free second job), the
    shared local union-find solves the rows, and the mapping re-enters
    the plan as a broadcast-sized ``(out_a, out_b)`` table; above it
    ``distributed(edges)`` runs the contraction engine over the (now
    fully materialized) persisted frame. The r9 shape used ONE
    ``take(threshold + 1)`` instead, but ``take``'s incremental
    partition scan-up (1, then ×4 waves) re-ran the frame's un-cached
    upstream — broadcast-join map lineage with no shuffle boundary to
    reuse — 3-4 times before concluding the frame was small (measured
    r13-opt: the take stages dominated the delta entry's executor
    time). Either way the driver never holds more than the edge count
    the threshold allows."""
    id_t = edges.schema[id_a].dataType.simpleString()
    edges = edges.select(id_a, id_b).persist()
    try:
        if edges.count() <= driver_threshold:
            rows = edges.collect()
            lbl = _uf_min_labels((r[0], r[1]) for r in rows)
            return edges.sparkSession.createDataFrame(
                list(lbl.items()), f"{out_a} {id_t}, {out_b} {id_t}"
            )
        return distributed(edges)
    finally:
        # the driver path consumed the rows outright; the distributed
        # engine's eager consolidation owns its output blocks — either
        # way the edge frame is dead here
        edges.unpersist()


@contextmanager
def _drain_pending(pending: list[DataFrame]):
    """Release every still-registered lazy checkpoint on scope exit
    (success or exception) — the loop's leak backstop."""
    try:
        yield
    finally:
        for c in list(pending):
            _unpersist_local_ckpt(c)


def _jump(
    labels: DataFrame, track_moved: bool = False, broadcast_map: bool = False
) -> DataFrame:
    """One pointer-jump pass over a (node, lbl) label table:
    lbl := min(lbl, lbl[lbl]), resolving each label through the table
    itself so label chains halve per pass. With ``track_moved`` the
    output carries a ``_chg`` flag (this row's label actually dropped)
    so a doubling loop can run to fixpoint on one count per pass.
    The self-join references ``labels`` twice — callers checkpoint it
    first (Spark does not dedupe common subplans). ``broadcast_map``
    hints the lookup side broadcast — callers set it when they KNOW the
    label table is small (the checkpoint's stats reset means Spark
    itself can never conclude that — see _stats_free)."""
    lmap = labels.select(F.col("node").alias("lbl"), F.col("lbl").alias("jump"))
    if broadcast_map:
        lmap = F.broadcast(lmap)
    cols = [
        F.col("node"),
        F.least(F.col("lbl"), F.coalesce("jump", "lbl")).alias("lbl"),
    ]
    if track_moved:
        cols.append((F.col("jump") < F.col("lbl")).alias("_chg"))
    return labels.join(lmap, "lbl", "left").select(*cols)


def _stats_free(df: DataFrame) -> DataFrame:
    """Rebuild a locally-checkpointed DataFrame over its OWN RDD with
    the origin statistics dropped.

    ``Dataset.localCheckpoint`` preserves the child plan's statistics
    on the resulting ``LogicalRDD`` (so one checkpoint keeps broadcast
    decisions intact), but in an ITERATIVE loop that is a trap:
    Catalyst's size-only estimator MULTIPLIES ``sizeInBytes`` across a
    join, so a self-join of round k's checkpoint doubles the
    estimate's BigInteger bit length, and the next checkpoint captures
    the product. After R checkpointed self-joins the estimate has
    O(2^R) bits and every stats lookup (join selection runs one per
    checkpoint/action) pays a Karatsuba multiplication on it —
    measured here as 0.4 s -> 40 s -> 356 s per round on a scattered
    2000-diameter chain, with the driver thread pinned in
    BigInteger.multiply (jstack, NOTES r8). Rebuilding the frame over
    the same RDD resets the leaf to the constant default estimate, so
    per-round stats stay a few machine words wide. Falls back to the
    input frame if the JVM internals differ (cost reverts to the slow
    planning, never wrong results)."""
    try:
        jdf = df._jdf
        rdd = jdf.queryExecution().analyzed().rdd()
        jspark = df.sparkSession._jsparkSession
        new_jdf = jspark.internalCreateDataFrame(rdd, jdf.schema(), False)
        return type(df)(new_jdf, df.sparkSession)
    except Exception:
        return df


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    loop_partitions: int | None = None,
) -> DataFrame:
    """Weakly-connected components of an undirected candidate-pair graph
    (LSH/SimHash near-dup pairs): every node labeled with the minimum
    node id of its component — the cluster key a keep-one-per-cluster
    dedup pass groups on.

    Algorithm: iterative min-label propagation with pointer jumping —
    each round a node takes the min of (its label, its neighbors'
    labels), then labels re-resolve through the label table
    (lbl := lbl[lbl]), collapsing chains exponentially: O(log diameter)
    rounds. Each round is ONE Spark action (the new label table is
    persisted and a changed-count aggregate materializes it) over two
    key-shuffles; label-table joins broadcast automatically once stats
    are known. State is one (node, lbl) row per node — never the
    transitive closure; each round's checkpoint blocks are freed once
    the next round materializes, so peak storage is two label tables
    (the returned DataFrame keeps the final one alive).
    ``loop_partitions`` sizes the per-round shuffles to the label-table
    cardinality (defaults to the session setting — size it to
    |V| / target-partition-rows on a cluster). NOTE: it is applied via
    ``spark.sql.shuffle.partitions`` for the duration of the loop
    (restored after), which is not safe with CONCURRENT queries on the
    same session — pass ``None`` there and size via AQE instead.
    """
    spark = pairs.sparkSession
    with _with_loop_partitions(spark, loop_partitions):
        e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        e = e.persist()
        init = (
            e.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
            .persist()
        )
        init.count()
        labels = init
        changed = None
        prev_ckpt = None
        for _ in range(max_iter):
            # neighbor-min ∪ self, one groupBy
            cand = e.join(labels, e["src"] == labels["node"]).select(
                F.col("dst").alias("node"), "lbl"
            )
            stepped = (
                cand.unionByName(labels.select("node", "lbl"))
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
            )
            # pointer jump: resolve each label through the stepped table
            jumped = _jump(stepped)
            # lazy localCheckpoint: truncates the logical plan (stepped
            # appears twice per round — without truncation the plan tree
            # doubles every round) and materializes under the SINGLE
            # changed-count action below. _stats_free resets the leaf
            # size estimate: this loop's growth is measured LINEAR
            # (bits add via the fixed edge-list stats, NOTES r8), so
            # this is hygiene against shape changes, not a live fix
            nxt = _stats_free(
                jumped.join(
                    labels.select("node", F.col("lbl").alias("old_lbl")), "node"
                )
                .select(
                    "node",
                    "lbl",
                    (F.col("lbl") != F.col("old_lbl")).cast("int").alias("chg"),
                )
                .transform(_pin)
            )
            changed = nxt.agg(F.sum("chg")).first()[0] or 0
            # the aggregate scanned every partition, so this round's
            # checkpoint is fully materialized — the previous round's
            # blocks are now unreferenced by any future plan; free them
            # instead of letting them pile up for the session lifetime
            if prev_ckpt is not None:
                _unpersist_local_ckpt(prev_ckpt)
            prev_ckpt = nxt
            labels = nxt.select("node", "lbl")
            if changed == 0:
                break
        else:
            import warnings

            warnings.warn(
                f"connected_components: no fixpoint after {max_iter} rounds"
                f" ({'unknown' if changed is None else changed} labels"
                " still changing) — labels are an upper-bound partition"
                " (components may be split); raise max_iter",
                stacklevel=2,
            )
        e.unpersist()
        init.unpersist()
        return labels.select("node", F.col("lbl").alias("component"))


def connected_components_contract(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    loop_partitions: int | None = None,
    broadcast_label_rows: int = 2_000_000,
    broadcast_label_min_edges: int = 100_000,
) -> DataFrame:
    """Weakly-connected components via per-partition union-find
    CONTRACTION — same output contract as ``connected_components``
    (every node labeled with its component's minimum node id), fewer
    global rounds on high-diameter graphs.

    Per round: (1) each partition runs a local path-compressed
    union-find over its edges and emits (node, local-tree-min) — an
    Arrow-batched ``mapInPandas``, no shuffle; (2) one groupBy
    reconciles nodes seen in several partitions to their min candidate
    label, plus one pointer jump through the label table; (3) edges
    rewrite through the labels, self-loops drop. A whole
    partition-local subgraph collapses in ONE round regardless of its
    diameter (min-label propagation needs diameter rounds; pointer
    jumping only collapses label chains, not graph paths — measured on
    this workload, NOTES r8), so small recompute subgraphs (the
    ``components_drop_edges`` shape) finish in 1-2 rounds.

    Cross-partition reconciliation alone is NOT diameter-free: on a
    high-diameter path whose edges hash-scatter so that path-adjacent
    edges rarely share a partition, min-hooking labels every node with
    its predecessor's minimum — a SHIFT, not a contraction — and the
    edge count drops by ~2 per round (measured: a hash-scattered
    2000-chain burned >10 rounds with exploding per-round cost, NOTES
    r8). The loop therefore watches its own contraction ratio: a round
    that keeps >80% of the previous round's edges is the shift
    signature, and the NEXT round closes the hook chains by pointer
    DOUBLING on the |V'|-sized label table to fixpoint before paying
    the edge relabel — log2(chain length) label-table actions, each
    sketch-sized next to an edge pass, instead of diameter edge
    passes. Healthy rounds (every measured production shape: the
    sf0.1 drop path contracts 137→42→3→2→0) never trigger it and pay
    zero extra actions; a graph that stalls WITHOUT hook chains (a
    dense slowly-contracting shape) pays one no-op label-table pass
    per stalled round — accepted, the detector can't tell the cases
    apart without exactly that pass.

    Join strategy (r14): the per-round label table is provably
    ≤ 2·|edges| rows and |edges| is MEASURED each round, so when
    |edges| sits inside [``broadcast_label_min_edges``,
    ``broadcast_label_rows``/2] every label-table join in the round
    (jump self-join, the two edge relabels, the label composition)
    carries an explicit broadcast hint — the checkpoints' reset stats
    mean Spark itself can never discover the table is small, and the
    hint turns ~4 of the ~6 per-round shuffles into map-side joins; in
    particular the |V|-sized label-composition chain evaluates fully
    map-side at consolidation instead of re-shuffling the node set once
    per round. Rounds above the upper bound keep shuffle joins (the
    table genuinely isn't broadcastable); rounds below the LOWER bound
    also keep them, because each BroadcastExchange costs ~0.1-0.2 s of
    sequential driver latency and on gate-sized rounds that DOUBLED the
    wall (measured r14) while the shuffles it replaced were nearly
    free. Both bounds are data-adaptive per round, not local-mode
    constants; size the upper one to what executors can hold (~16
    bytes of key/label per row before overhead). Each round is one action (the
    relabeled-edge count) plus one final |V|-sized consolidation; the
    contracted edge list is lazily localCheckpointed per round and the
    previous round's blocks are freed once the next materializes, and
    the final eager checkpoint lets the edge list and every per-round
    label table free too — the returned plan holds exactly one
    materialized label table. Memory per task is the distinct nodes of ONE
    partition's edges — bounded by the partition size, which
    ``loop_partitions`` (applied like ``connected_components``; not
    concurrency-safe) sizes.

    localCheckpoint blocks are executor-local — losing an executor
    mid-query fails the QUERY (deterministic, so the retry is
    idempotent), not the task; spot deployments set
    ``spark.slacken.reliableCheckpoint=true`` plus a checkpoint dir and
    every pin site here becomes reliable ``checkpoint()`` — see
    ``session.pin`` (ARCHITECTURE.md "localCheckpoint fault-tolerance
    posture"; proven result-identical in
    tests/test_reliable_checkpoint.py).
    """
    spark = pairs.sparkSession
    pending: list[DataFrame] = []
    # _drain_pending runs on BOTH exits: the full pending set on an
    # exception (a failed run leaks no blocks), the edge list and
    # per-round label tables on success — the eager consolidation at
    # the end has already materialized its own blocks by then
    with _with_loop_partitions(spark, loop_partitions), _drain_pending(pending):
        id_t = pairs.schema[id_a].dataType.simpleString()

        def local_roots(batches):
            import pandas as pd

            def edge_iter():
                for pdf in batches:
                    yield from zip(pdf.iloc[:, 0], pdf.iloc[:, 1])

            lbl = _uf_min_labels(edge_iter())
            if not lbl:
                return
            yield pd.DataFrame(
                {"node": list(lbl), "root": list(lbl.values())}
            )

        # Every lazy checkpoint registers in `pending` and deregisters
        # when explicitly released mid-loop; the finally drains
        # whatever is left — after the eager consolidation on success
        # (the returned plan holds exactly one materialized label
        # table), or mid-flight state on an exception, so a failed run
        # leaks no blocks.
        def _ckpt(df: DataFrame) -> DataFrame:
            # the stats reset is what keeps the loop's planning cost
            # flat across rounds — see _stats_free; unpersist works
            # through the rebuilt frame (same backing RDD)
            c = _stats_free(df.transform(_pin))
            pending.append(c)
            return c

        def _release(df: DataFrame) -> None:
            _unpersist_local_ckpt(df)
            try:
                pending.remove(df)
            except ValueError:
                pass

        # ONE lazy checkpoint serves both the node-set init and round 1's
        # two edge scans, so the caller's upstream plan (often a pruned
        # semi-join over the corpus pairs) computes exactly once.
        base_sel = (
            pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
            .distinct()
        )
        if loop_partitions is not None:
            # an ALREADY-distinct input lets Catalyst elide the
            # distinct's shuffle, leaking the caller's partitioning into
            # the first union-find pass (measured r9: a pre-distinct
            # persisted chain kept its 4 scattered input partitions
            # under loop_partitions=1 — the same class of silent-layout
            # leak as the r8 range-distinct-key finding). The explicit
            # repartition pins the layout; when the distinct's shuffle
            # already produces exactly this partitioning, Spark's
            # exchange pruning elides it, so the healthy path pays no
            # second shuffle.
            base_sel = base_sel.repartition(loop_partitions, "src", "dst")
        base = _ckpt(base_sel)
        labels = (
            base.select(F.col("src").alias("node"))
            .unionByName(base.select(F.col("dst").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
        )
        e = base.where(F.col("src") != F.col("dst"))
        remaining = e.count()
        prev_ckpt = base
        rounds = 0
        prev_remaining = None
        while remaining > 0 and rounds < max_iter:
            # shift-pathology detector (see docstring): last round kept
            # >80% of its edges — close hook chains before relabeling
            stalled = (
                prev_remaining is not None
                and remaining * 5 > prev_remaining * 4
            )
            # `remaining` is this round's MEASURED edge count, so the
            # label table g is provably ≤ 2·remaining rows — when that
            # bound fits a broadcast, hint every label-table join below
            # (jump self-join, both edge relabels, label composition)
            # to broadcast the label side instead of shuffle-joining.
            # _stats_free resets checkpoint stats to the default (huge)
            # estimate, so Spark can NEVER pick the broadcast itself;
            # this is the guide-§3.1 "you know the size, the optimizer
            # does not" case, and it removes ~4 of the ~6 per-round
            # shuffles (r13 verdict item 2). On an early round of a
            # 100 TB-scale graph the bound exceeds the threshold and
            # every join stays a shuffle join — the decision is
            # per-round data-adaptive, not a local-mode constant.
            # LOWER bound (measured r14): each BroadcastExchange costs
            # ~0.1-0.2 s of DRIVER latency (collect + relation build),
            # and the loop is sequential, so on gate-sized rounds
            # (hundreds of edges) 4 broadcasts/round DOUBLED the wall
            # while the 8-partition shuffles they replaced were nearly
            # free — broadcast only when the edge list is big enough
            # that the saved shuffles dominate that fixed cost.
            small = (
                remaining >= broadcast_label_min_edges
                and remaining * 2 <= broadcast_label_rows
            )
            # lazy checkpoint: the jump self-join below references g0
            # twice, and Spark does not dedupe common subplans — without
            # it the union-find pass would run twice per round
            g0 = _ckpt(
                e.mapInPandas(local_roots, schema=f"node {id_t}, root {id_t}")
                .groupBy("node")
                .agg(F.min("root").alias("lbl"))
            )
            # pointer jump: cross-partition label chains collapse here.
            # lazy localCheckpoint: g is referenced three times below
            # (both edge relabels, label composition) — without it each
            # reference would recompute the jump join over g0
            g = _ckpt(_jump(g0, broadcast_map=small))
            # g_ckpt tracks the checkpointed frame backing g — the
            # unpersist bookkeeping needs the LogicalRDD root, not a
            # projection over it
            g_ckpt = g
            label_passes = 0
            if stalled:
                # pointer doubling to fixpoint: each pass composes the
                # label table with itself, halving hook-chain depth; the
                # moved-count action also materializes the pass
                for _ in range(64):
                    gj = _ckpt(_jump(g, track_moved=True, broadcast_map=small))
                    moved = gj.where("_chg").count()
                    label_passes += 1
                    _release(g_ckpt)
                    g_ckpt = gj
                    g = gj.drop("_chg")
                    if moved == 0:
                        break
            ga = g.select(F.col("node").alias("_gn"), F.col("lbl").alias("_gl"))
            if small:
                ga = F.broadcast(ga)
            e2 = (
                e.join(ga, e["src"] == ga["_gn"])
                .select(F.col("_gl").alias("src"), "dst")
            )
            e2 = _ckpt(
                e2.join(ga, e2["dst"] == ga["_gn"])
                .select("src", F.col("_gl").alias("dst"))
                .where(F.col("src") != F.col("dst"))
                .distinct()
            )
            # ONE action: materializes the relabeled edges AND (g is in
            # their subtree) this round's label table
            prev_remaining = remaining
            remaining = e2.count()
            if prev_ckpt is not base:
                _release(prev_ckpt)
            # g (checkpointed, stays in `pending` — labels reference it
            # until the final consolidation) carries this round's labels
            # forward; g0's blocks are dead once g materialized
            _release(g0)
            prev_ckpt = e2
            e = e2
            gmap = g.select(
                F.col("node").alias("lbl"), F.col("lbl").alias("_nl")
            )
            if small:
                gmap = F.broadcast(gmap)
            labels = labels.join(gmap, "lbl", "left").select(
                "node", F.coalesce("_nl", "lbl").alias("lbl")
            )
            rounds += 1
            if _round_observer is not None:
                _round_observer(
                    {
                        "round": rounds,
                        "remaining": remaining,
                        "stalled": stalled,
                        "label_passes": label_passes,
                    }
                )
        if remaining > 0:
            import warnings

            warnings.warn(
                f"connected_components_contract: no fixpoint after"
                f" {max_iter} rounds ({remaining} cross-label edges left)"
                " — labels are an upper-bound partition (components may"
                " be split); raise max_iter",
                stacklevel=2,
            )
        # consolidate: one checkpoint materializes the composed labels,
        # then the edge list, final edge checkpoint, and every
        # per-round label table free via the pending drain — the
        # returned plan is a single |V|-sized ExistingRDD, never the
        # caller's pair list (connected_components' storage contract;
        # one extra |V|-sized action). Routed through _ckpt so (a) a
        # failure during its own materialization is drained too and
        # (b) the RETURNED frame carries the reset size estimate — a
        # caller looping labels back through repeated maintenance
        # batches would otherwise compound the product estimate across
        # calls, the same trap the in-loop reset closes.
        out = _ckpt(labels.select("node", F.col("lbl").alias("component")))
        out.count()
        pending.remove(out)
        return out


def components_add_edges(
    labels: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    loop_partitions: int | None = None,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Incremental connected-components maintenance for EDGE ADDITIONS
    — the dedup-graph member of the CDC-maintenance family: when new
    documents append to the corpus (or new candidate pairs arrive),
    the existing component labeling absorbs them WITHOUT re-running
    label propagation over the full edge set.

    Correctness rests on the labeling invariant (a component's label
    is the min node id of its members): map each new edge's endpoints
    to their CURRENT labels (unseen endpoints label themselves),
    CONTRACT — the resulting graph's nodes are component labels, its
    size is bounded by the NEW edges, never the base graph — and run
    ``connected_components_contract`` on that contracted graph (the
    union-find engine collapses each partition-local subgraph in one
    round — partition-span rounds, not diameter rounds, the same
    switch the drop path made in r8); merged
    components' new labels are mins over (old labels ∪ new node ids),
    exactly what a from-scratch run over base ∪ new edges produces.
    Relabeling is one label-table join. ADD-ONLY by construction:
    edge/document REMOVALS can split components and need the affected
    components recomputed (the same asymmetry as zone-map min/max
    stats) — this function must not be used for drops.

    The contracted graph is batch-bounded by construction, and in
    steady-state CDC it is TINY (sf0.1 gate batch: 161 edges) — paying
    a distributed loop's per-action scheduling floor for it is the
    wrong plan at any scale, so up to ``driver_threshold`` edges the
    component mapping is solved by ONE bounded take() + the shared local
    union-find (`_uf_min_labels`, ~0.83 M edges/s) and re-enters the
    plan as a broadcast-sized mapping table — the GraphX/GraphFrames
    "skip to local processing below a size cutoff" pattern. Beyond the
    threshold (a bulk backfill, not steady-state CDC) the distributed
    ``connected_components_contract`` engine takes over; pass
    ``driver_threshold=0`` to force it (the round-budget tests do).
    Either way the collect/loop is bounded by the CDC batch, never the
    base graph.

    ``labels`` is (node, component) covering every node of the base
    graph (callers coalesce singletons to their own id); returns the
    maintained (node, component) covering the base nodes plus every
    endpoint of ``new_pairs``.
    """
    la = labels.select(
        F.col("node").alias("_n"), F.col("component").alias("_c")
    )
    # pin the batch-bounded pair list once: it feeds both the
    # contraction chain and the new-node anti-join below, and the
    # caller's pair-discovery subtree (often a banded LSH join) would
    # otherwise re-run per reference (r13-opt; Spark does not dedupe
    # common subplans)
    e = _pin(new_pairs.select(id_a, id_b))
    ea = e.join(la, e[id_a] == la["_n"], "left").select(
        F.coalesce("_c", id_a).alias("_ca"), id_b
    )
    eb = ea.join(la, ea[id_b] == la["_n"], "left").select(
        "_ca", F.coalesce("_c", id_b).alias("_cb")
    )
    contracted = (
        eb.where(F.col("_ca") != F.col("_cb"))
        .select(
            F.least("_ca", "_cb").alias("id_a"),
            F.greatest("_ca", "_cb").alias("id_b"),
        )
        .distinct()
    )
    mapping = _batch_mapping(
        contracted,
        "id_a",
        "id_b",
        "_old",
        "_new",
        driver_threshold,
        lambda e: connected_components_contract(
            e, max_iter=max_iter, loop_partitions=loop_partitions
        ).select(
            F.col("node").alias("_old"), F.col("component").alias("_new")
        ),
    )
    relabeled = labels.join(
        mapping, labels["component"] == mapping["_old"], "left"
    ).select(
        "node", F.coalesce("_new", "component").alias("component")
    )
    new_nodes = (
        e.select(F.col(id_a).alias("node"))
        .unionByName(e.select(F.col(id_b).alias("node")))
        .distinct()
        .join(labels.select("node"), "node", "left_anti")
    )
    new_labeled = new_nodes.join(
        mapping, new_nodes["node"] == mapping["_old"], "left"
    ).select("node", F.coalesce("_new", "node").alias("component"))
    return relabeled.unionByName(new_labeled)


def components_drop_edges(
    labels: DataFrame,
    surviving_pairs: DataFrame,
    dropped_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    loop_partitions: int | None = None,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """Incremental connected-components maintenance for EDGE REMOVALS —
    the drop half ``components_add_edges`` documents itself unable to
    be: removing an edge can SPLIT a component, which no label-local
    rule detects, so the correct incremental shape is the zone-map
    min/max asymmetry (skipping.maintain_zone_maps): recompute the
    AFFECTED state from scratch, pass everything else through.

    Affected components are those holding a dropped edge's endpoint
    (an edge's two endpoints share a component in any valid labeling,
    so this catches every component whose edge set changed). Their
    members' SURVIVING edges — a dropped-edge-bounded number of
    components, never the corpus graph — recompute via
    ``connected_components_contract`` (the subgraph can be
    high-diameter, e.g. a split component's surviving chain, and
    contraction pays partition-span rounds instead of diameter
    rounds); members left edgeless become singletons labeled by their
    own id;
    every node of an unaffected component keeps its label untouched.
    A from-scratch run over the surviving graph produces exactly this
    labeling (min-node-id labels are per-component, so unaffected
    components' labels cannot change), which is the
    ``dedup_components_drop`` catalog oracle.

    Scale shape: the affected-component set is batch-bounded and
    broadcasts; the member semi-join prunes ``surviving_pairs`` on
    ``id_a`` alone (both endpoints of a surviving edge sat in one
    pre-drop component, so one endpoint's membership decides), and the
    propagation loop is bounded by the affected components' edges.

    ``labels`` is (node, component) covering every node (singletons
    labeled by their own id, the ``connected_components`` caller
    convention); ``surviving_pairs`` is the post-drop edge set;
    ``dropped_pairs`` the removed edges. Returns the maintained
    (node, component) over the same node set as ``labels``.
    """
    drop_nodes = (
        dropped_pairs.select(F.col(id_a).alias("node"))
        .unionByName(dropped_pairs.select(F.col(id_b).alias("node")))
        .distinct()
    )
    aff = F.broadcast(
        labels.join(drop_nodes, "node", "left_semi")
        .select("component")
        .distinct()
    )
    members = labels.join(aff, "component", "left_semi")
    sub = surviving_pairs.join(
        members.select(F.col("node").alias(id_a)), id_a, "left_semi"
    )
    # contraction propagation: the recompute subgraph is drop-batch-
    # bounded but can be HIGH-DIAMETER (a split component's surviving
    # chain) — per-partition union-find collapses it in 1-2 global
    # rounds where min-label propagation pays diameter rounds. And in
    # steady-state CDC it is TINY (sf0.1 gate batch: ~140 edges), so
    # like ``components_add_edges`` the mapping is solved through the
    # shared ``_batch_mapping`` cutoff; a bulk removal beyond the
    # threshold takes the distributed engine, and either way the cost
    # is bounded by the affected components' edges, never the corpus
    # graph. ``driver_threshold=0`` forces the loop.
    recomputed = _batch_mapping(
        sub,
        id_a,
        id_b,
        "node",
        "component",
        driver_threshold,
        lambda e: connected_components_contract(
            e, id_a=id_a, id_b=id_b, max_iter=max_iter,
            loop_partitions=loop_partitions,
        ),
    )
    passthrough = labels.join(aff, "component", "left_anti")
    isolated = (
        members.select("node")
        .join(recomputed.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return passthrough.unionByName(recomputed).unionByName(isolated)
