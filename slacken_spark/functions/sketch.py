"""Count-Min Sketch heavy hitters (Cormode & Muthukrishnan, 2005).

The frequent-items pipeline for corpora whose term universe is too
large to shuffle exactly: pass 1 folds every occurrence into a FIXED
``depth x width`` counter grid (mergeable — map-side partial aggregation
reduces each task to at most ``depth * width`` rows before the single
tiny shuffle); the grid broadcasts; pass 2 probes it map-side per
occurrence and only occurrences whose estimate clears the threshold
enter the exact-count shuffle. CMS estimates never undercount
(``est >= true count``: every occurrence lands in its cell, collisions
only add), so the pre-shuffle filter cannot drop a true heavy hitter —
the long tail (the overwhelming mass at corpus scale) is eliminated
BEFORE the only per-term shuffle, which is the whole point.

Hashes are md5-derived (``token_hash64``), so DuckDB reproduces every
cell, every collision, and every false positive exactly — the
``doc_heavy_hitters_cms`` catalog oracle gates estimates and exact
counts both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slacken_spark.functions.text import token_hash64
from slacken_spark.session import pin as _pin


def cms_position(term: Column, row: int, width: int) -> Column:
    """Counter column of ``term`` in sketch row ``row`` — an
    independent md5-derived hash per row, reduced mod ``width``.
    ``token_hash64`` is nonnegative (60-bit), so ``%`` and ``pmod``
    agree and DuckDB's ``%`` reproduces it."""
    return token_hash64(F.concat(F.lit(f"cms{row}_"), term)) % width


def cms_sketch(
    occ: DataFrame, term_col: str = "term", depth: int = 3, width: int = 512
) -> DataFrame:
    """Build the sketch over one-row-per-occurrence input →
    ``(row, pos, c)``, at most ``depth * width`` rows total. The
    explode triples (``depth``-les) the occurrence stream but partial
    aggregation collapses each map task to grid size before the
    shuffle, so the exchange moves O(tasks * depth * width) rows
    regardless of corpus size."""
    term = F.col(term_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), cms_position(term, i, width).alias("pos")
            )
            for i in range(depth)
        ]
    )
    return (
        occ.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.pos").alias("pos"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_merge(grids: DataFrame) -> DataFrame:
    """Merge partial sketches (a union of ``cms_sketch`` outputs) into
    one grid by summing cells — THE mergeability property that lets the
    sketch build per-partition, per-shard, or per-micro-batch and
    combine losslessly: grid(A ∪ B) == merge(grid(A), grid(B)), cell
    for cell."""
    return grids.groupBy("row", "pos").agg(
        F.sum("c").cast("long").alias("c")
    )


def cms_maintain(
    grid: DataFrame,
    old_occ: DataFrame,
    new_occ: DataFrame,
    term_col: str = "term",
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Incremental CMS maintenance under a CDC replacement batch: the
    grid is LINEAR in its occurrence stream (every cell is a sum), so
    replacing documents subtracts their old occurrences' partial grid
    and adds the new ones' — ``grid' = grid − grid(old) + grid(new)``,
    cell-exact, no corpus rescan. Cells that reach zero drop (a
    from-scratch grid has no zero cells), so maintained ≡ rebuilt, row
    for row — the ``doc_heavy_hitters_delta`` catalog oracle pins it.

    ``old_occ``/``new_occ`` are one-row-per-occurrence frames of the
    REPLACED documents' old and new text — batch-bounded; the base
    grid is fixed-size. Cost at 100 TB: two batch-sized map-side
    partial aggregations plus one grid-sized merge shuffle."""
    neg = cms_sketch(old_occ, term_col, depth, width).select(
        "row", "pos", (-F.col("c")).alias("c")
    )
    pos = cms_sketch(new_occ, term_col, depth, width)
    merged = cms_merge(grid.unionByName(neg).unionByName(pos))
    return merged.where(F.col("c") != 0)


def cms_heavy_hitters(
    occ: DataFrame,
    threshold: int,
    term_col: str = "term",
    depth: int = 3,
    width: int = 512,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """→ ``(term, cms_est, n_exact)`` for every term whose CMS estimate
    reaches ``threshold``. ``cms_est = min`` over the ``depth`` probed
    cells (>= the true count, so no true heavy hitter is missed);
    ``n_exact`` is the verified count over the surviving occurrences —
    terms the sketch over-promoted (collision false positives) appear
    with their honest ``n_exact < threshold``, making the sketch's
    error observable instead of silent.

    Plan shape: the grid comes back as ``depth`` broadcast hash joins
    keyed on the probe columns (each side is the fixed-size sketch), so
    the estimate and the threshold filter are MAP-SIDE; only qualifying
    occurrences reach the per-term exact-count shuffle.

    ``sketch`` overrides the grid (a ``cms_sketch``/``cms_merge``
    result built elsewhere — e.g. accumulated over a stream); the grid
    must have been built with the SAME depth/width and cover exactly
    the probed occurrences for estimates to stay >= exact counts."""
    probes = occ.select(
        F.col(term_col).alias("term"),
        *[
            cms_position(F.col(term_col), i, width).alias(f"h{i}")
            for i in range(depth)
        ],
    )
    if sketch is None:
        # the grid feeds `depth` broadcast sides and Spark does not
        # dedupe common subplans — without sharing, each side would
        # re-tokenize and re-aggregate the corpus (depth+1 passes, not
        # the documented two). localCheckpoint is the blessed fix when
        # re-evaluation rescans the CORPUS; the checkpointed blocks are
        # grid-sized (≤ depth*width rows), not corpus-sized.
        sketch = cms_sketch(occ, term_col, depth, width).transform(_pin)
    for i in range(depth):
        side = sketch.where(F.col("row") == i).select(
            F.col("pos").alias(f"h{i}"), F.col("c").alias(f"c{i}")
        )
        probes = probes.join(F.broadcast(side), f"h{i}")
    est = F.least(*[F.col(f"c{i}") for i in range(depth)])
    return (
        probes.select("term", est.alias("est"))
        .where(F.col("est") >= threshold)
        .groupBy("term")
        .agg(
            F.min("est").cast("long").alias("cms_est"),
            F.count(F.lit(1)).cast("long").alias("n_exact"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch → approximate quantiles
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame, group_col: str, cents: Column, bin_width: int
) -> DataFrame:
    """Per-group fixed-width histogram over an integer (cents) value —
    the mergeable bounded-memory quantile sketch: where an exact
    percentile needs a per-group sort (or a full value shuffle), this
    reduces each task map-side to at most ``groups × bins`` rows
    before ONE tiny shuffle, and histograms from disjoint corpus
    slices merge by adding counts (the same mergeability contract as
    ``cms_merge``). Bin ids are exact integer floor division
    (nonnegative cents), so both engines place every value in the
    same bin. Returns ``(grp, bin, n)``."""
    if bin_width < 1:
        raise ValueError(f"bin_width must be >= 1, got {bin_width}")
    binned = df.select(
        F.col(group_col).alias("grp"), cents.cast("long").alias("_c")
    ).select("grp", F.expr(f"_c div {bin_width}").alias("bin"))
    return binned.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def histogram_quantiles(
    hist: DataFrame, bin_width: int, percents: list[int]
) -> DataFrame:
    """Approximate per-group quantiles from a ``histogram_sketch``:
    for each integer percent p, the UPPER CENTS BOUND of the first bin
    whose cumulative count reaches ``ceil(n·p/100)`` — error bounded
    by ``bin_width`` by construction, which is the sketch trade. All
    arithmetic is int64 (the ceil is ``(n·p + 99) div 100``), so the
    answer is engine-exact even though it approximates the true
    quantile. Touches only sketch-sized rows: one cumulative window +
    one group aggregation over ``groups × bins``."""
    from pyspark.sql import Window as W

    if not percents or any(not 1 <= p <= 100 for p in percents):
        raise ValueError(f"percents must be in [1, 100], got {percents}")
    w_cum = (
        W.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy("grp")
    cur = hist.select(
        "grp",
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("ntot"),
    )
    aggs = [F.max("ntot").cast("long").alias("n")]
    for p in percents:
        thr = F.expr(f"(ntot * {p} + 99) div 100")
        ub = F.expr(f"(bin + 1) * {bin_width}")
        aggs.append(
            F.min(F.when(F.col("cum") >= thr, ub))
            .cast("long")
            .alias(f"q{p}_ub_cents")
        )
    return cur.groupBy("grp").agg(*aggs)


def histogram_merge(cells: DataFrame) -> DataFrame:
    """Merge partial histograms (per-slice, per-micro-batch, or the
    signed frames CDC maintenance unions) by adding counts per
    (grp, bin) — the ONE definition of the sketch's mergeability,
    mirroring ``cms_merge``."""
    return cells.groupBy("grp", "bin").agg(
        F.sum("n").cast("long").alias("n")
    )


def histogram_maintain(
    hist: DataFrame,
    old_rows: DataFrame,
    new_rows: DataFrame,
    group_col: str,
    cents,
    bin_width: int,
) -> DataFrame:
    """Incremental histogram maintenance under a CDC replacement batch
    — the quantile-sketch twin of ``cms_maintain``: a histogram is
    LINEAR in its row stream (every bin count is a sum), so replacing
    rows subtracts their old bins and adds the new ones' —
    ``hist' = hist − hist(old) + hist(new)``, bin-exact, no corpus
    rescan. Bins that reach zero drop (a from-scratch histogram has no
    zero bins), so maintained ≡ rebuilt, row for row. Cost at 100 TB:
    two batch-sized map-side partial aggregations plus one
    sketch-sized merge shuffle — the stored quantile sketch stays
    current without re-scanning values."""
    neg = histogram_sketch(old_rows, group_col, cents, bin_width).select(
        "grp", "bin", (-F.col("n")).alias("n")
    )
    pos = histogram_sketch(new_rows, group_col, cents, bin_width)
    merged = histogram_merge(hist.unionByName(neg).unionByName(pos))
    return merged.where(F.col("n") != 0)


# ---------------------------------------------------------------------------
# HyperLogLog register table → mergeable distinct counting
# ---------------------------------------------------------------------------

# token_hash64 yields 60 nonnegative bits; the low `p` index a register,
# the remaining 60 − p feed the leading-zero rank. rho caps at 61 − p
# (the all-zero suffix).
_HLL_HASH_BITS = 60


def hll_registers(
    occ: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """HyperLogLog register TABLE per group (Flajolet et al. 2007) —
    ``(*group_cols, reg, rho)``, one row per non-empty register, at
    most ``2**p`` rows per group whatever the cardinality.

    This is the distinct-counting analog of ``cms_sketch``'s grid: the
    REGISTERS are the artifact, all-integer and max-mergeable, so they
    build per-partition/shard/micro-batch (map-side partial max before
    one register-sized shuffle), combine losslessly
    (``regs(A ∪ B) == hll_merge(regs(A), regs(B))``, row for row), and
    store as a tiny table a CDC maintainer keeps current — where
    Spark's ``approx_count_distinct`` hides its sketch inside one
    opaque aggregate you can neither persist nor maintain. Estimates
    derive on demand (:func:`hll_estimate`); the register table itself
    is hash-exact across engines (md5-derived ``token_hash64``), so an
    oracle gates every register, not a tolerance band.

    ``rho`` = 1 + leading zeros of the (60 − p)-bit suffix, computed
    portably as ``61 − p − bit_length(suffix)`` with ``bin()`` string
    length (both engines lack an integer bit_length; float log2 rounds
    wrong exactly at the powers of two that matter here).
    """
    if not (2 <= p <= 16):
        raise ValueError(f"p must be in [2, 16]: {p}")
    m = 1 << p
    h = token_hash64(
        F.concat(F.lit("hll_"), F.col(value_col).cast("string"))
    )
    # NULL values are ignored, matching count_distinct /
    # approx_count_distinct — without the filter a null would hash to
    # null and land as a phantom (group, null, null) register row
    occ = occ.where(F.col(value_col).isNotNull()).select(
        *group_cols, h.alias("_h")
    )
    w = F.expr(f"_h div {m}")
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    return (
        occ.select(
            *group_cols,
            (F.col("_h") % m).cast("int").alias("reg"),
            (F.lit(_HLL_HASH_BITS + 1 - p) - bitlen).cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge partial register tables (a union of :func:`hll_registers`
    outputs) by per-register max — the mergeability that makes the
    sketch shardable and streamable. Max is add-monotone, so the table
    supports APPEND-ONLY maintenance; value deletions cannot lower a
    register (the same one-directional asymmetry as zone-map min/max —
    a delete-heavy workload recomputes affected groups instead)."""
    return regs.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_maintain(
    base_regs: DataFrame,
    batch_occ: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """Incremental register maintenance under an APPEND batch:
    ``regs' = hll_merge(regs ∪ regs(batch))`` — batch-bounded work (one
    batch-sized partial max + one register-sized merge shuffle, no
    corpus rescan), maintained ≡ rebuilt row for row. Appends only, by
    construction of max (see :func:`hll_merge`)."""
    batch = hll_registers(batch_occ, group_cols, value_col, p)
    return hll_merge(base_regs.unionByName(batch), group_cols)


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """→ ``(*group_cols, est)`` distinct-count estimates from a
    register table: the standard HLL estimator with the small-range
    linear-counting correction (the regime every gate-scale group sits
    in; raw HLL takes over past 2.5·m). Floating-point — for tests and
    reports; exactness gates belong on the register table itself.

    ``p`` must match the build precision. A LARGER build-p is detected
    and fails loudly (reg/nz exceed this p's register count); a
    SMALLER one is structurally indistinguishable from sparse data, so
    carry ``p`` alongside any stored register table."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    # an UNMERGED union of partials (duplicate (group, reg) rows)
    # would pass the p-mismatch guard whenever nz <= m and silently
    # inflate both the nonzero count and the harmonic sum — so merge
    # first (idempotent on already-merged input, one register-sized
    # shuffle; r10 advice)
    regs = hll_merge(regs, group_cols)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.count(F.lit(1)).alias("_nz"),
        F.max("reg").alias("_maxreg"),
        F.max("rho").alias("_maxrho"),
    )
    # a register table built with a DIFFERENT p is detectable and must
    # fail loudly, not return a plausible float: a larger build-p
    # leaves reg >= m (and nz > m); a smaller one leaves rho beyond
    # this p's 61-p cap (the zero-register count would go negative and
    # the estimator silently degrades otherwise)
    mismatch = (
        (F.col("_nz") > m)
        | (F.col("_maxreg") >= m)
        | (F.col("_maxrho") > _HLL_HASH_BITS + 1 - p)
    )
    agg = agg.withColumn(
        "_s",
        F.when(
            mismatch,
            F.raise_error(
                F.lit(
                    f"hll_estimate: register table inconsistent with p={p} "
                    "(built with a different precision?)"
                )
            ),
        ).otherwise(F.col("_s")),
    )
    # empty registers contribute 2^0 = 1 each to the harmonic sum
    zeros = F.lit(m) - F.col("_nz")
    raw = F.lit(alpha * m * m) / (F.col("_s") + zeros)
    linear = F.lit(m) * F.log(F.lit(float(m)) / zeros)
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("est"))


def hll_intersection_estimate(
    regs_a: DataFrame, regs_b: DataFrame, group_cols: list[str], p: int = 9
) -> DataFrame:
    """→ ``(*group_cols, est_a, est_b, est_union, est_intersection)``
    per group present in EITHER table — sketched set arithmetic over
    two register tables built with the SAME p from the SAME value
    domain: union registers are the per-register max (exact at the
    register level — the HLL union has no estimation error beyond the
    sketches themselves), intersection by inclusion–exclusion
    (|A∩B| ≈ |A| + |B| − |A∪B|, clamped at 0 — the standard
    cross-corpus overlap dashboard: 'how many of crawl B's documents
    did crawl A already contain', at register-table cost instead of an
    exact distinct join). Groups absent from one side contribute an
    empty sketch (est 0) rather than dropping the group."""
    from slacken_spark.operators.relational_ext import nullsafe_equi_join

    a = hll_estimate(regs_a, group_cols, p).withColumnRenamed("est", "est_a")
    b = hll_estimate(regs_b, group_cols, p).withColumnRenamed("est", "est_b")
    u = hll_estimate(
        hll_merge(regs_a.unionByName(regs_b), group_cols), group_cols, p
    ).withColumnRenamed("est", "est_union")
    # null-SAFE joins: a NULL group key (e.g. lang unknown) is a real
    # group to groupBy, and plain equality would zero both sides and
    # clamp its overlap to 0 (the r10 high-review's confirmed failure)
    out = (
        nullsafe_equi_join(u, a, group_cols, "left")
        .transform(lambda d: nullsafe_equi_join(d, b, group_cols, "left"))
        .select(
            *group_cols,
            F.coalesce("est_a", F.lit(0.0)).alias("est_a"),
            F.coalesce("est_b", F.lit(0.0)).alias("est_b"),
            "est_union",
        )
    )
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return out.withColumn("est_intersection", inter)
