"""Greedy sequence packing — the pretraining sample-packing operator.

Documents scan in a deterministic order within a group and fill a pack
until the next one would exceed the token budget, then a new pack
starts. The scan is inherently sequential PER GROUP, so it runs as one
``applyInPandas`` pass per group — parallel across groups, single-pass
within. ``shards`` bounds the per-task group size for hot groups: the
group splits into ``ntile`` ranges of the scan order (contiguous, so
the greedy chain only restarts at the shard boundary — the standard
warehouse trade for unbounded groups), and packing runs per
(group, shard). Output pack ids are local to a (group, shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from slacken_spark.session import pin as _pin


def pack_greedy(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    size_col: str = "n_tokens",
    shards: int = 1,
    shard_by: str = "range",
) -> DataFrame:
    """→ (group, order, size, shard_id, pack_id) with the greedy pack
    assignment; deterministic given (group, order) uniqueness.

    One key-shuffle (on the group key, or the composite (group, shard)
    key when ``shards > 1`` — which is the point: a hot group spreads
    over ``shards`` tasks instead of serializing on one).

    ``shard_by`` picks how a group splits:

    - ``"range"``: contiguous ntile ranges of the scan order — packs
      read like the unsharded output with restarts only at shard
      boundaries, but the ntile WINDOW itself sorts each group in one
      task, so the hot group still serializes once before spreading.
      Right when groups are merely large, wrong when one group is the
      dataset.
    - ``"hash"``: map-only deterministic ``xxhash64(order) % shards``
      — no window, no per-group sort, nothing ever serializes on the
      group; each shard still packs in scan order, but consecutive
      docs land in different shards (pack composition differs from the
      unsharded chain; the budget invariant is identical). This is the
      100 TB path.
    """
    import pandas as pd

    if shard_by not in ("range", "hash"):
        raise ValueError(f"shard_by must be 'range' or 'hash', got {shard_by!r}")
    base = df.select(group_col, order_col, size_col)
    if shards > 1:
        if shard_by == "range":
            w = Window.partitionBy(group_col).orderBy(order_col)
            base = base.withColumn(
                "shard_id", (F.ntile(shards).over(w) - 1).cast("long")
            )
        else:
            base = base.withColumn(
                "shard_id",
                F.pmod(F.xxhash64(F.col(order_col)), F.lit(shards)).cast("long"),
            )
        # Force the composite-key exchange: without it Catalyst reuses
        # the window's hashpartitioning(group) for the (group, shard)
        # grouping — semantically fine, but every shard of a hot group
        # would pack inside ONE task, defeating the whole point of
        # sharding. The explicit repartition is the spread.
        base = base.repartition(group_col, "shard_id")
        keys = [group_col, "shard_id"]
    else:
        base = base.withColumn("shard_id", F.lit(0).cast("long"))
        keys = [group_col]

    fields = {f.name: f.dataType.simpleString() for f in base.schema.fields}
    out_schema = (
        f"{group_col} {fields[group_col]}, "
        f"{order_col} {fields[order_col]}, "
        f"{size_col} {fields[size_col]}, "
        "shard_id long, pack_id long"
    )
    b, gc, oc, sc = budget, group_col, order_col, size_col

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(oc).reset_index(drop=True)
        acc, pid, out = 0, 0, []
        # guard on "not the first row", NOT on acc > 0: with zero-size
        # rows an acc>0 guard would silently co-pack a later over-budget
        # row, diverging from the documented recurrence (first row opens
        # pack 0; any later row that would overflow opens a new pack)
        for idx, ntok in enumerate(pdf[sc]):
            if idx > 0 and acc + ntok > b:
                pid += 1
                acc = ntok
            else:
                acc += ntok
            out.append(pid)
        pdf["pack_id"] = pd.array(out, dtype="int64")
        return pdf[[gc, oc, sc, "shard_id", "pack_id"]]

    return base.groupBy(*keys).applyInPandas(pack, out_schema)


def quota_sample(
    df: DataFrame,
    quota,
    group_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "ntok",
    mode: str = "window",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-group token-quota downsampling: rank each group's rows by a
    deterministic md5 hash of ``id_col`` (a seeded, engine-reproducible
    spread sample), keep rows while the running ``size_col`` sum stays
    within ``quota``. Returns the KEPT rows of ``df`` (original columns).

    ``quota`` is one budget for every group (int), or a PER-GROUP dict
    ``{group_value: budget}`` — the dataset-mixer form, where each
    source gets its own allotment (e.g. temperature-scaled shares).
    Groups absent from the dict are DROPPED entirely (even their
    zero-size rows): an unlisted source in a mixing recipe must not
    leak into the published set. Dict keys must be ``str`` or ``None``
    (matching the group column's rendered value) — other key types are
    rejected rather than silently failing to match Spark's
    cast-to-string rendering (e.g. Python ``str(True)`` is ``'True'``
    but Spark renders ``'true'``).

    ``mode`` picks the physical strategy — both produce the IDENTICAL
    kept set:

    - ``"window"``: cumulative sum over a per-group window. One
      key-shuffle, but the window sorts each group in one task — right
      while every group fits a task, wrong when one group IS the
      dataset.
    - ``"hash"``: bucketed-threshold search, the 100 TB path. One
      map-only pass histograms ``sum(size)`` per (group, hash-bucket);
      a window + aggregate over that corpus-size-independent histogram
      (``n_groups × n_buckets`` rows, all executor-side — NOTHING ever
      collects to the driver, so group cardinality is bounded by the
      shuffle, not driver memory) finds each group's boundary bucket.
      Every bucket strictly below it is kept whole via a broadcast
      map-side join (NO sort, NO window on that branch — the bulk of
      the data), and only the boundary bucket's rows (~1/n_buckets of
      the group) flow through the cumulative window. Buckets are the
      high bits of the hash, so bucket order refines hash order and the
      kept set matches ``"window"`` exactly, ties included.

    NULL handling (identical in both modes): a NULL group is one group
    (SQL window-partition semantics), and NULL sizes count as 0 — a
    raw window-sum would instead poison the running total until the
    first non-null size and silently drop those leading rows. NEGATIVE
    sizes clamp to 0 in both modes: the window filter (``cum <=
    quota`` over a non-monotone running sum) and the hash boundary
    prefix scan would otherwise diverge, and a negative token count is
    a caller bug either way — the clamp keeps the two modes
    byte-identical by construction.

    Hash mode's plan scans ``df``'s lineage three times (the histogram
    branch plus the whole/edge output branches); callers with
    expensive upstream lineage should persist ``df`` first (the
    pipeline CLI and the mixing catalog query do).
    """
    if mode not in ("window", "hash"):
        raise ValueError(f"unknown quota_sample mode: {mode!r}")
    _NULL_KEY = "\x00<null>"
    qmap = None
    if isinstance(quota, dict):
        bad_keys = [k for k in quota if k is not None and not isinstance(k, str)]
        if bad_keys:
            raise ValueError(
                "quota dict keys must be str or None (Spark's cast-to-string"
                f" rendering differs from Python str() for {bad_keys[:3]})"
            )
        qmap = {
            (_NULL_KEY if k is None else k): int(v) for k, v in quota.items()
        }
    h = F.md5(F.col(id_col).cast("string"))
    # normalized group key: NULL-safe (inner joins on the raw group
    # would silently drop NULL-group rows) and type-stable for the
    # driver bounds table whatever the group column's type
    gkey = F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_KEY))
    size = F.greatest(
        F.coalesce(F.col(size_col).cast("long"), F.lit(0)), F.lit(0)
    )
    base = df.withColumn("_h", h).withColumn("_gkey", gkey).withColumn(
        "_sz", size
    )
    w_full = Window.partitionBy("_gkey").orderBy("_h", id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out_cols = df.columns
    spark = df.sparkSession
    if mode == "window":
        if qmap is None:
            return (
                base.withColumn("_cum", F.sum("_sz").over(w_full))
                .where(F.col("_cum") <= quota)
                .select(*out_cols)
            )
        if not qmap:
            return df.where(F.lit(False))
        quotas = F.broadcast(
            spark.createDataFrame(list(qmap.items()), "_gkey string, _q long")
        )
        return (
            base.join(quotas, "_gkey")  # inner: unlisted groups drop
            .withColumn("_cum", F.sum("_sz").over(w_full))
            .where(F.col("_cum") <= F.col("_q"))
            .select(*out_cols)
        )

    # hash mode: bucket = high hex chars of the hash (high bits →
    # bucket order refines full-hash string order; hex strings compare
    # bytewise so string order == value order)
    if qmap is not None and not qmap:
        return df.where(F.lit(False))  # before paying the histogram job
    n_hex = max(1, -(-(n_buckets - 1).bit_length() // 4))
    bucket = F.conv(F.substring("_h", 1, n_hex), 16, 10).cast("long")
    bucketed = base.withColumn("_bkt", bucket)
    hist = bucketed.groupBy("_gkey", "_bkt").agg(
        F.sum("_sz").cast("long").alias("_btok")
    )
    if qmap is None:
        hist = hist.withColumn("_q", F.lit(int(quota)).cast("long"))
    else:
        # inner join: an UNLISTED group gets no histogram row, hence no
        # bounds row, hence (via the output inner join) drops every row
        # — including zero-size ones, which a quota-0 bounds row would
        # keep, diverging from window mode
        quotas = F.broadcast(
            spark.createDataFrame(list(qmap.items()), "_gkey string, _q long")
        )
        hist = hist.join(quotas, "_gkey")
    # distributed prefix sum over the tiny histogram (n_groups ×
    # n_buckets rows — corpus-size independent, and unlike a driver
    # collect also group-CARDINALITY independent): the running bucket
    # total is monotone (sizes clamp to ≥ 0), so the crossing rows form
    # a suffix and min() over them recovers the FIRST crossing — the
    # boundary bucket and the tokens consumed strictly before it. A
    # group the quota never cuts gets boundary = max bucket + 1 (every
    # bucket keeps whole, no edge rows).
    w_hist = (
        Window.partitionBy("_gkey")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("_cum", F.sum("_btok").over(w_hist))
    crossed = F.col("_cum") > F.col("_q")
    bounds = (
        cum.groupBy("_gkey", "_q")
        .agg(
            F.min(F.when(crossed, F.col("_bkt"))).alias("_b0"),
            F.min(F.when(crossed, F.col("_cum") - F.col("_btok"))).alias("_p0"),
            F.max("_cum").alias("_total"),
            F.max("_bkt").alias("_maxbkt"),
        )
        .select(
            "_gkey",
            F.coalesce("_b0", F.col("_maxbkt") + 1).alias("_boundary"),
            F.coalesce("_p0", "_total").alias("_before"),
            "_q",
        )
    )
    bounds = F.broadcast(bounds)
    joined = bucketed.join(bounds, "_gkey")
    whole = joined.where(F.col("_bkt") < F.col("_boundary"))
    edge = (
        joined.where(F.col("_bkt") == F.col("_boundary"))
        .withColumn("_cum", F.sum("_sz").over(w_full))
        .where(F.col("_before") + F.col("_cum") <= F.col("_q"))
    )
    return whole.select(*out_cols).unionByName(edge.select(*out_cols))


def shard_assign(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Deterministic training-shard assignment: md5-derived
    ``shard_id = h(id) % n_shards`` as a map-only column. md5 (not
    xxhash64) so shard membership reproduces on ANY engine — the shard
    layout of a published dataset is part of its contract.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shard:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn("shard_id", (h % n_shards).cast("long"))


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    size_col: str | None = None,
) -> DataFrame:
    """Write a training corpus as ``n_shards`` deterministic parquet
    shards (``shard_id=K/`` partitions) and return the shard manifest
    (shard_id, n_rows[, n_tokens]) — the publish step of a data
    pipeline.

    ``repartition(shard_id)`` before ``partitionBy`` gives exactly one
    task per shard writing one file set (without it every task writes a
    sliver of every shard — n_tasks × n_shards small files, the classic
    write amplification). The manifest recomputes from the written data
    so it certifies what readers will actually see.
    """
    shards = shard_assign(df, id_col, n_shards)
    (
        shards.repartition(n_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    spark = df.sparkSession
    written = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias("n_tokens"))
    counts = written.groupBy(
        F.col("shard_id").cast("long").alias("shard_id")
    ).agg(*aggs)
    # A shard that received zero rows writes no partition directory, so
    # it would be silently absent from the recomputed manifest — readers
    # expecting n_shards entries couldn't tell a gap from a lost shard.
    # Left-join against the full shard range to emit explicit zero rows.
    all_shards = spark.range(n_shards).select(F.col("id").alias("shard_id"))
    fills = {"n_rows": 0}
    if size_col is not None:
        fills["n_tokens"] = 0
    return (
        all_shards.join(counts, "shard_id", "left")
        .fillna(fills)
        .select(
            "shard_id",
            F.col("n_rows").cast("long").alias("n_rows"),
            *(
                [F.col("n_tokens").cast("long").alias("n_tokens")]
                if size_col is not None
                else []
            ),
        )
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    shards: int | None = None,
    epoch: int = 1,
    rows_per_shard: int | None = None,
) -> DataFrame:
    """Deterministic training-epoch shuffle: every row gets a
    pseudorandom order key ``h = token_hash64('ep{epoch}_' || id)``, a
    shard ``pmod(h, shards)``, and its 1-based ``position`` within the
    shard in ``(h, id)`` order — the (shard, position) address a data
    loader streams an epoch from. Changing ``epoch`` reshuffles
    globally; the same ``(epoch, id)`` always lands at the same
    address, so a preempted epoch resumes bit-identically — the reason
    training pipelines want a HASH shuffle, not a random one.

    One shuffle on the shard key; the per-shard ``row_number`` sorts
    within the shard task, so SHARD SIZE IS THE SIZING CONTRACT: one
    task sorts ~|rows|/shards rows, and a fixed ``shards`` silently
    becomes a hot task when the corpus grows 100×. Pass
    ``rows_per_shard`` instead to derive the shard count from the
    actual row count (one count() action, plan-time metadata — the
    ``token_blocks``-``buckets`` knob in count-based form): shards =
    ceil(count / rows_per_shard), so the EXPECTED per-shard sort stays
    at the target whatever the corpus size (hash placement balances to
    within sampling noise — it cannot hard-bound a single shard).
    The explicit ``shards`` form remains for callers that pin layout
    width (e.g. matching an existing serving fan-out) and accept the
    sizing responsibility; passing BOTH raises (a silent preference
    would hand one caller the other's layout). Appends ``(shard, position)``.
    """
    from slacken_spark.functions.text import token_hash64

    if rows_per_shard is not None:
        if shards is not None:
            raise ValueError(
                "pass shards OR rows_per_shard, not both — an explicit "
                "shard count pins layout width, a row target derives it; "
                "silently preferring one would hand the caller a layout "
                "they did not ask for"
            )
        if rows_per_shard <= 0:
            raise ValueError(
                f"rows_per_shard must be positive: {rows_per_shard}"
            )
        n = df.count()
        shards = max(1, -(-n // rows_per_shard))
    elif shards is None:
        shards = 8
    if shards <= 0:
        raise ValueError(f"shards must be positive: {shards}")
    h = token_hash64(
        F.concat(F.lit(f"ep{epoch}_"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(shards)).cast("long"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def token_blocks(
    df: DataFrame,
    block_tokens: int,
    id_col: str = "doc_id",
    size_col: str = "ntok",
    buckets: int = 256,
) -> DataFrame:
    """Concat-and-chunk block plan — the GPT-pretraining sample layout:
    documents concatenate into one virtual token stream in ``id_col``
    order, the stream cuts into fixed ``block_tokens`` blocks, and the
    output says which slice of which document fills which block:
    ``(id, block_id, doc_offset, block_offset, n_toks)`` — one row per
    (document, block) overlap, everything integer arithmetic over
    token counts (no tokens move; this is the PLAN a loader executes).

    The global exclusive prefix sum of sizes (each document's start
    offset in the stream) is the scale problem — a bare
    ``Window.orderBy(id)`` serializes the corpus through one task.
    Instead it computes as a two-level distributed prefix sum: rows
    range-partition on the id (``repartitionByRange`` — sampled
    boundaries, so buckets stay BALANCED whatever the id distribution,
    dense or hash-derived) and cumsum within each bucket in parallel;
    the per-bucket totals — exactly ``buckets`` rows, corpus-size AND
    id-distribution independent — cumsum once and broadcast back as
    each bucket's base offset. Bucket ids are ``spark_partition_id()``
    of the range exchange: ordered like the ids by construction. The
    OUTPUT is bucketing-invariant (pinned by test), so the sampled
    boundaries never leak into the plan — ``buckets`` sizes tasks, not
    semantics; set it near the cluster's target partition count.

    Rows with ``size <= 0`` contribute nothing to the stream and emit
    no plan rows.

    The ranged (id, size) rows are pinned by a lazy localCheckpoint
    (both branches MUST agree on bucket membership and runtime
    exchange reuse silently fails in composed plans — the r11
    two-level finding), so ``df``'s lineage computes once into the
    checkpoint; the blocks live as long as the returned plan. The
    checkpoint's fault-tolerance posture — executor loss during the
    query = query retry, not task retry; reliable ``checkpoint()`` is
    the spot-deployment alternative — is documented at
    relational_ext.global_row_number and in ARCHITECTURE.md.
    """
    if block_tokens <= 0:
        raise ValueError(f"block_tokens must be positive: {block_tokens}")
    if buckets <= 0:
        raise ValueError(f"buckets must be positive: {buckets}")
    L = F.lit(block_tokens).cast("long")
    sz = F.col(size_col).cast("long")
    base = (
        df.select(F.col(id_col), sz.alias("_sz"))
        .where(sz > 0)
        .repartitionByRange(buckets, F.col(id_col))
        .withColumn("_bkt", F.spark_partition_id())
        # bucket ids FROZEN by a lazy localCheckpoint — the window and
        # totals branches must agree on bucket membership, and runtime
        # exchange reuse silently fails in composed plans (the r11
        # two-level finding; see relational_ext.global_row_number)
        .transform(_pin)
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("_start_in", F.sum("_sz").over(w_in) - F.col("_sz"))
    totals = base.groupBy("_bkt").agg(F.sum("_sz").alias("_btot"))
    w_b = (
        Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_bkt", F.coalesce(F.sum("_btot").over(w_b), F.lit(0)).alias("_off")
    )
    g = local.join(F.broadcast(offsets), "_bkt").withColumn(
        "_start", F.col("_off") + F.col("_start_in")
    )
    # exact integer division (`/` is double division — loses exactness
    # past 2^53); _start >= 0 so div == floor
    first = F.expr(f"_start div {block_tokens}L")
    last = F.expr(f"(_start + _sz - 1) div {block_tokens}L")
    rows = g.select(
        id_col,
        "_start",
        "_sz",
        F.explode(F.sequence(first, last)).alias("block_id"),
    )
    lo = F.greatest(F.col("_start"), F.col("block_id") * L)
    hi = F.least(F.col("_start") + F.col("_sz"), (F.col("block_id") + 1) * L)
    return rows.select(
        F.col(id_col),
        F.col("block_id").cast("long").alias("block_id"),
        (lo - F.col("_start")).cast("long").alias("doc_offset"),
        (lo - F.col("block_id") * L).cast("long").alias("block_offset"),
        (hi - lo).cast("long").alias("n_toks"),
    )


def hamilton_allocate(
    df: DataFrame,
    total: int,
    group_cols: list[str],
    weight_col: str,
    out_col: str = "quota",
    buckets: int = 32,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    ``total`` across groups proportionally to ``weight_col`` so the
    shares SUM TO ``total`` EXACTLY — the allocator a dataset-mixing
    recipe needs before :func:`quota_sample`'s per-group dict mode
    ("2T tokens at these source proportions" must hand each source an
    integer budget whose sum is exactly 2T; independent rounding
    drifts by up to n_groups/2).

    Each group gets ``floor(total·w/W)``; the ``total − Σfloor`` units
    left over (< n_groups) go to the largest remainders
    ``(total·w) mod W``, ties broken by the group key ascending — all
    int64 arithmetic (exact while ``total·w < 2^63``; rescale weights
    for larger corpora), so any engine reproduces the identical
    allocation and the zero-remainder groups can never receive a
    surplus unit (R ≤ #{rem > 0} by construction). NULL or negative
    weights fail the plan loudly; an all-zero weight table raises
    rather than dividing by zero.

    Scale shape: the input is an already-aggregated per-group weight
    table (group-cardinality rows); the grand total reduces once and
    broadcasts back, and the remainder ranking runs on the two-level
    :func:`~slacken_spark.operators.relational_ext.global_row_number`
    — no single-task global window even at extreme group counts.
    """
    from slacken_spark.operators.relational_ext import (
        _reserve,
        global_row_number,
    )

    if total < 0:
        raise ValueError(f"total must be nonnegative: {total}")
    _reserve(df, out_col, "_w", "_W", "_base", "_rem", "_negrem", "_rk", "_B")
    w = F.col(weight_col)
    guarded = F.when(
        w.isNull(),
        F.raise_error(F.lit("hamilton_allocate: NULL weight")),
    ).when(
        w < 0,
        F.raise_error(
            F.concat(
                F.lit("hamilton_allocate: negative weight "),
                w.cast("string"),
            )
        ),
    )
    # a fractional weight would silently TRUNCATE through cast('long')
    # (0.3/0.7 collapse to a confusing "weights sum to zero", 1.9 -> 1
    # skews the shares without warning) — the exact-integer contract
    # fails loudly instead; callers with proportions rescale to
    # integers first (r11 advice). Integer/long columns skip the check
    # (floor over int64 > 2^53 would itself be lossy through double).
    wtype = dict(df.dtypes)[weight_col]
    if wtype in ("float", "double") or wtype.startswith("decimal"):
        nonintegral = w != F.floor(w)
        if wtype in ("float", "double"):
            nonintegral = nonintegral | F.isnan(w)
        guarded = guarded.when(
            nonintegral,
            F.raise_error(
                F.concat(
                    F.lit("hamilton_allocate: non-integral weight "),
                    w.cast("string"),
                    F.lit(" (rescale proportions to integers)"),
                )
            ),
        )
    checked = df.withColumn("_w", guarded.otherwise(w.cast("long")))
    tot = checked.agg(F.sum("_w").alias("_W")).select(
        F.when(
            (F.col("_W").isNull()) | (F.col("_W") <= 0),
            F.raise_error(
                F.lit("hamilton_allocate: weights sum to zero (or empty)")
            ),
        )
        .otherwise(F.col("_W"))
        .alias("_W")
    )
    # the broadcast total/surplus frames derive FROM the frame they
    # rejoin, so every reference is dataframe-ALIAS-qualified: Spark 4
    # resolves bare names through both join children's lineage when the
    # children share a plan subtree and fails them as ambiguous (the
    # same reason nullsafe_equi_join renames its right keys)
    base = (
        checked.alias("_hal")
        .crossJoin(F.broadcast(tot.alias("_hat")))
        .select(
            *[F.col(f"_hal.`{c}`") for c in group_cols],
            F.expr(f"({int(total)}L * _hal._w) div _hat._W").alias("_base"),
            F.expr(f"({int(total)}L * _hal._w) % _hat._W").alias("_rem"),
        )
    )
    ranked = global_row_number(
        base.withColumn("_negrem", -F.col("_rem")),
        ["_negrem", *group_cols],
        buckets,
        out_col="_rk",
    )
    surplus = base.agg(
        (F.lit(int(total)) - F.sum("_base")).cast("long").alias("_B")
    )
    return (
        ranked.alias("_hrl")
        .crossJoin(F.broadcast(surplus.alias("_hrs")))
        .select(
            *[F.col(f"_hrl.`{c}`") for c in group_cols],
            (
                F.col("_hrl._base")
                + F.when(
                    F.col("_hrl._rk") <= F.col("_hrs._B"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias(out_col),
        )
    )
