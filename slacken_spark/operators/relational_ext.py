"""Relational operators Spark lacks natively: as-of join, sessionization,
range-bucket join. Declarative compositions only — Catalyst plans them,
AQE sizes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from slacken_spark.session import pin as _pin


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward') or the earliest right
    row with ``right_ts >= left_ts`` (direction='forward') sharing the
    ``on`` key.

    Implementation: union-tag + window last_value, the scale-safe plan —
    ONE shuffle on the key (no range cross-product). Right-side ties on
    (ts) break deterministically: backward takes the max right_cols
    tuple among equal-ts rights, forward the min (both directions match
    a right row with ts == left_ts, like ``pd.merge_asof``).
    """
    if direction not in ("backward", "forward"):
        raise NotImplementedError("direction must be 'backward' or 'forward'")
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
    )
    lt = lt.withColumn("_rrow", F.lit(None).cast(rt.schema["_rrow"].dataType))
    rt = rt.withColumn("_lrow", F.lit(None).cast(lt.schema["_lrow"].dataType))
    both = lt.unionByName(rt.select(lt.columns))
    # right rows sort before left rows at equal ts (_side desc → right=1
    # first), so an equal-ts right is visible to the left row in both
    # directions. Scanning order flips with the direction: backward scans
    # ts ascending (last right seen = latest right ≤ left_ts; among
    # equal-ts rights the max _rrow tuple is nearest), forward scans ts
    # descending (last right seen = earliest right ≥ left_ts; min _rrow
    # nearest).
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").desc(), F.col("_rrow").asc()]
    else:
        order = [F.col("_ts").desc(), F.col("_side").desc(), F.col("_rrow").desc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.withColumn("_match", F.last("_rrow", ignorenulls=True).over(w))
    out = filled.where(F.col("_side") == 0).select("_lrow.*", "_match.*")
    return out


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_seconds: int
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``.

    lag + conditional cumsum — one shuffle on the user key.
    Adds ``session_id`` (0-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # timestampdiff is pure field arithmetic on both TIMESTAMP and
    # TIMESTAMP_NTZ — no session-timezone involvement, so gaps are exact
    # across DST transitions (a cast-to-epoch route is off by ±3600s
    # when the two events straddle a transition in a DST session tz).
    # Compared at MICROSECOND precision: a SECOND diff truncates, which
    # would silently merge sessions whose true gap is in
    # (gap_seconds, gap_seconds + 1) — with sub-second timestamps that
    # boundary is live data, not a corner case.
    prev = F.lag(ts_col).over(w)
    gap_us = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    new_sess = F.when(
        prev.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def _hash_salt(cols: list, salt_buckets: int):
    """The repo's ONE deterministic salt expression:
    ``pmod(hash(cols), buckets)``. Salts must never come from
    rand()/partition-id — a partially replayed shuffle stage would
    re-salt rows into different buckets than the surviving map outputs
    (the SPARK-23207 class of silent row loss/duplication). Callers
    pick ``cols`` so the salt varies WITHIN the hot key (the whole row
    for salted join/agg, the sort key for grouped_topk)."""
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(salt_buckets))


def salted_join(
    left: DataFrame,
    right_small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side across every
    salt — turning one hot reducer into ``salt_buckets`` even ones.
    Semantically identical to ``left.join(right_small, on)``.

    Use when AQE's runtime skew split isn't available (e.g. the skewed
    side feeds a custom operator) and the right side is small enough to
    replicate ×salt_buckets but too big to broadcast outright.

    The salt hashes the WHOLE left row, not the join key: it must vary
    WITHIN a hot key to spread it across reducers, and it must be
    deterministic under task retries (never rand()/partition-id — a
    partially replayed shuffle stage would re-salt rows into different
    buckets than the surviving map outputs, the SPARK-23207 class of
    silent row loss/duplication). Exact duplicate rows share a salt and
    colocate — correct, merely less spread for a degenerate all-dup key.
    MapType columns are not hashable in Spark — such an input fails
    loudly at plan time (project them away or to map_entries first).

    ``salt_cols`` points the salt at specific left columns when the
    whole-row hash gives no spread — a hot key whose NON-key payload
    is constant/low-cardinality hashes its rows into one or few
    buckets, and a MapType payload fails the hash at plan time; pass a
    high-cardinality column (a row id, an event timestamp) to restore
    the spread in both cases (r10 advice). Correctness is unaffected
    by the choice — any deterministic salt is valid; only the spread
    changes.
    """
    _reserve(left, "_salt")
    _reserve(right_small, "_salt")
    salted_l = left.withColumn(
        "_salt", _hash_salt(salt_cols or left.columns, salt_buckets)
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("_salt")
    salted_r = right_small.select("*", salts)
    return salted_l.join(salted_r, [on, "_salt"]).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe aggregation: two-phase partial → final over a salted
    key. ``aggs`` maps output column → 'sum'|'count'|'min'|'max' of an
    input column expressed as 'fn:col'. Spark's built-in aggregations
    already do map-side partial aggregation, so this explicit form is for
    pipelines where a single reducer key would still overflow (e.g.
    collect_list on a hot key) — the same technique the engine applies
    implicitly elsewhere, made available as an operator.

    Deterministic whole-row hash salt, same rationale (and same
    ``salt_cols`` escape hatch for constant/low-cardinality payloads
    or MapType columns) as :func:`salted_join` — varies within the hot
    key, stable under retries.
    """
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    refn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _reserve(df, "_salt")
    salted = df.withColumn(
        "_salt", _hash_salt(salt_cols or df.columns, salt_buckets)
    )
    partial = salted.groupBy(key, "_salt").agg(
        *[
            fns[spec.split(":")[0]](spec.split(":")[1]).alias(out)
            for out, spec in aggs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            refn[spec.split(":")[0]](out).alias(out)
            for out, spec in aggs.items()
        ]
    )


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Range join (left.val BETWEEN right.lo AND right.hi) via bucketization.

    Each right interval explodes into the buckets it covers; the join is
    then an equi-join on the bucket id plus a residual filter — turning a
    nested-loop range join into one shuffle. Bucket width should match
    the typical interval width.
    """
    lb = left.withColumn("_bucket", (F.col(left_val) / bucket_width).cast("long"))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("long"),
                (F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    return lb.join(rb, "_bucket").where(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi))
    ).drop("_bucket")


def _reserve(df: DataFrame, *names: str) -> None:
    """Raise when the input already carries one of the operator's
    internal temp/output column names — withColumn would silently
    REPLACE the caller's column and the trailing drop() would delete
    it (ranks computed on the wrong values beat a loud error only
    until someone reads the output)."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"input columns collide with reserved names: {clash}"
        )


def nullsafe_equi_join(
    left: DataFrame, right: DataFrame, on: list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join on ``on`` treating NULL == NULL as a match (SQL's
    ``<=>``), returning the join columns ONCE like the list form of
    ``join``. groupBy keeps NULL as a real group, so any operator that
    aggregates per group and joins the result back on the group key
    with plain equality silently DROPS every NULL-group row — the
    confirmed r10 failure of the two-level rank/scan offsets join and
    the quantile target join. EqualNullSafe is a valid hash/broadcast
    join key, so plan shape is unchanged."""
    # the __r_ names are reserved on BOTH frames: a pre-existing
    # __r_<key> on the RIGHT would collide with the rename below and
    # surface later as an ambiguous-reference error instead of this
    # message (r10 advice)
    _reserve(left, *[f"__r_{c}" for c in on])
    _reserve(right, *[f"__r_{c}" for c in on])
    rr = right
    for c in on:
        rr = rr.withColumnRenamed(c, f"__r_{c}")
    # renamed right keys make NAME-based resolution unambiguous even
    # when both sides share lineage (the offsets joins are self-joins
    # of one range exchange)
    cond = None
    for c in on:
        e = F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        cond = e if cond is None else (cond & e)
    out = left.join(rr, cond, how)
    if how in ("left", "leftouter", "left_outer", "inner"):
        return out.drop(*[f"__r_{c}" for c in on])
    raise ValueError(f"unsupported how: {how}")


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    buckets: int = 32,
    out_col: str = "rank",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Exact global 1-based row number in ``order_cols`` order — the
    scale-safe form of ``row_number().over(Window.orderBy(...))``,
    which moves the ENTIRE input through one task (Spark itself warns
    "No Partition Defined for Window operation"). With
    ``partition_cols`` the rank restarts per group — the scale-safe
    form of ``Window.partitionBy(group)`` when groups are few/huge
    (one reducer per group otherwise).

    Two-level distributed prefix count, the same shape as
    ``token_block_plan``'s offset sum (functions/packing.py): rows
    range-partition on (group, order key) — sampled boundaries keep
    buckets balanced whatever the distribution, and a huge group just
    spans several buckets — row_number runs within each
    (bucket, group) in parallel, and the per-(bucket, group) COUNTS
    (≤ buckets + n_groups − 1 rows: the range split gives each bucket
    one group run, input-size independent) prefix-sum per group and
    broadcast back as base offsets. The output is bucketing-invariant
    (pinned by test), so ``buckets`` sizes tasks, never semantics.

    ``order_cols`` must be a total order within each group for the
    rank to be deterministic — same contract as the window form;
    tie-break with a unique id column (pure order statistics like
    quantiles don't need it: tied rows carry equal values).

    Intended for FEW huge groups (the case the plain partitioned
    window serializes): the offsets table — and its forced broadcast —
    grows with the group count, so with MANY small groups use the
    plain ``Window.partitionBy(group)`` instead, where each reducer's
    group is small by assumption.

    Correctness requires the local and totals branches to read ONE
    materialization of the range exchange (``_bkt`` is
    spark_partition_id of that exchange). Through r10 this leaned on
    Spark's runtime exchange/stage reuse — and r11's scale probes
    showed that reuse SILENTLY FAILS in composed plans (attaching one
    more broadcast branch over the same lineage was enough): the two
    branches then sample range boundaries independently (the sample
    seed derives from the RDD id) and disagree on bucket membership —
    nondeterministically wrong ranks, no error. The bucket ids are
    therefore now FROZEN by a lazy ``localCheckpoint`` of the ranged
    rows: both branches read the one computed RDD, whatever the
    optimizer does around them, under any exchange-reuse setting. The
    checkpoint blocks live as long as the returned plan (the
    ``apply_delta`` convention) — the honest price of an exact global
    order statistic.

    Fault-tolerance posture: ``localCheckpoint`` blocks are
    EXECUTOR-LOCAL and lineage is truncated, so losing an executor
    mid-query fails the QUERY, not the task — Spark cannot recompute
    the pinned rows, where a pure shuffle-backed plan would retry. The
    query is deterministic and side-effect-free, so the recovery is an
    idempotent query retry; spot/preemptible deployments that can't
    afford that set ``spark.slacken.reliableCheckpoint=true`` plus a
    checkpoint dir — this site routes through ``session.pin`` and
    becomes reliable ``checkpoint()`` (see ARCHITECTURE.md
    "localCheckpoint fault-tolerance posture"; the reference batches
    work for exactly this reason, BrackenWeights.scala:359-374).
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive: {buckets}")
    _reserve(df, "_bkt", "_rn_in", "_boff", out_col)
    pc = list(partition_cols or [])
    cols = [F.col(c) for c in pc + list(order_cols)]
    base = df.repartitionByRange(buckets, *cols).withColumn(
        "_bkt", F.spark_partition_id()
    ).transform(_pin)
    w_in = Window.partitionBy("_bkt", *pc).orderBy(*[F.col(c) for c in order_cols])
    local = base.withColumn("_rn_in", F.row_number().over(w_in))
    totals = base.groupBy("_bkt", *pc).agg(F.count(F.lit(1)).alias("_bn"))
    w_b = (
        Window.partitionBy(*pc) if pc else Window
    ).orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", *pc, F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff")
    )
    # null-SAFE on the partition cols: groupBy kept a NULL group in the
    # offsets, and a plain equi-join would silently drop its rows
    return (
        nullsafe_equi_join(local, F.broadcast(offsets), ["_bkt", *pc])
        .withColumn(out_col, (F.col("_boff") + F.col("_rn_in")).cast("long"))
        .drop("_bkt", "_rn_in", "_boff")
    )


def global_ntile(
    df: DataFrame,
    n_tiles: int,
    order_cols: list[str],
    buckets: int = 32,
    out_col: str = "tile",
) -> DataFrame:
    """Exact ``ntile(n)`` over a global order, distributed — SQL ntile
    semantics (the first ``n_rows mod n_tiles`` tiles hold one extra
    row), computed from :func:`global_row_number` plus the closed-form
    tile formula; the row count is the MAX RANK — a broadcast
    single-row aggregate over the already-ranked lineage, so its
    exchanges are reused rather than re-scanning the source, nothing
    serializes through one task, and no action runs at plan time."""
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive: {n_tiles}")
    _reserve(df, "_grank", "_n", out_col)
    ranked = global_row_number(df, order_cols, buckets, out_col="_grank")
    n_row = ranked.agg(F.max("_grank").alias("_n"))
    # SQL ntile: the first rem = n mod k tiles hold big = n div k + 1
    # rows each, the rest n div k. Integer `div` throughout (`/` is
    # double division — loses exactness past 2^53). n < k degenerates
    # to one row per tile: cutoff == n, the WHEN branch covers every
    # row and the ELSE's div-by-zero never evaluates (CASE
    # short-circuits per row, so ANSI mode stays happy).
    k = int(n_tiles)
    tile = F.expr(
        f"CASE WHEN _grank <= ((_n div {k}) + 1) * (_n % {k}) "
        f"THEN (_grank - 1) div ((_n div {k}) + 1) + 1 "
        f"ELSE (_n % {k}) + "
        f"(_grank - 1 - ((_n div {k}) + 1) * (_n % {k})) div (_n div {k}) + 1 "
        f"END"
    )
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(out_col, tile.cast("long"))
        .drop("_grank", "_n")
    )


def grouped_exact_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: list[float],
    buckets: int = 32,
) -> DataFrame:
    """EXACT per-group quantiles with linear interpolation (SQL
    ``quantile_cont`` / Spark ``percentile`` semantics), as two
    distributed passes instead of Spark's exact-percentile aggregate —
    that aggregate buffers a value→count map per group on one reducer,
    so a continuous-domain column with few groups concentrates the
    whole corpus's distinct values into single-task state.

    Pass 1: :func:`global_row_number` ranks values within each group
    (two-level range-partitioned prefix count — every stage bounded).
    Pass 2: each (group, percentile) needs at most TWO ranks
    (floor/ceil of the interpolation position, from the group's
    non-null count); those target ranks — ``groups × percentiles × 2``
    rows — broadcast-join back onto the ranked values and interpolate
    with the engines' shared bitwise formula
    ``(hi − pos)·v_lo + (pos − lo)·v_hi``.

    Nulls are ignored (both engines' semantics). Returns one row per
    (group, percentile): ``(*group_cols, p double, q double, n long)``
    with ``n`` the group's non-null value count — a group whose values
    are ALL null still emits its rows with ``q`` null and ``n`` 0,
    exactly like the percentile aggregate.
    """
    bad = [p for p in percentiles if not (0.0 <= float(p) <= 1.0)]
    if bad:
        raise ValueError(f"percentiles must be in [0, 1]: {bad}")
    _reserve(df, "p", "q", "n", "_vrank", "_pos", "_lo", "_hi", "_t")
    vals = df.select(*group_cols, value_col).where(
        F.col(value_col).isNotNull()
    )
    ranked = global_row_number(
        vals, [value_col], buckets, out_col="_vrank",
        partition_cols=group_cols,
    )
    # count(value) skips nulls but keeps every group — all-null groups
    # carry n = 0 and take the left-join null-q path below
    counts = df.groupBy(*group_cols).agg(
        F.count(value_col).cast("long").alias("n")
    )
    p_arr = F.array(*[F.lit(float(p)) for p in percentiles])
    want = counts.select(*group_cols, "n", F.explode(p_arr).alias("p"))
    pos = F.col("p") * (F.col("n") - 1).cast("double")  # 0-based
    targets = (
        want.where(F.col("n") > 0)
        .select(
            *group_cols, "p", pos.alias("_pos"),
            F.floor(pos).cast("long").alias("_lo"),
            F.ceil(pos).cast("long").alias("_hi"),
        )
        .select(
            *group_cols, "p", "_pos", "_lo", "_hi",
            F.explode(F.array_distinct(F.array("_lo", "_hi"))).alias("_t"),
        )
        .withColumn("_vrank", F.col("_t") + 1)  # ranks are 1-based
        .drop("_t")
    )
    # null-safe: a NULL group key is a real group to the percentile
    # aggregate, and must hit its targets here too
    hit = nullsafe_equi_join(
        ranked, F.broadcast(targets), [*group_cols, "_vrank"]
    )
    v = F.col(value_col).cast("double")
    agg = hit.groupBy(*group_cols, "p").agg(
        F.first("_pos").alias("_pos"),
        F.first("_lo").alias("_lo"),
        F.first("_hi").alias("_hi"),
        F.max(F.when(F.col("_vrank") == F.col("_lo") + 1, v)).alias("_vlo"),
        F.max(F.when(F.col("_vrank") == F.col("_hi") + 1, v)).alias("_vhi"),
    )
    # the two-sided weighted form — bitwise what Spark's Percentile
    # (getPercentile) and DuckDB's quantile_cont both evaluate; the
    # algebraically-equal v_lo + frac·(v_hi − v_lo) differs in the
    # last ulp on real data and fails exact-equality gates
    q = F.when(F.col("_lo") == F.col("_hi"), F.col("_vlo")).otherwise(
        (F.col("_hi").cast("double") - F.col("_pos")) * F.col("_vlo")
        + (F.col("_pos") - F.col("_lo").cast("double")) * F.col("_vhi")
    )
    quant = agg.select(*group_cols, "p", q.alias("q"))
    return nullsafe_equi_join(want, quant, [*group_cols, "p"], "left").select(
        *group_cols, "p", "q", "n"
    )


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    salt_buckets: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group with exact ``row_number`` ranks — the
    scale-safe form of ``Window.partitionBy(group)`` + ``rank <= k``
    when groups are FEW and HUGE: the plain window gives each group one
    reducer, so a 5-group corpus runs 5 tasks however big the data.

    Two-level: a deterministic hash salt fans each group into
    ``salt_buckets`` sub-windows that each keep their local top-k in
    parallel; the survivors — at most ``groups × salt_buckets × k``
    rows, input-size independent — re-rank in the exact group window.
    A true top-k row can never be eliminated early: beating it inside
    its salt bucket requires k group rows that also beat it globally.
    The salt hashes the order columns, so the result is deterministic
    under task retries (never salt with rand()/partition-id: a retried
    stage would re-salt and the stage-1 FILTER would see different
    rows). ``order_cols`` are column names or ``(name, ascending)``
    pairs (plain names sort ascending), and must total-order rows
    within a group — same contract as the window form.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if salt_buckets <= 0:
        raise ValueError(f"salt_buckets must be positive: {salt_buckets}")
    _reserve(df, "_salt", "_rn1", rank_col)
    names, order = [], []
    for c in order_cols:
        name, asc = (c, True) if isinstance(c, str) else c
        names.append(name)
        order.append(F.col(name).asc() if asc else F.col(name).desc())
    # hash the row's sort key for the salt: deterministic, and ties
    # colliding into one bucket cannot break correctness (only shrink
    # stage-1 parallelism for a pathologically constant sort key)
    salted = df.withColumn("_salt", _hash_salt(names, salt_buckets))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    local = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        local.withColumn(rank_col, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_col) <= k)
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    buckets: int = 32,
    out_col: str = "cum",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sum of ``value_col`` in ``order_cols``
    order — the scan primitive, distributed: the scale-safe form of
    ``sum(v).over(Window.orderBy(...))``, which moves the whole input
    through one task exactly like the rank case
    (:func:`global_row_number`, whose two-level shape this generalizes:
    rank IS the prefix sum of the constant 1).

    Same machinery, same contracts: rows range-partition on
    (group, order key); per-(bucket, group) running sums compute in
    parallel; the per-(bucket, group) TOTALS (bounded by
    buckets + groups − 1 rows) prefix-sum per group and broadcast back
    as base offsets. ``order_cols`` must total-order rows within a
    group for a deterministic scan; output is bucketing-invariant;
    the bucket ids are FROZEN by a lazy ``localCheckpoint`` of the
    ranged rows — see :func:`global_row_number` for why runtime
    exchange reuse cannot be trusted to keep the two branches agreeing
    (the r11 finding) and for the fault-tolerance posture the
    checkpoint implies (executor loss = query retry, not task retry;
    ARCHITECTURE.md has the reliable-checkpoint alternative for spot
    deployments). Sums are int64 — the caller keeps weights
    inside the 64-bit budget (token counts at 100 TB: ~10^14,
    comfortable).
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive: {buckets}")
    _reserve(df, "_bkt", "_ps_in", "_boff", out_col)
    pc = list(partition_cols or [])
    cols = [F.col(c) for c in pc + list(order_cols)]
    base = df.repartitionByRange(buckets, *cols).withColumn(
        "_bkt", F.spark_partition_id()
    ).transform(_pin)
    w_in = (
        Window.partitionBy("_bkt", *pc)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn(
        "_ps_in", F.sum(F.col(value_col)).over(w_in).cast("long")
    )
    totals = base.groupBy("_bkt", *pc).agg(
        F.sum(F.col(value_col)).cast("long").alias("_bn")
    )
    w_b = (
        Window.partitionBy(*pc) if pc else Window
    ).orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt", *pc, F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff")
    )
    # null-SAFE on the partition cols — same rationale as
    # global_row_number's offsets join
    return (
        nullsafe_equi_join(local, F.broadcast(offsets), ["_bkt", *pc])
        .withColumn(out_col, (F.col("_boff") + F.col("_ps_in")).cast("long"))
        .drop("_bkt", "_ps_in", "_boff")
    )


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    stride: int,
    order_cols: list[str],
    buckets: int = 32,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling, exactly
    reproducible: lay the rows end-to-end by their INTEGER weights in
    ``order_cols`` order and keep every row whose cumulative interval
    ``(cum − w, cum]`` covers a multiple of ``stride`` — the classic
    PPS design a token-budget corpus selection needs ("fill N tokens,
    long documents proportionally more likely"), with zero floating
    point: selection and multiplicity are integer arithmetic over the
    distributed prefix sum, so any engine reproduces the exact row
    set. Expected sample size = total_weight / stride; a row with
    w ≥ stride is always selected (``n_hits`` > 1 records the
    multiplicity a with-replacement design would assign; zero-weight
    rows are never selected). Weights must be nonnegative — negative
    weights make the cumulative lay-out meaningless (and the closed
    form below silently wrong), so they fail the plan loudly via a
    codegen'd assertion rather than a scan-the-input pre-check.

    Scale shape: one :func:`global_prefix_sum` (bounded stages,
    broadcast offsets) + a map-side closed-form filter. Deterministic
    by ``order_cols`` total order — same contract as the rank
    operators; there is no seed because SYSTEMATIC sampling's
    randomness, if wanted, enters by ordering on a hash
    (``order_cols=[hash(id)]``-style), keeping the whole design
    engine-exact.
    """
    if stride <= 0:
        raise ValueError(f"stride must be positive: {stride}")
    _reserve(df, "n_hits")
    w = F.col(weight_col)
    # NULL gets its OWN branch with a literal message: `w >= 0` on a
    # NULL is NULL (not true), so without this branch a NULL weight
    # fell through to the negative-weight raise whose concat-with-NULL
    # message rendered as NULL — loud but mislabeled (r10 advice).
    checked = df.withColumn(
        weight_col,
        F.when(
            w.isNull(),
            F.raise_error(
                F.lit(
                    "pps_systematic_sample: NULL weight (coalesce or "
                    "filter NULL weights before sampling)"
                )
            ),
        )
        .when(w >= 0, w)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pps_systematic_sample: negative weight "),
                    w.cast("string"),
                )
            )
        ),
    )
    cum = global_prefix_sum(
        checked, order_cols, weight_col, buckets,
        out_col="cum", partition_cols=partition_cols,
    )
    hits = F.expr(f"(cum div {int(stride)}) - ((cum - {weight_col}) div {int(stride)})")
    return (
        cum.withColumn("n_hits", hits.cast("long"))
        .where(F.col("n_hits") > 0)
    )
