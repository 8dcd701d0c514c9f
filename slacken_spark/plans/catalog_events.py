"""Query catalog, part 1b: EVENTS analytics — pivots, sessionization,
rolling windows, as-of and range-bucket joins, Z-order layout, JSON
extraction, approximate distinct, funnels, retention cohorts. Split
from ``catalog`` when it passed the 1k-line budget; registers into
the same QUERIES registry and shares its loaders/helpers.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from slacken_spark.operators.relational_ext import asof_join, sessionize
from slacken_spark.plans.catalog import cents, register, t


@register(
    "event_type_pivot",
    """
    SELECT user_id % 10 AS ring,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase
    FROM events GROUP BY 1
    """,
)
def event_type_pivot(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("ring"))
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "ring",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ["click", "view", "purchase"]
        ],
    )


# ---------------------------------------------------------------------------
# Sessionization (streaming-adjacent batch op; gap-based session ids)
# ---------------------------------------------------------------------------


@register(
    "sessionize_events",
    """
    WITH s AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
    SELECT user_id,
           CAST(sum(new_sess) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def sessionize_events(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", 1800)
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "events_rolling_stats",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value*100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_n,
           date_diff('microseconds',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS us_since_prev
    FROM events
    """,
)
def events_rolling_stats(spark, sf_dir):
    """Frame-based window aggregates — the rolling-metric query class
    (7-row trailing sum/count per user) plus the lag-delta in exact
    integer microseconds. All three window functions share one
    (partition, order) spec, so the physical plan is a single user_id
    exchange + sort feeding one Window node; values stay integer (cents
    quantization, µs field arithmetic) so the hash gate is float-free
    and DST-immune (timestamp_diff is pure field arithmetic, per the
    sessionize fix)."""
    ev = t(spark, sf_dir, "events")
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(cents(F.col("value"))).over(wf).cast("long").alias("roll_cents"),
        F.count(F.lit(1)).over(wf).cast("long").alias("roll_n"),
        F.timestamp_diff("MICROSECOND", F.lag("ts").over(wl), F.col("ts")).alias(
            "us_since_prev"
        ),
    )


# ---------------------------------------------------------------------------
# As-of join (backward): each event matched to the user's latest order at
# or before the event time. Union+window plan — one shuffle, no range blowup.
# ---------------------------------------------------------------------------


@register(
    "asof_event_order",
    """
    SELECT e.event_id,
           coalesce((SELECT o_orderkey FROM orders
                     WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
                     ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1),
                    -1) AS order_key
    FROM events e
    """,
)
def asof_event_order(spark, sf_dir):
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderdate", "o_orderkey"],
    )
    return out.select(
        "event_id", F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("order_key")
    )


@register(
    "asof_event_order_forward",
    """
    SELECT e.event_id,
           coalesce((SELECT o_orderkey FROM orders
                     WHERE o_custkey = e.user_id AND o_orderdate >= e.ts
                     ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 1),
                    -1) AS order_key
    FROM events e
    """,
)
def asof_event_order_forward(spark, sf_dir):
    """Forward as-of: each event matched to the EARLIEST order at-or-
    after it (direction='forward'; same one-shuffle union-tag plan as
    backward, scan order flipped)."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    out = asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderdate", "o_orderkey"],
        direction="forward",
    )
    return out.select(
        "event_id", F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("order_key")
    )


# ---------------------------------------------------------------------------
# Range join via bucketization (range_bucket_join operator)
# ---------------------------------------------------------------------------


@register(
    "range_bucket_join",
    """
    WITH sizes AS (SELECT DISTINCT p_size FROM part)
    SELECT p_size, count(*) AS n_in_range,
           CAST(sum(l_quantity) AS BIGINT) AS qty_in_range
    FROM sizes JOIN lineitem
      ON l_quantity >= p_size AND l_quantity <= p_size + 5
    GROUP BY p_size
    """,
)
def range_bucket_join_q(spark, sf_dir):
    from slacken_spark.operators.relational_ext import range_bucket_join

    sizes = t(spark, sf_dir, "part").select("p_size").distinct()
    sizes = sizes.withColumn("lo", F.col("p_size").cast("double")).withColumn(
        "hi", (F.col("p_size") + 5).cast("double")
    )
    li = t(spark, sf_dir, "lineitem").select("l_quantity")
    joined = range_bucket_join(li, sizes, "l_quantity", "lo", "hi", bucket_width=5)
    return joined.groupBy("p_size").agg(
        F.count(F.lit(1)).alias("n_in_range"),
        F.sum("l_quantity").cast("long").alias("qty_in_range"),
    )


# ---------------------------------------------------------------------------
# Z-order layout statistics (multi-dimensional data clustering)
# ---------------------------------------------------------------------------


def _zorder_sql() -> str:
    """16-bit Morton interleave of (user_id mod 256, cents mod 256) as
    pure integer shifts — identical literals on both engines."""
    x = "((user_id % 256) + 256) % 256"
    y = "((CAST(round(value * 100) AS BIGINT) % 256) + 256) % 256"
    terms = [
        f"((({x} >> {b}) & 1) << {2 * b}) + ((({y} >> {b}) & 1) << {2 * b + 1})"
        for b in range(8)
    ]
    return " + ".join(terms)


@register(
    "events_zorder_layout",
    f"""
    WITH z AS (SELECT {_zorder_sql()} AS zval FROM events)
    SELECT CAST(zval >> 10 AS BIGINT) AS zbucket,
           count(*) AS n_rows,
           CAST(min(zval) AS BIGINT) AS z_min,
           CAST(max(zval) AS BIGINT) AS z_max
    FROM z GROUP BY 1
    """,
)
def events_zorder_layout(spark, sf_dir):
    """Z-order (Morton) layout assignment: interleave the bits of two
    filter dimensions (user ring, value cents ring) into one clustering
    key and roll up occupancy per 64-row zbucket — the data-layout
    optimization (Delta/Iceberg OPTIMIZE ZORDER) that makes BOTH
    ``user_id`` and ``value`` range filters prune files at 100 TB.
    The interleave is a codegen'd integer expression (map-only); the
    rollup is the only shuffle. Writing ``repartitionByRange(zval)``
    + sorted parquet is the production sink; the bucket histogram here
    is the layout's verifiable fingerprint."""
    ev = t(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(256))
    y = F.pmod(F.round(F.col("value") * 100).cast("long"), F.lit(256))
    z = None
    for b in range(8):
        t_b = F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b) + \
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        z = t_b if z is None else z + t_b
    return (
        ev.select(z.alias("zval"))
        .groupBy(F.shiftright("zval", 10).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").cast("long").alias("z_min"),
            F.max("zval").cast("long").alias("z_max"),
        )
    )


# ---------------------------------------------------------------------------
# Semi-structured extraction (JSON props column)
# ---------------------------------------------------------------------------


@register(
    "events_json_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    """Semi-structured extraction: parse the JSON ``props`` column with
    a typed ``from_json`` schema (schema-on-read, codegen'd Jackson
    parse — never a UDF) and aggregate the extracted field per event
    type. Malformed rows parse to NULL, and every aggregate here is
    null-ignoring (count(k)/sum/min/max), so bad rows drop out without
    a separate filter — which also keeps the parse SINGLE-EVALUATED:
    a pre-aggregation null filter would be inlined by CollapseProject
    and re-run the parse once per consumer (observed: 3 JsonToStructs
    sites in that plan shape vs 1 here)."""
    ev = t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k long")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("long").alias("k_min"),
            F.max("k").cast("long").alias("k_max"),
        )
        .where(F.col("n") > 0)
    )


# ---------------------------------------------------------------------------
# Approximate distinct-count sketches (HLL++)
# ---------------------------------------------------------------------------


@register(
    "events_approx_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events,
           TRUE AS within_bound
    FROM events GROUP BY event_type
    """,
)
def events_approx_distinct(spark, sf_dir):
    """Sketch-based cardinality: per event type, HyperLogLog++ distinct
    users (``approx_count_distinct``, rsd 2%) checked against the exact
    count. The sketch is THE 100 TB answer — constant memory per group
    and mergeable partials, where exact distinct shuffles every key.
    The raw sketch value can't be oracle-hashed (DuckDB's
    approx_distinct is a different sketch, so values legitimately
    differ engine-to-engine), but HLL++ IS deterministic per dataset,
    so the hash-stable shape is the exact count plus a deterministic
    loose error flag: ``within_bound`` asserts the sketch landed within
    10% (5× the configured rsd) of truth — the oracle predicts TRUE.
    tests/test_plans.py additionally bounds the error at the tight 3σ
    level."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.02)
                - F.count_distinct("user_id")
            )
            <= F.greatest(
                F.lit(1), (F.count_distinct("user_id") * F.lit(0.10)).cast("long")
            )
        ).alias("within_bound"),
    )


@register(
    "funnel_conversion",
    """
    WITH f AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
               min(CASE WHEN event_type = 'click' THEN ts END) AS tc,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(CASE WHEN tc > tv AND tp > tc THEN 3
                     WHEN tc > tv THEN 2
                     ELSE 1 END AS BIGINT) AS reached
    FROM f WHERE tv IS NOT NULL
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel analysis (view → click → purchase) by FIRST
    occurrence: a user reaches step k+1 iff their first step-(k+1)
    event is strictly after their first step-k event — the standard
    product-analytics conversion funnel. ONE conditional aggregation
    keyed on user_id computes all three first-touch timestamps in a
    single shuffle with map-side partial mins (no joins, no windows —
    the same shape at 10^9 users as at 10^2), then the step
    comparison is a per-row CASE. Strictly-greater comparisons are at
    exact µs precision on both engines (ties do NOT convert, same
    rule both sides); NULL first-touches propagate as non-conversion
    through SQL three-valued logic identically. Emits a
    user-cardinality (user_id, reached ∈ {1,2,3}) table — the input
    a cohort/retention rollup aggregates."""
    ev = t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("tp"),
    )
    return f.where(F.col("tv").isNotNull()).select(
        "user_id",
        F.when(
            (F.col("tc") > F.col("tv")) & (F.col("tp") > F.col("tc")), 3
        )
        .when(F.col("tc") > F.col("tv"), 2)
        .otherwise(1)
        .cast("long")
        .alias("reached"),
    )


_DAY_US = 86_400_000_000


@register(
    "retention_cohorts",
    f"""
    WITH f AS (SELECT user_id,
                      min(epoch_us(ts) // {_DAY_US}) AS cohort_day
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT e.user_id, f.cohort_day,
                 (epoch_us(e.ts) // {_DAY_US}) - f.cohort_day AS day_offset
          FROM events e JOIN f USING (user_id))
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM a GROUP BY cohort_day, day_offset
    """,
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention analysis: users grouped by FIRST-active day,
    counted per day-offset of later activity — the activation/
    retention triangle behind every growth dashboard, and the events
    analog of dataset freshness curves. Scale shape: the per-user
    first-day aggregation and the distinct (user, day) activity set
    are each ONE user-keyed shuffle with map-side partials; their
    join is user-keyed (no broadcast assumption — users are
    corpus-scale), and the final rollup shuffles only the
    already-distinct activity rows on (cohort, offset). Day indices
    are exact integer floor division of the epoch-µs value, derived
    SESSION-TIMEZONE-FREE for both encodings the events table ships
    with: LTZ timestamps (the legacy-NANOS read path) go through
    ``unix_micros`` (the internal UTC µs, no zone math), NTZ through
    ``timestampdiff`` from an NTZ epoch literal (NTZ has no zone at
    all) — an LTZ-cast epoch literal would be interpreted in the
    caller's session zone and shift every day boundary. Both match
    the oracle's ``epoch_us // day``."""
    ev = t(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "timestamp_ntz":
        day_idx = F.expr(
            "timestampdiff(MICROSECOND,"
            " CAST('1970-01-01 00:00:00' AS timestamp_ntz), ts)"
            f" div {_DAY_US}"
        )
    else:
        day_idx = F.expr(f"unix_micros(ts) div {_DAY_US}")
    act = ev.select("user_id", day_idx.alias("day")).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog register tables (exact, mergeable distinct-count artifact)
# ---------------------------------------------------------------------------

# the ONE definition of the register-table oracle (p=9, m=512): shared
# verbatim by the batch build and the CDC maintainer, whose strongest
# invariant is maintained ≡ rebuilt-over-the-whole-stream. 60-bit
# md5-derived hash (token_hash64's SQL twin); rho = 52 − bit_length of
# the high 51 bits, written with bin()-string length because neither
# engine has an integer bit_length and float log2 rounds wrong exactly
# at powers of two.
HLL_REGISTERS_ORACLE_SQL = """
    WITH h AS (
        SELECT event_type,
               CAST('0x' || substr(md5('hll_' || CAST(user_id AS VARCHAR)),
                                   1, 15) AS BIGINT) AS hv
        FROM events WHERE user_id IS NOT NULL)
    SELECT event_type,
           CAST(hv % 512 AS INT) AS reg,
           CAST(max(52 - (CASE WHEN hv // 512 = 0 THEN 0
                               ELSE length(bin(hv // 512)) END)) AS INT)
             AS rho
    FROM h GROUP BY event_type, reg
    """


@register("events_hll_registers", HLL_REGISTERS_ORACLE_SQL)
def events_hll_registers(spark, sf_dir):
    """HyperLogLog register TABLE per event type over user_id
    (functions.sketch.hll_registers, p=9) — the mergeable
    distinct-counting artifact the CMS grid / quantile histogram
    families already have for counts/quantiles: at most 2^9 = 512
    all-integer rows per group whatever the user cardinality, built
    with ONE map-side partial max that collapses every task's output
    to register size before the only (register-sized) shuffle, and
    max-mergeable across shards/micro-batches
    (regs(A ∪ B) ≡ hll_merge(regs(A), regs(B)), row for row). Where
    Spark's approx_count_distinct hides its sketch inside one opaque
    aggregate you can neither persist nor maintain, the register
    table stores, merges, and CDC-maintains — estimates derive on
    demand (hll_estimate; events_approx_distinct gates the built-in's
    accuracy). md5-derived hashing makes every register engine-
    portable, so the oracle gates all ~512×types rows hash-exact, not
    a tolerance band. 1×→10× probe FLAT (0.78→0.67 s): the shuffle is
    register-sized, never row-sized."""
    from slacken_spark.functions.sketch import hll_registers

    ev = t(spark, sf_dir, "events")
    return hll_registers(ev, ["event_type"], "user_id", 9)


@register("events_hll_maintain", HLL_REGISTERS_ORACLE_SQL)
def events_hll_maintain(spark, sf_dir):
    """CDC maintenance for the HLL register table
    (functions.sketch.hll_maintain): the stored registers (built from
    the even-event_id half) absorb an APPEND batch (the odd half) by
    per-register max — batch-bounded work (one batch-sized partial
    max + one register-sized merge shuffle, no corpus rescan), the
    same maintained ≡ rebuilt contract as doc_heavy_hitters_delta /
    value_quantile_delta. The oracle is the strongest invariant: the
    register build over the WHOLE stream, row for row — max is
    add-monotone, so appends maintain exactly (deletes cannot lower a
    register; a delete-heavy workload recomputes affected groups, the
    zone-map asymmetry, documented on hll_merge)."""
    from slacken_spark.functions.sketch import hll_maintain, hll_registers

    ev = t(spark, sf_dir, "events")
    base = hll_registers(
        ev.where(F.col("event_id") % 2 == 0), ["event_type"], "user_id", 9
    )
    return hll_maintain(
        base, ev.where(F.col("event_id") % 2 == 1),
        ["event_type"], "user_id", 9,
    )
