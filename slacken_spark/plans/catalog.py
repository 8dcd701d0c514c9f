"""Query catalog: SURVEY §2's operator inventory re-expressed over the
driver's test tables, each query paired with a DuckDB oracle.

Every entry is registered as ``QUERIES[name] = (fn, oracle_sql | None)``
where ``fn(spark, sf_dir) -> DataFrame``. Output columns are aliased
identically on both sides, and every value is hash-stable across engines:
integers, strings, raw (unarithmetic'd) doubles, or money summed as exact
integer cents (``round(x*100)::bigint``) — never order-dependent float
accumulations.

Operator coverage notes reference SURVEY.md §2 ids (J1, A1, W1, …) and the
reference implementation file:line they re-express.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from slacken_spark.kernels.taxonomy import Taxonomy
from slacken_spark.operators.relational_ext import asof_join, sessionize

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver test table.

    The ``events`` table is written with parquet TIMESTAMP(NANOS), which
    Spark only reads via the nanosAsLong legacy conf — read it as int64
    nanos and convert to a microsecond timestamp column (lossy below 1 µs,
    which no catalog query observes: they floor to seconds or compare
    against µs-precision values).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``t`` + repartition to the session's parallelism — for the FULL-
    table side of expansion-heavy plans (explodes, interpreted array
    lambdas, mapInPandas kernels). A small single-file scan is one
    partition, which would run the expensive per-row work
    single-threaded; at warehouse scale the scan is already split and
    the extra exchange is noise next to the expansion it feeds. Do NOT
    use where a filter should reach the scan (repartition blocks
    pushdown)."""
    return t(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism
    )


def cents(col) -> F.Column:
    """Exact integer cents of a 2-decimal money double (portable)."""
    return F.round(col * 100).cast("long")


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5) — TPC-H Q1 shape (A3/A8 analog)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT)                             AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
           CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
                                                                       AS sum_disc_cents,
           sum(l_quantity) / count(*)                                  AS avg_qty,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Scan / filter / projection pushdown (S-series, P-series)
# ---------------------------------------------------------------------------


@register(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
      AND l_quantity < 10
    """,
)
def scan_filter_project(spark, sf_dir):
    """Projection + predicate pushdown to parquet (P1/P4; verify with
    .explain → PushedFilters). Raw column values only — no arithmetic."""
    li = t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_discount")


# ---------------------------------------------------------------------------
# J1: multi-column-key LEFT join + sentinel decode (P2) — the
# classification-join shape (Classifier.scala:79-90, KeyValueIndex.scala:176-185)
# ---------------------------------------------------------------------------


@register(
    "classification_join",
    """
    WITH records AS (
        SELECT l_partkey AS r_partkey, l_suppkey AS r_suppkey,
               min(l_orderkey) AS taxon
        FROM lineitem WHERE l_quantity >= 45
        GROUP BY l_partkey, l_suppkey
    ),
    spans AS (SELECT * FROM lineitem),
    hits AS (
        SELECT CASE WHEN s.l_returnflag = 'R' THEN -1
                    WHEN r.taxon IS NULL THEN 0
                    ELSE r.taxon END AS taxon
        FROM spans s LEFT JOIN records r
          ON s.l_partkey = r.r_partkey AND s.l_suppkey = r.r_suppkey
    )
    SELECT taxon, count(*) AS n FROM hits GROUP BY taxon
    """,
)
def classification_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    records = (
        li.where(F.col("l_quantity") >= 45)
        .groupBy(
            F.col("l_partkey").alias("r_partkey"), F.col("l_suppkey").alias("r_suppkey")
        )
        .agg(F.min("l_orderkey").alias("taxon"))
    )
    joined = li.join(
        records,
        (li.l_partkey == records.r_partkey) & (li.l_suppkey == records.r_suppkey),
        "left",
    )
    decoded = joined.select(
        F.when(F.col("l_returnflag") == "R", F.lit(-1).cast("long"))
        .when(F.col("taxon").isNull(), F.lit(0).cast("long"))
        .otherwise(F.col("taxon"))
        .alias("taxon")
    )
    return decoded.groupBy("taxon").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# J2: star-schema broadcast joins (GenomeLibrary.scala:50-57 shape)
# ---------------------------------------------------------------------------


@register(
    "star_broadcast_join",
    """
    SELECT r_name, p_brand,
           CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, p_brand
    """,
)
def star_broadcast_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    out = (
        li.join(F.broadcast(t(spark, sf_dir, "part")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(t(spark, sf_dir, "supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "p_brand")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# J6: null-safe join (MinimizerMigration.scala:44-47  <=>)
# ---------------------------------------------------------------------------


@register(
    "nullsafe_join",
    """
    WITH a AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg, count(*) AS n_cust
               FROM customer GROUP BY 1),
         b AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
                      CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
               FROM customer WHERE c_acctbal > 0 GROUP BY 1)
    SELECT a.seg AS seg, a.n_cust, b.bal_cents
    FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
)
def nullsafe_join(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    a = cust.groupBy(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    ).agg(F.count(F.lit(1)).alias("n_cust"))
    b = (
        cust.where(F.col("c_acctbal") > 0)
        .groupBy(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"))
        .agg(F.sum(cents(F.col("c_acctbal"))).alias("bal_cents"))
    )
    return a.join(b, a.seg.eqNullSafe(b.seg)).select(
        a.seg.alias("seg"), "n_cust", "bal_cents"
    )


# ---------------------------------------------------------------------------
# Semi/anti joins (SURVEY §2.4 note: idiomatic substitute for BitSet algebra)
# ---------------------------------------------------------------------------


@register(
    "semi_anti_join",
    """
    SELECT 'with_orders' AS tag, c_nationkey, count(*) AS n
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    UNION ALL
    SELECT 'no_orders' AS tag, c_nationkey, count(*) AS n
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def semi_anti_join(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("tag"), "c_nationkey", "n")
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("no_orders").alias("tag"), "c_nationkey", "n")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# J4: aggregate-then-rejoin on a composite key (BrackenWeights.scala:335-348)
# ---------------------------------------------------------------------------


@register(
    "order_rejoin",
    """
    WITH per_order AS (
        SELECT l_orderkey, count(*) AS n_items,
               CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(coalesce(n_items, 0)) AS BIGINT) AS n_items,
           CAST(sum(coalesce(total_qty, 0)) AS BIGINT) AS total_qty,
           CAST(sum(CASE WHEN n_items IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
    FROM orders LEFT JOIN per_order ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def order_rejoin(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").cast("long").alias("total_qty"),
    )
    return (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.coalesce(F.col("n_items"), F.lit(0))).cast("long").alias("n_items"),
            F.sum(F.coalesce(F.col("total_qty"), F.lit(0))).cast("long").alias("total_qty"),
            F.sum(F.when(F.col("n_items").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_empty"),
        )
    )


# ---------------------------------------------------------------------------
# A1: the LCA fold — custom aggregation over a broadcast tree
# (KeyValueIndex.scala:85-93, LowestCommonAncestor.scala:149-170).
# Tree: root(1) ← region(+2) ← nation(+100) ← customer(+10000);
# groups = order days; the oracle reproduces the fold with conditional
# aggregation over the 3-level hierarchy.
# ---------------------------------------------------------------------------


@register(
    "lca_fold",
    """
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS grp,
           CAST(CASE WHEN count(DISTINCT c_custkey)   = 1 THEN min(c_custkey) + 10000
                     WHEN count(DISTINCT c_nationkey) = 1 THEN min(c_nationkey) + 100
                     WHEN count(DISTINCT n_regionkey) = 1 THEN min(n_regionkey) + 2
                     ELSE 1 END AS BIGINT) AS lca_taxon,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def lca_fold(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    # Driver-side tree over the (small, dimension-sized) hierarchy — the
    # same broadcast pattern the reference uses for the NCBI taxonomy
    # (~2.5M nodes ≈ tens of MB as int arrays). Guard the collect so a
    # mis-sized input fails loudly instead of OOMing the driver.
    n_nodes = region.count() + nation.count() + cust.count()
    if n_nodes > 50_000_000:
        raise ValueError(
            f"hierarchy has {n_nodes} nodes - too large to collect for the"
            " broadcast-tree LCA pattern; partition the dimension first"
        )
    # One union job collects all three levels (vs three cold scans).
    edges = (
        region.select((F.col("r_regionkey") + 2).alias("id"), F.lit(1).alias("parent"))
        .unionByName(
            nation.select(
                (F.col("n_nationkey") + 100).alias("id"),
                (F.col("n_regionkey") + 2).alias("parent"),
            )
        )
        .unionByName(
            cust.select(
                (F.col("c_custkey") + 10000).alias("id"),
                (F.col("c_nationkey") + 100).alias("parent"),
            )
        )
        .toPandas()
    )
    tax = Taxonomy.from_edges(edges["id"].to_numpy(), edges["parent"].to_numpy())

    df = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("grp"),
        (F.col("c_custkey") + 10000).cast("long").alias("node"),
    )
    # collect_list + one Arrow-batched UDF call per batch (not per group):
    # the vectorized segment_lca kernel folds every group simultaneously.
    lca_of_list = tax.lca_list_udf(spark)
    grouped = df.groupBy("grp").agg(
        F.collect_list("node").alias("nodes"), F.count(F.lit(1)).alias("n_orders")
    )
    return grouped.select(
        "grp", lca_of_list(F.col("nodes")).alias("lca_taxon"), "n_orders"
    )


# ---------------------------------------------------------------------------
# A2: collect_list regroup + count_if (Classifier.scala:92-95) — hit lists
# rendered as deterministic sorted strings so any engine hashes identically.
# ---------------------------------------------------------------------------


@register(
    "hit_regroup",
    """
    SELECT l_orderkey,
           string_agg(l_linenumber || ':' || l_partkey, ' ' ORDER BY l_linenumber || ':' || l_partkey)
             AS hits,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS distinct_hits
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def hit_regroup(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    hit = F.concat_ws(":", F.col("l_linenumber"), F.col("l_partkey"))
    return li.groupBy("l_orderkey").agg(
        F.array_join(F.array_sort(F.collect_list(hit)), " ").alias("hits"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("distinct_hits"),
    )


# ---------------------------------------------------------------------------
# A3: two-level aggregation (Classifier.scala:267-291 SQL classifier shape)
# ---------------------------------------------------------------------------


@register(
    "two_level_agg",
    """
    WITH l1 AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS total_events,
           count(*) AS n_types,
           string_agg(event_type || '=' || n, ',' ORDER BY event_type) AS breakdown
    FROM l1 GROUP BY user_id
    """,
)
def two_level_agg(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    l1 = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return l1.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("total_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.array_join(
            F.array_sort(F.collect_list(F.concat_ws("=", F.col("event_type"), F.col("n")))),
            ",",
        ).alias("breakdown"),
    )


# ---------------------------------------------------------------------------
# A5: multi-column count_distinct (KeyValueIndex.scala:220-234)
# ---------------------------------------------------------------------------


@register(
    "count_distinct_multi",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey || '_' || l_suppkey) AS n_part_supp,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def count_distinct_multi(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct(
            F.concat_ws("_", F.col("l_partkey"), F.col("l_suppkey"))
        ).alias("n_part_supp"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# A8: multi-stat per key (Dynamic.scala:152-180)
# ---------------------------------------------------------------------------


@register(
    "multi_stat_per_user",
    """
    SELECT user_id,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
           count(DISTINCT event_type) AS n_types,
           count(*) AS n_events,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(max(event_id) AS BIGINT) AS last_event
    FROM events GROUP BY user_id
    """,
)
def multi_stat_per_user(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.sum(cents(F.col("value"))).alias("value_cents"),
        F.count_distinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").cast("long").alias("first_event"),
        F.max("event_id").cast("long").alias("last_event"),
    )


# ---------------------------------------------------------------------------
# A9: histogram + ordered output (KeyValueIndex.scala:308-336)
# ---------------------------------------------------------------------------


@register(
    "size_histogram",
    """
    SELECT p_size, count(*) AS n, count(DISTINCT p_brand) AS n_brands
    FROM part GROUP BY p_size
    """,
)
def size_histogram(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("n"), F.count_distinct("p_brand").alias("n_brands"))
    )


# ---------------------------------------------------------------------------
# A10: grouped weights + rejoin (BrackenWeights.scala:353-387)
# ---------------------------------------------------------------------------


@register(
    "weights_rollup",
    """
    WITH pairs AS (
        SELECT event_type AS dest, user_id % 10 AS source, count(*) AS n
        FROM events GROUP BY event_type, user_id % 10
    ),
    totals AS (SELECT source, CAST(sum(n) AS BIGINT) AS source_total FROM pairs GROUP BY source)
    SELECT dest, p.source AS source, n, source_total, n / source_total AS frac
    FROM pairs p JOIN totals t ON p.source = t.source
    """,
)
def weights_rollup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    pairs = ev.groupBy(
        F.col("event_type").alias("dest"), (F.col("user_id") % 10).alias("source")
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = pairs.groupBy("source").agg(F.sum("n").cast("long").alias("source_total"))
    return (
        pairs.join(totals, "source")
        .select(
            "dest",
            "source",
            "n",
            "source_total",
            (F.col("n") / F.col("source_total")).alias("frac"),
        )
    )


# ---------------------------------------------------------------------------
# W1: the FASTQ 4-line window trick (FileInputs.scala:196-209) — sliding
# frame collect over ordered rows, keeping every 4th.
# ---------------------------------------------------------------------------


@register(
    "fastq_window",
    """
    WITH w AS (
        SELECT user_id, event_id,
               string_agg(event_type, ',') OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS record,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        FROM events
    )
    SELECT user_id, event_id AS start_event, record
    FROM w WHERE (rn - 1) % 4 = 0
    """,
)
def fastq_window(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    frame = w.rowsBetween(0, 3)
    out = ev.select(
        "user_id",
        F.col("event_id").alias("start_event"),
        F.array_join(F.collect_list("event_type").over(frame), ",").alias("record"),
        F.row_number().over(w).alias("rn"),
    )
    return out.where((F.col("rn") - 1) % 4 == 0).drop("rn")


# ---------------------------------------------------------------------------
# Top-k per group (§2.7 sorts/limits; deterministic tie-break)
# ---------------------------------------------------------------------------


@register(
    "topk_per_group",
    """
    WITH r AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
        FROM events
    )
    SELECT event_type, event_id, value, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def topk_per_group(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 3)
    )


# ---------------------------------------------------------------------------
# Set operations (§2.8): distinct / union / intersect / except
# ---------------------------------------------------------------------------


@register(
    "set_ops_nations",
    """
    SELECT 'both' AS tag, n_nationkey FROM
      (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
       INTERSECT SELECT DISTINCT s_nationkey FROM supplier) x
    UNION ALL
    SELECT 'customer_only' AS tag, n_nationkey FROM
      (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
       EXCEPT SELECT DISTINCT s_nationkey FROM supplier) y
    """,
)
def set_ops_nations(spark, sf_dir):
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    supp = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "n_nationkey")
    conly = cust.exceptAll(supp).select(
        F.lit("customer_only").alias("tag"), "n_nationkey"
    )
    return both.unionByName(conly)


# ---------------------------------------------------------------------------
# Scalar function surface (§2.9): regexp_extract, concat_ws, substring,
# conditional, floor/mod arithmetic (Classifier.scala:299 sample-id regex)
# ---------------------------------------------------------------------------


@register(
    "scalar_funcs",
    """
    SELECT event_id,
           CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS INT) AS k_prop,
           concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS tag,
           substr(event_type, 1, 2) AS prefix,
           CAST(floor(value / 7) AS BIGINT) AS value_bucket,
           CAST(event_id % 10 AS BIGINT) AS ring,
           CASE WHEN value >= 50 THEN 'hi' WHEN value >= 10 THEN 'mid' ELSE 'lo' END AS band
    FROM events
    """,
)
def scalar_funcs(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
        .cast("int")
        .alias("k_prop"),
        F.concat_ws("|", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "tag"
        ),
        F.substring("event_type", 1, 2).alias("prefix"),
        F.floor(F.col("value") / 7).cast("long").alias("value_bucket"),
        (F.col("event_id") % 10).cast("long").alias("ring"),
        F.when(F.col("value") >= 50, "hi")
        .when(F.col("value") >= 10, "mid")
        .otherwise("lo")
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# S7: deterministic sampling via portable hash (InputReader.scala:60-101's
# sample() made reproducible for oracle comparison)
# ---------------------------------------------------------------------------


@register(
    "deterministic_sample",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substr(md5(l_orderkey || '_' || l_linenumber), 1, 1) IN ('0', '1')
    """,
)
def deterministic_sample(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    h = F.md5(F.concat_ws("_", F.col("l_orderkey"), F.col("l_linenumber")))
    return li.where(F.substring(h, 1, 1).isin("0", "1")).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# ---------------------------------------------------------------------------
# Skew handling: salted join / salted aggregation (same results as the
# plain operators — the oracle is the unsalted formulation)
# ---------------------------------------------------------------------------


@register(
    "salted_skew_join",
    """
    SELECT n_name, count(*) AS n_cust,
           CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def salted_skew_join(spark, sf_dir):
    from slacken_spark.operators.relational_ext import salted_join

    cust = t(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    nation = t(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    joined = salted_join(cust, nation, on="nationkey", salt_buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(cents(F.col("c_acctbal"))).alias("bal_cents"),
    )


@register(
    "salted_skew_agg",
    """
    SELECT l_returnflag AS key,
           CAST(sum(l_quantity) AS BIGINT) AS qty,
           count(*) AS n,
           min(l_orderkey) AS first_order
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_skew_agg(spark, sf_dir):
    from slacken_spark.operators.relational_ext import salted_agg

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("key"),
        F.col("l_quantity").cast("long").alias("q"),
        "l_orderkey",
    )
    out = salted_agg(
        li,
        "key",
        {"qty": "sum:q", "n": "count:q", "first_order": "min:l_orderkey"},
        salt_buckets=8,
    )
    return out.select(
        "key", F.col("qty").cast("long"), F.col("n").cast("long"), "first_order"
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / pivot (OLAP shapes a pipeline dashboard needs)
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS flag,
           coalesce(l_linestatus, 'ALL') AS status,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_extendedprice"))).alias("rev_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("status"),
            "rev_cents",
            "n",
        )
    )


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
# Unpivot / melt (wide → long normalization)
# ---------------------------------------------------------------------------


@register(
    "unpivot_part_metrics",
    """
    WITH long AS (
        SELECT p_brand, 'size' AS metric, CAST(p_size AS BIGINT) AS value
        FROM part
        UNION ALL
        SELECT p_brand, 'retail_cents' AS metric,
               CAST(round(p_retailprice * 100) AS BIGINT) AS value
        FROM part
    )
    SELECT p_brand, metric, count(*) AS n,
           CAST(sum(value) AS BIGINT) AS total
    FROM long GROUP BY p_brand, metric
    """,
)
def unpivot_part_metrics(spark, sf_dir):
    """Unpivot (melt): wide per-part metric columns normalize to
    (brand, metric, value) long rows via DataFrame.unpivot — a map-only
    row expansion (each input row emits one row per metric, no
    shuffle), then one partial-agg rollup. The long form is what metric
    stores and plotting layers consume; the oracle expresses the same
    reshape as a UNION ALL."""
    part = t(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("long").alias("size"),
        F.round(F.col("p_retailprice") * 100)
        .cast("long")
        .alias("retail_cents"),
    )
    long = part.unpivot(
        ids=["p_brand"],
        values=["size", "retail_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("p_brand", "metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").cast("long").alias("total"),
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
    are exact integer floor division of the epoch-µs value —
    ``timestamp_diff`` from the epoch literal (pure field arithmetic
    on BOTH timestamp encodings the events table ships with, no
    session-timezone involvement) matches the oracle's
    ``epoch_us // day``."""
    ev = t(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    day_idx = F.expr(
        f"timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS {ts_type}),"
        f" ts) div {_DAY_US}"
    )
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
