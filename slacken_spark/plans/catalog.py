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

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}

# Entries CONSOLIDATED out of the driver-gated registry (the 50-seat/
# 2-round freshness contract caps the catalog at 147 — see
# tests/test_gate.py::test_catalog_respects_the_rotation_capacity_ceiling).
# A demoted entry keeps its full (fn, oracle) contract and stays
# pytest-grade: tests/test_oracle_parity.py runs DEMOTED entries through
# the SAME exact DuckDB compare as registered ones — only the driver
# seat is released. Demote an entry ONLY when a registered superset
# entry end-to-end exercises the same code path (document which, at the
# demotion site).
DEMOTED: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def register_demoted(name: str, sql: str | None):
    """Like ``register`` but into ``DEMOTED``: pytest-gated, not
    driver-gated (the capacity-ceiling consolidation mechanism — the
    hll_estimate / cdc_dedup_stats precedent made executable)."""

    def deco(fn):
        DEMOTED[name] = (fn, sql)
        return fn

    return deco


# Inferred parquet schemas per (application, sf_dir, table) — pure
# plan-construction METADATA, never data. ``spark.read.parquet(path)``
# runs a driver-side footer-inference job on EVERY call (~0.2 s each,
# measured r13-opt vs ~0.03 s with an explicit schema); catalog queries
# read 1-4 tables per build and the bench builds each query 2-3 times,
# so inference alone cost a multi-second slice of every bench pass. At
# warehouse scale the same fix is "declare the table in a catalog":
# scans carry the stored schema instead of re-listing footers. Keyed by
# applicationId so a restarted session (or rewritten test fixture
# between app runs) re-infers, PLUS a cheap staleness token (the path's
# mtime/size from one os.stat, ~µs next to the ~0.2 s inference job) so
# a fixture rewritten WITHIN one application re-infers too instead of
# silently reading with the stale schema (r13 ADVICE).
_SCHEMA_CACHE: dict = {}


def _stat_token(path: str):
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


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
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (
        spark.sparkContext.applicationId, sf_dir, name, _stat_token(path)
    )
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    df = spark.read.schema(schema).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def table_schema(spark: SparkSession, sf_dir: str, name: str):
    """The cached inferred schema of a driver test table — for callers
    that need an explicit schema (streaming sources) without paying a
    fresh footer-inference job per call. Shares ``t``'s cache and its
    events/nanosAsLong convention."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (
        spark.sparkContext.applicationId, sf_dir, name, _stat_token(path)
    )
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


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
    # (~2.5M nodes ≈ tens of MB as int arrays). The OOM guard rides the
    # collect itself via limit(N+1) — hitting the cap raises before
    # anything larger materializes driver-side; the r12 shape paid
    # three extra count() jobs for the same guarantee (r13-opt). The cap
    # sits at 2x the reference taxonomy (~80 MB of collected int64
    # pairs), so the guard fires while the driver-side cost is still
    # tens of MB — a 50M cap would have materialized ~800 MB before
    # raising, degrading "fail loudly" to a possible driver OOM
    # (r13 ADVICE).
    _MAX_NODES = 5_000_000
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
        .limit(_MAX_NODES + 1)
        .toPandas()
    )
    if len(edges) > _MAX_NODES:
        raise ValueError(
            f"hierarchy has more than {_MAX_NODES} nodes - too large to"
            " collect for the broadcast-tree LCA pattern; partition the"
            " dimension first"
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
    """Runs the salted two-level ``grouped_topk`` (the scale path):
    events has FEW event types, so the plain
    ``Window.partitionBy(event_type)`` form gives each type ONE reducer
    however big the corpus — fine at bench scale (window 0.33 s vs
    two-level 0.43 s at sf0.1; 0.41 vs 0.50 s on the 10× events probe),
    serial at 100×. The ~0.1 s bench cost buys the bounded-stage plan:
    per-(group, salt) local top-k in parallel, then an exact re-rank
    over ≤ groups × salts × k survivors."""
    from slacken_spark.operators.relational_ext import grouped_topk

    ev = t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return grouped_topk(
        ev,
        group_cols=["event_type"],
        order_cols=[("value", False), ("event_id", True)],
        k=3,
        rank_col="rnk",
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


