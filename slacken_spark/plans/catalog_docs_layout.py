"""Query catalog, part 2f: LAYOUT + SERVING operators — zone-map data
skipping (write-side stats + the pruned read path) and ranked
retrieval through the frequency-carrying index. Registers into the
same QUERIES registry as ``catalog``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.functions import text as X
from slacken_spark.functions.skipping import (
    layout_shard,
    maintain_zone_maps,
    pruned_scan_predicate,
    surviving_shards,
    zone_maps,
)
from slacken_spark.plans.catalog import register, t, tp
from slacken_spark.plans.catalog_docs import SQL_TOKENS

# range-layout geometry for the documents table: n_chars is the layout
# column (the clustering a range-partitioned write produces), width 50
# → ~12 shards across every gate SF
_ZM_WIDTH = 50
_SQL_SHARD = f"(n_chars - (n_chars % {_ZM_WIDTH})) // {_ZM_WIDTH}"
# the pruned scan's predicate: a token-count band that survives in only
# 3-4 of the 12 shards at every gate SF (probed), so skipping is
# observable, not vacuous
_ZM_LO, _ZM_HI = 40, 60


@register(
    "doc_shard_zone_maps",
    f"""
    SELECT CAST({_SQL_SHARD} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(len({SQL_TOKENS.format(expr='text')})) AS BIGINT)
             AS min_n_tokens,
           CAST(max(len({SQL_TOKENS.format(expr='text')})) AS BIGINT)
             AS max_n_tokens
    FROM documents GROUP BY 1
    """,
)
def doc_shard_zone_maps(spark, sf_dir):
    """The data-skipping WRITE side (functions.skipping.zone_maps):
    per-range-shard (row count, min/max token count) statistics — the
    file-stats manifest a Delta/Iceberg-style table keeps so reads can
    prune (parquet row-group stats are the intra-file analog;
    reference sidecar analog: the index's _index_params metadata).
    ONE aggregation keyed on the shard id; map-side partials collapse
    each task to shard cardinality before the single tiny shuffle, so
    the stats pass costs one corpus scan regardless of shard count."""
    docs = t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "n_chars",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return zone_maps(sized, layout_shard("n_chars", _ZM_WIDTH), ["n_tokens"])


@register(
    "zone_map_pruned_scan",
    f"""
    SELECT CAST({_SQL_SHARD} AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({SQL_TOKENS.format(expr='text')})) AS BIGINT)
             AS sum_tokens
    FROM documents
    WHERE len({SQL_TOKENS.format(expr='text')}) BETWEEN {_ZM_LO} AND {_ZM_HI}
    GROUP BY 1
    """,
)
def zone_map_pruned_scan(spark, sf_dir):
    """The data-skipping READ path: a token-count band query consults
    the zone maps (a shard-count-sized driver-side step — exactly a
    table format's plan-time file pruning), rewrites the surviving
    shard set into RANGE PREDICATES on the stored layout column, and
    scans with them — Spark pushes the n_chars ranges into the parquet
    scan (PushedFilters, plan-asserted in tests/test_plans.py), so
    pruned shards' bytes are never read; at 100 TB with one file per
    shard this is file skipping, and within surviving files parquet's
    own row-group stats nest the same trick. Soundness (a zone-map
    envelope can over-approximate but never miss a matching row) IS
    the correctness gate: the oracle scans WITHOUT the zone maps —
    pruned ≡ full scan. At the gate SFs the band keeps 3-4 of 12
    shards, so most of the table is actually skipped."""
    docs = t(spark, sf_dir, "documents")
    n_tokens = X.token_count(F.col("text")).cast("long")
    sized = docs.select("doc_id", "n_chars", n_tokens.alias("n_tokens"))
    zm = zone_maps(sized, layout_shard("n_chars", _ZM_WIDTH), ["n_tokens"])
    shards = surviving_shards(zm, "n_tokens", _ZM_LO, _ZM_HI)
    pred = pruned_scan_predicate(shards, "n_chars", _ZM_WIDTH)
    return (
        docs.where(pred)
        .where(n_tokens.between(_ZM_LO, _ZM_HI))
        .groupBy(layout_shard("n_chars", _ZM_WIDTH).alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(n_tokens).cast("long").alias("sum_tokens"),
        )
    )



# ONE definition of the zone-map CDC fixture shared by the batch
# operator and its streaming twin (catalog_streaming.
# streaming_zone_maps) — both gate against the shared rebuild oracle,
# so the batch rule must not be able to desynchronize between them.
ZM_BATCH_LO, ZM_BATCH_HI = 100, 149


def zm_sized(docs):
    """(doc_id, n_chars, n_tokens) — the stats frame every zone-map
    entry builds over."""
    return docs.select(
        "doc_id",
        "n_chars",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )


def zm_update_batch(df):
    """The clustered re-clean batch: every doc in the n_chars
    [ZM_BATCH_LO, ZM_BATCH_HI] band truncated to 'v2 ' + 80 chars (it
    MOVES shards).
    Pure column ops, so it applies to the batch table and to a
    readStream frame alike."""
    new_text = F.concat(F.lit("v2 "), F.substring("text", 1, 80))
    return df.where(
        F.col("n_chars").between(ZM_BATCH_LO, ZM_BATCH_HI)
    ).select(
        "doc_id",
        F.length(new_text).cast("long").alias("n_chars"),
        X.token_count(new_text).cast("long").alias("n_tokens"),
    )


_ZMM_TOKS = SQL_TOKENS.format(expr="t2")

# shared by the batch operator and its streaming twin
# (catalog_streaming.streaming_zone_maps): both apply the SAME CDC
# batch, so both gate against the rebuild of the same merged corpus
ZONE_MAP_MAINTAIN_ORACLE_SQL = f"""
    WITH m AS MATERIALIZED (
        SELECT CASE WHEN n_chars BETWEEN {ZM_BATCH_LO} AND {ZM_BATCH_HI}
                    THEN 'v2 ' || substr(text, 1, 80) ELSE text END AS t2
        FROM documents)
    SELECT CAST((len(t2) - (len(t2) % {_ZM_WIDTH})) // {_ZM_WIDTH} AS BIGINT)
             AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(len({_ZMM_TOKS})) AS BIGINT) AS min_n_tokens,
           CAST(max(len({_ZMM_TOKS})) AS BIGINT) AS max_n_tokens
    FROM m GROUP BY 1
    """


@register("zone_map_maintain", ZONE_MAP_MAINTAIN_ORACLE_SQL)
def zone_map_maintain(spark, sf_dir):
    """The data-skipping MAINTENANCE side (functions.skipping.
    maintain_zone_maps): a CDC batch re-cleans every document in one
    length band (n_chars 100-149 — a clustered re-processing batch,
    the layout analog of inverted_index_delta's clustered updates),
    truncating them so they MOVE to a lower shard. Min/max stats are
    not self-inverting under deletes, so affected shards — the
    changed rows' old shards ∪ new shards, here exactly {{1, 2}} of
    ~12 — recompute from the merged corpus under a scan predicate the
    zone maps themselves prune (the recompute reads ~2/12 of the
    table); the other ~10 shards' stats pass through with NO scan.
    Shard 2 empties entirely (every resident moved out) and must
    vanish from the stats, exactly as a rebuild would drop it. The
    oracle IS that rebuild: zone maps recomputed from scratch over
    the merged corpus — maintenance ≡ rebuild, row for row."""
    docs = t(spark, sf_dir, "documents")
    sized = zm_sized(docs)
    old_zm = zone_maps(sized, layout_shard("n_chars", _ZM_WIDTH), ["n_tokens"])
    batch = zm_update_batch(docs)
    return maintain_zone_maps(
        old_zm, sized, batch, "doc_id", "n_chars", _ZM_WIDTH, ["n_tokens"]
    )


# ---------------------------------------------------------------------------
# Ranked retrieval (TF-IDF through the frequency-carrying index)
# ---------------------------------------------------------------------------

_RANK_TERMS = ("hash", "join", "scan", "filter")
_RANK_TERMS_SQL = "(" + ", ".join(f"'{t_}'" for t_ in _RANK_TERMS) + ")"
_RANK_K = 20

# The stored flat scored index the ranked serve path reads, plus its
# collection size N (index-build metadata) — app-scoped like
# catalog_docs_pipeline._fine_index (r14): a query server reads a
# stored artifact, it does not re-tokenize the corpus per query.
_FLAT_SCORED_CACHE: dict = {}


def _flat_scored_index(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get
    from slacken_spark.functions.inverted import scored_index

    def build():
        docs = tp(spark, sf_dir, "documents")
        n_docs = t(spark, sf_dir, "documents").count()
        return (
            scored_index(docs, X.tokens(F.col("text"))).persist(),
            n_docs,
        )

    return app_scoped_get(
        _FLAT_SCORED_CACHE, spark, ("flat_scored_index", sf_dir), build
    )


@register(
    "inverted_index_query_ranked",
    f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks
        FROM documents),
    tfc AS MATERIALIZED (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM d)
        GROUP BY doc_id, term),
    dfc AS MATERIALIZED (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY term),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    s AS (
        SELECT tfc.doc_id,
               CAST(sum(tfc.tf * ((n.n * 1000) // dfc.df)) AS BIGINT)
                 AS score
        FROM tfc JOIN dfc USING (term) CROSS JOIN n
        WHERE tfc.term IN {_RANK_TERMS_SQL}
        GROUP BY tfc.doc_id),
    r AS (
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS rank
        FROM s)
    SELECT doc_id, score, rank FROM r WHERE rank <= {_RANK_K}
    """,
)
def inverted_index_query_ranked(spark, sf_dir):
    """RANKED retrieval through the index (functions.inverted.
    scored_index + query_index_ranked) — the serving tier above the
    boolean ``inverted_index_query``: postings carry term frequencies
    (reduced map-side before the one term shuffle, so the shuffle
    moves a row per POSTING, not per occurrence), and documents rank
    by integer TF-IDF — ``score = Σ tf · ((N·1000) div df)``, exact
    64-bit arithmetic so the ranking is bit-equal across engines
    where a float ``ln(N/df)`` would be libm-dependent. Query terms
    broadcast left-semi (only their lists are touched), one doc-id
    shuffle sums partial scores, and the global top-20 is distributed
    TakeOrdered — never a corpus-wide sort. N (collection size) is
    index-build metadata, a parquet-metadata count. The oracle
    recomputes ranking straight from the corpus: the index must serve
    exactly what a scan would score."""
    from slacken_spark.functions.inverted import query_index_ranked

    idx, n_docs = _flat_scored_index(spark, sf_dir)
    return query_index_ranked(idx, list(_RANK_TERMS), _RANK_K, n_docs)
