"""Query catalog, part 2d: DATASET-PIPELINE operators — quota
sampling and temperature mixing, sequence packing, shard manifests,
train/val/test splits, inverted-index build/sharding/incremental
maintenance, CDC upsert and corpus diff. Split from ``catalog_docs``
(round 7); registers into the same QUERIES registry and shares its
portability constants.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from slacken_spark.functions import text as X
from slacken_spark.plans.catalog import register, t, tp
from slacken_spark.plans.catalog_docs import SQL_H64, SQL_TOKENS


# below every source's total (~1.1-1.6k tokens at the gate SFs) so the
# quota genuinely truncates — roughly half of each source survives
_QUOTA_TOKENS = 800


def _sized_docs(spark, sf_dir):
    """(doc_id, source, ntok) — the shared input of the three quota /
    mixing queries; one definition so a tokenizer or cast change can
    never desynchronize them."""
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(X.tokens(F.col("text"))).cast("long").alias("ntok"),
    )


_SIZED_CACHE: dict = {}


def _sized_docs_persisted(spark, sf_dir):
    """Persisted form for multi-action consumers (the mixing query runs
    a totals collect plus the quota output over the same tokenized
    lineage). Memoized per (application, sf_dir) like the index and
    component caches — a bare ``.persist()`` per invocation would
    accumulate one cached lineage per bench rerun and never free it."""
    from slacken_spark.appcache import app_scoped_get

    return app_scoped_get(
        _SIZED_CACHE,
        spark,
        ("sized_docs", sf_dir),
        lambda: _sized_docs(spark, sf_dir).persist(),
    )


@register(
    "source_quota_sample",
    f"""
    WITH d AS (
        SELECT doc_id, source,
               len({SQL_TOKENS.format(expr='text')}) AS ntok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    r AS (
        SELECT *, sum(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens
    FROM r WHERE cum <= {_QUOTA_TOKENS}
    GROUP BY source
    """,
)
def source_quota_sample(spark, sf_dir):
    """Per-source token-quota downsampling — the dataset-mixer step:
    rank each source's docs by a deterministic hash (seeded, engine-
    reproducible spread sample), keep docs while the running token sum
    stays within the quota, and report kept docs/tokens per source
    (functions.packing.quota_sample, window mode). One shuffle on
    source; cumsum is a window, never a driver loop — but the window
    sorts each source in one task, so when one source IS the dataset
    use the hash mode (``source_quota_sample_hash``)."""
    from slacken_spark.functions.packing import quota_sample

    docs = _sized_docs(spark, sf_dir)
    kept = quota_sample(docs, _QUOTA_TOKENS, "source", "doc_id", "ntok", "window")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
    )


@register(
    "source_quota_sample_hash",
    f"""
    WITH d AS (
        SELECT doc_id, source,
               len({SQL_TOKENS.format(expr='text')}) AS ntok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    r AS (
        SELECT *, sum(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum
        FROM d
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens
    FROM r WHERE cum <= {_QUOTA_TOKENS}
    GROUP BY source
    """,
)
def source_quota_sample_hash(spark, sf_dir):
    """The SAME quota downsampling through the 100 TB physical path
    (functions.packing.quota_sample, hash mode): one map-only pass
    histograms tokens per (source, hash-bucket), a window + aggregate
    over the corpus-size-independent histogram finds each source's
    boundary bucket EXECUTOR-SIDE (nothing collects to the driver, so
    group cardinality can't OOM it), sub-boundary buckets are kept
    whole via a broadcast join (no sort, no window on the bulk branch),
    and only the boundary bucket's ~1/4096 of each source flows through
    the cumulative window. Bucket order refines hash order, so the kept
    set — and hence this rollup and its oracle — is byte-identical to
    the window form, ties included (tests/test_packing.py pins
    whole-set equality; tests/test_plans.py asserts the bulk branch
    carries no Sort)."""
    from slacken_spark.functions.packing import quota_sample

    docs = _sized_docs(spark, sf_dir)
    kept = quota_sample(docs, _QUOTA_TOKENS, "source", "doc_id", "ntok", "hash")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("n_tokens"),
    )


@register(
    "source_temperature_mix",
    f"""
    WITH d AS (
        SELECT doc_id, source,
               len({SQL_TOKENS.format(expr='text')}) AS ntok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    tot AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS tot FROM d GROUP BY source),
    q AS (SELECT source,
                 CAST(floor(600 * sqrt(CAST(tot AS DOUBLE) /
                                       (SELECT max(tot) FROM tot))) AS BIGINT)
                   AS quota
          FROM tot),
    r AS (
        SELECT d.*, q.quota,
               sum(ntok) OVER (PARTITION BY d.source ORDER BY h, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum
        FROM d JOIN q USING (source)
    )
    SELECT source, quota, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS n_tokens
    FROM r WHERE cum <= quota
    GROUP BY source, quota
    """,
)
def source_temperature_mix(spark, sf_dir):
    """Temperature-scaled dataset mixing — the rule real pretraining
    mixes use: each source's token budget is proportional to
    ``sqrt(its share)`` (temperature 2 sampling, normalized so the
    largest source gets the full 600-token budget), flattening the
    source distribution without starving small sources. Per-source
    totals are one tiny aggregate to the driver; the quotas feed
    ``quota_sample``'s per-group dict form on the HASH path (no
    per-source sort), and the rollup reports (source, quota, kept
    docs, kept tokens). Quota arithmetic is a single chain of
    correctly-rounded IEEE double ops (divide, sqrt, multiply,
    floor), so Python on the driver and the DuckDB oracle produce the
    identical integer."""
    import math

    from slacken_spark.functions.packing import quota_sample

    # persisted + app-scoped-memoized: this query runs two actions over
    # the tokenized lineage (totals collect, then the output whose plan
    # scans it three more times) — exactly the case quota_sample's
    # docstring says to persist for, and the memoization keeps bench
    # reruns from stacking a fresh cached lineage per invocation
    docs = _sized_docs_persisted(spark, sf_dir)
    # BOUND NOTE (the skipping.py convention): this collect is
    # source-cardinality-sized — one row per corpus source, never per
    # doc. The mixing recipe (per-source temperature quotas) is
    # driver-side state by nature, the same contract as every mixer
    # config a training pipeline ships; a corpus with more sources than
    # driver memory holds has a config-management problem, not a
    # query-plan one.
    totals = {
        r["source"]: r["tot"]
        for r in docs.groupBy("source")
        .agg(F.sum("ntok").cast("long").alias("tot"))
        .collect()
    }
    tmax = max(totals.values())
    quotas = {
        s: math.floor(600 * math.sqrt(v / tmax)) for s, v in totals.items()
    }
    kept = quota_sample(docs, quotas, "source", "doc_id", "ntok", "hash")
    qdf = F.broadcast(
        spark.createDataFrame(list(quotas.items()), "source string, quota long")
    )
    return (
        kept.join(qdf, "source")
        .groupBy("source", "quota")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
        )
    )

@register(
    "source_hamilton_quota",
    f"""
    WITH sw AS (SELECT source,
                   CAST(sum(len({SQL_TOKENS.format(expr='text')}))
                        AS BIGINT) AS w
                FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM sw),
    b AS (SELECT source, (100000 * w) // tot.wt AS base,
                 (100000 * w) % tot.wt AS rem
          FROM sw CROSS JOIN tot),
    s AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS surplus FROM b),
    r AS (SELECT source, base,
                 row_number() OVER (ORDER BY rem DESC,
                                    source ASC NULLS FIRST) AS rk
          FROM b)
    SELECT r.source,
           CAST(r.base + (CASE WHEN r.rk <= s.surplus THEN 1 ELSE 0 END)
                AS BIGINT) AS quota
    FROM r CROSS JOIN s
    """,
)
def source_hamilton_quota(spark, sf_dir):
    """Largest-remainder (Hamilton) apportionment of an integer token
    budget across sources (functions.packing.hamilton_allocate,
    total=100000 over per-source token sums): each source gets
    ``floor(total·w/W)`` and the ``total − Σfloor`` leftover units go
    to the largest remainders (ties by source key ascending NULLS
    FIRST — Spark's asc default; the oracle must say it explicitly,
    DuckDB defaults NULLS LAST), so the shares SUM TO the budget
    EXACTLY — the allocator a dataset-mixing recipe needs before
    quota_sample's per-group dict mode ("2T tokens at these
    proportions" must hand each source an integer budget with zero
    rounding drift). All-int64 arithmetic, so any engine reproduces
    the identical allocation.

    Scale shape: the weight table is group-cardinality-sized (one
    tokenize + per-source partial agg over the corpus); the grand
    total reduces once and broadcasts back, and the remainder ranking
    runs on the two-level global_row_number (bucket ids frozen by the
    r11 lazy-checkpoint fix) — no single-task global window at
    extreme group counts."""
    from slacken_spark.functions.packing import hamilton_allocate

    sw = (
        _sized_docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("ntok").cast("long").alias("w"))
    )
    return hamilton_allocate(sw, 100000, ["source"], "w")


# ---------------------------------------------------------------------------
# Sequence packing (greedy per-group sample packing for training)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256


@register(
    "pack_sequences",
    f"""
    WITH RECURSIVE d AS (
        SELECT doc_id, source,
               len({SQL_TOKENS.format(expr='text')}) AS ntok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ),
    p AS (
        SELECT doc_id, source, ntok, rn, ntok AS acc, 0 AS pack_id
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.doc_id, d.source, d.ntok, d.rn,
               CASE WHEN p.acc + d.ntok > {_PACK_BUDGET}
                    THEN d.ntok ELSE p.acc + d.ntok END,
               CASE WHEN p.acc + d.ntok > {_PACK_BUDGET}
                    THEN p.pack_id + 1 ELSE p.pack_id END
        FROM d JOIN p ON d.source = p.source AND d.rn = p.rn + 1
    )
    SELECT doc_id, source, CAST(pack_id AS BIGINT) AS pack_id,
           CAST(ntok AS BIGINT) AS n_tokens
    FROM p
    """,
)
def pack_sequences(spark, sf_dir):
    """Greedy sample packing: within each source (ordered by doc_id),
    documents fill a pack until the next one would exceed the token
    budget, then a new pack starts — the standard pretraining sample-
    packing shape (functions.packing.pack_greedy, shards=1). The oracle
    replays the same greedy recurrence as a recursive CTE."""
    from slacken_spark.functions.packing import pack_greedy

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(X.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return pack_greedy(docs, _PACK_BUDGET).select(
        "doc_id", "source", "pack_id", "n_tokens"
    )


@register(
    "pack_sequences_sharded",
    f"""
    WITH RECURSIVE d AS (
        SELECT doc_id, source,
               len({SQL_TOKENS.format(expr='text')}) AS ntok,
               CAST(ntile(4) OVER (PARTITION BY source ORDER BY doc_id) - 1
                    AS BIGINT) AS shard_id
        FROM documents
    ),
    d2 AS (
        SELECT *, row_number()
                    OVER (PARTITION BY source, shard_id ORDER BY doc_id) AS rn
        FROM d
    ),
    p AS (
        SELECT doc_id, source, shard_id, ntok, rn, ntok AS acc, 0 AS pack_id
        FROM d2 WHERE rn = 1
        UNION ALL
        SELECT d2.doc_id, d2.source, d2.shard_id, d2.ntok, d2.rn,
               CASE WHEN p.acc + d2.ntok > {_PACK_BUDGET}
                    THEN d2.ntok ELSE p.acc + d2.ntok END,
               CASE WHEN p.acc + d2.ntok > {_PACK_BUDGET}
                    THEN p.pack_id + 1 ELSE p.pack_id END
        FROM d2 JOIN p ON d2.source = p.source AND d2.shard_id = p.shard_id
                      AND d2.rn = p.rn + 1
    )
    SELECT doc_id, source, shard_id, CAST(pack_id AS BIGINT) AS pack_id,
           CAST(ntok AS BIGINT) AS n_tokens
    FROM p
    """,
)
def pack_sequences_sharded(spark, sf_dir):
    """Sharded greedy packing (pack_greedy, shards=4): each source
    splits into 4 contiguous ntile ranges of the doc_id order and packs
    per (source, shard) — the hot-group bound (no single task owns a
    whole source; the greedy chain restarts only at shard boundaries).
    The oracle replays ntile + the per-(source, shard) recurrence."""
    from slacken_spark.functions.packing import pack_greedy

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(X.tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return pack_greedy(docs, _PACK_BUDGET, shards=4).select(
        "doc_id", "source", "shard_id", "pack_id", "n_tokens"
    )


# ---------------------------------------------------------------------------
# Stratified dataset split (train/val/test by deterministic hash)
# ---------------------------------------------------------------------------


@register(
    "dataset_split_counts",
    """
    WITH a AS (
        SELECT source,
               CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT source,
                     CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 100 AS h
              FROM documents) x
    )
    SELECT source, split, count(*) AS n
    FROM a GROUP BY source, split
    """,
)
def dataset_split_counts(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by content-
    independent hash of the doc id — reproducible across engines and
    runs, no shuffle for the assignment itself (map-only); the count
    summarizes occupancy per source stratum."""
    docs = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long") % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return docs.select("source", split.alias("split")).groupBy(
        "source", "split"
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Training-shard manifest (deterministic publish layout)
# ---------------------------------------------------------------------------


@register(
    "dataset_shard_manifest",
    f"""
    WITH d AS (
        SELECT CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) % 8 AS shard_id,
               len({SQL_TOKENS.format(expr='text')}) AS ntok
        FROM documents
    )
    SELECT shard_id, count(*) AS n_rows, CAST(sum(ntok) AS BIGINT) AS n_tokens
    FROM d GROUP BY shard_id
    """,
)
def dataset_shard_manifest(spark, sf_dir):
    """Training-shard manifest: deterministic md5 shard assignment
    (packing.shard_assign — map-only, engine-portable so the published
    shard layout is a contract) rolled up to (shard, rows, tokens).
    The full writer path (repartition-to-shard → partitionBy parquet →
    manifest-from-written) is packing.write_training_shards, e2e-tested
    in tests/test_packing.py."""
    from slacken_spark.functions.packing import shard_assign

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.tokens(F.col("text"))).cast("long").alias("ntok")
    )
    return (
        shard_assign(docs, "doc_id", 8)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Inverted index build (retrieval-side posting lists)
# ---------------------------------------------------------------------------


@register(
    "inverted_index_digest",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM d),
    p AS (SELECT term, count(*) AS df,
                 md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
                   AS postings_digest
          FROM e GROUP BY term)
    SELECT term, CAST(df AS BIGINT) AS df, postings_digest FROM p
    """,
)
def inverted_index_digest(spark, sf_dir):
    """Inverted-index build, flat shape
    (functions.inverted.inverted_index, segment_rows=None): one posting
    list (sorted doc ids) per term — the retrieval-side structure a
    corpus search needs. Explode + distinct collapses per-doc repeats,
    then ONE term-shuffle builds each posting list; lists are compared
    by digest so the gate stays row-shaped. At 100 TB a stopword-grade
    term's list reduces in one task (skew) — ``inverted_index_sharded``
    is the bounded-per-task form; tests/test_inverted.py stress-pins
    the bound on a 50k-doc hot-term corpus."""
    from slacken_spark.functions.inverted import inverted_index, postings_digest

    docs = tp(spark, sf_dir, "documents")
    idx = inverted_index(docs, X.tokens(F.col("text")))
    return idx.select(
        "term", "df", postings_digest(F.col("postings")).alias("postings_digest")
    )


# ---------------------------------------------------------------------------
# Incremental inverted-index maintenance (CDC delta rebuild)
# ---------------------------------------------------------------------------


# ONE definition of the index-maintenance CDC fixture (every 50th doc's
# text replaced by a truncated v2) shared by the delta / patch / ranked
# oracles AND their engine twins — a fixture tweak cannot desynchronize
# the family.
_CDC_UPD_SQL = """upd AS MATERIALIZED (
        SELECT doc_id, 'v2update ' || substr(text, 1, 40) AS text
        FROM documents WHERE doc_id % 50 = 0)"""


def _cdc_upd(docs):
    """DataFrame twin of ``_CDC_UPD_SQL``."""
    return docs.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat(F.lit("v2update "), F.substring("text", 1, 40)).alias("text"),
    )


# shared with catalog_streaming.streaming_index_delta: one availableNow
# micro-batch applies the identical delta, so the stream gates against
# the SAME oracle (the streaming_genomic_classify differential pattern)
DELTA_ORACLE_SQL = f"""
    WITH {_CDC_UPD_SQL},
    merged AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 50 <> 0 AND (doc_id // 10) % 5 = 0
        UNION ALL SELECT doc_id, text FROM upd),
    old_t AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
        FROM documents WHERE doc_id % 50 = 0),
    new_t AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
        FROM upd),
    aff AS MATERIALIZED (SELECT DISTINCT term, doc_id // 10 AS segment
            FROM (SELECT * FROM old_t UNION ALL SELECT * FROM new_t)),
    e AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
        FROM merged),
    p AS MATERIALIZED (
        SELECT term, doc_id // 10 AS segment, doc_id FROM e),
    rebuilt AS MATERIALIZED (
        SELECT p.term, p.segment,
               count(*) AS df_segment,
               md5(string_agg(CAST(p.doc_id AS VARCHAR), ','
                              ORDER BY p.doc_id)) AS segment_digest
        FROM p JOIN aff ON p.term = aff.term AND p.segment = aff.segment
        GROUP BY p.term, p.segment)
    SELECT a.term, CAST(a.segment AS BIGINT) AS segment,
           CAST(coalesce(r.df_segment, 0) AS BIGINT) AS df_segment,
           coalesce(r.segment_digest, md5('')) AS segment_digest
    FROM aff a LEFT JOIN rebuilt r
      ON a.term = r.term AND a.segment = r.segment
    """


@register("inverted_index_delta", DELTA_ORACLE_SQL)
def inverted_index_delta(spark, sf_dir):
    """Incremental inverted-index maintenance — the 100 TB answer to
    "a small update batch must not rebuild (or even rescan) the whole
    index" (functions.inverted.delta_index). The deterministic CDC
    batch updates every 50th doc (text replaced by a truncated v2), so
    with 10-doc segments only ONE segment in five is affected — and the
    plan proves it matters: the affected segment set broadcasts as a
    semi-join filter on the corpus BELOW the tokenize/explode, so the
    four untouched segments' rows are never tokenized, never exploded,
    never shuffled (the r6 shape tokenized + distinct-shuffled the FULL
    merged corpus and only restricted the final aggregation — a 10%
    batch paid a 100% scan). Affected (term, segment) pairs are the old
    OR new version's terms in the changed doc's segment; pairs whose
    rebuilt list is empty emit an explicit df=0 / md5('') tombstone.
    Segments share ``inverted_index_sharded``'s exact floor-division
    key scheme, so rebuilt lists patch the index they maintain. The
    oracle mirrors the pruning in its merged CTE ((doc_id//10) % 5 = 0
    ≡ membership in an affected segment — updates are every 50th doc,
    so affected segments are exactly the multiples of 5)."""
    from slacken_spark.functions.inverted import delta_index, postings_digest

    docs = tp(spark, sf_dir, "documents")
    upd = _cdc_upd(docs)
    out = delta_index(
        docs.select("doc_id", "text"),
        upd,
        X.tokens(F.col("text")),
        "doc_id",
        segment_rows=10,
    )
    return out.select(
        "term",
        "segment",
        "df_segment",
        postings_digest(F.col("postings")).alias("segment_digest"),
    )


# The fine-grained (10-row-segment) base indexes — in production the
# STORED artifacts every maintenance verb reads: the patcher applies
# its delta to the stored index, the compactor merges the stored
# index's segments; neither re-tokenizes the corpus to obtain its
# input (inverted_index_compact's own docstring: "compaction reads
# only INDEX rows"). Persisted app-scoped like _base_sig /
# _doc_components (r13 verdict item 4): before this, patch+compact
# each rebuilt the boolean fine index per invocation and
# ranked_delta+ranked_compact each rebuilt the scored one — four
# corpus tokenize+explode+segment-shuffle passes per bench pass
# pricing work a production maintainer never repeats. The oracles
# still rebuild from scratch, and the bench's queries_first_run
# column carries the build cost.
_FINE_INDEX_CACHE: dict = {}
_FINE_SCORED_CACHE: dict = {}


def _fine_index(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get
    from slacken_spark.functions.inverted import inverted_index

    return app_scoped_get(
        _FINE_INDEX_CACHE,
        spark,
        ("fine_index", sf_dir),
        lambda: inverted_index(
            tp(spark, sf_dir, "documents").select("doc_id", "text"),
            X.tokens(F.col("text")),
            segment_rows=10,
        ).persist(),
    )


def _fine_scored_index(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get
    from slacken_spark.functions.inverted import scored_index

    return app_scoped_get(
        _FINE_SCORED_CACHE,
        spark,
        ("fine_scored_index", sf_dir),
        lambda: scored_index(
            tp(spark, sf_dir, "documents").select("doc_id", "text"),
            X.tokens(F.col("text")),
            segment_rows=10,
        ).persist(),
    )


@register(
    "inverted_index_patch",
    f"""
    WITH {_CDC_UPD_SQL},
    merged AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        UNION ALL SELECT doc_id, text FROM upd),
    e AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
        FROM merged)
    SELECT term, CAST(doc_id // 10 AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS df_segment,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS segment_digest
    FROM e GROUP BY term, doc_id // 10
    """,
)
def inverted_index_patch(spark, sf_dir):
    """The APPLY side of incremental index maintenance
    (functions.inverted.apply_delta), closing the CDC loop: read the
    STORED sharded index of the original corpus (the app-scoped
    ``_fine_index`` stand-in — a production patcher patches a stored
    artifact, it does not rebuild its input), compute the same
    clustered-update delta as ``inverted_index_delta``, apply it —
    affected pairs anti-join out (broadcast, batch-sized), rebuilt
    lists union in, tombstones are pure deletes — and the oracle is
    the strongest invariant available: a FROM-SCRATCH rebuild of the
    merged corpus. Patch ≡ rebuild, row for row, digests included —
    while at 100 TB the patch touches only delta-sized data and the
    rebuild pays the full corpus."""
    from slacken_spark.functions.inverted import (
        apply_delta,
        delta_index,
        postings_digest,
    )

    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    upd = _cdc_upd(docs)
    index = _fine_index(spark, sf_dir)
    delta = delta_index(docs, upd, X.tokens(F.col("text")), "doc_id", 10)
    patched = apply_delta(index, delta)
    return patched.select(
        "term",
        "segment",
        "df_segment",
        postings_digest(F.col("postings")).alias("segment_digest"),
    )


# The RAW ranked delta's oracle (tf twin of DELTA_ORACLE_SQL, same
# pruned-merged CTE) — gates catalog_streaming.streaming_index_ranked_delta,
# whose availableNow micro-batch must emit exactly this delta set.
RANKED_DELTA_ORACLE_SQL = f"""
    WITH {_CDC_UPD_SQL},
    merged AS MATERIALIZED (
        SELECT doc_id, text FROM documents
        WHERE doc_id % 50 <> 0 AND (doc_id // 10) % 5 = 0
        UNION ALL SELECT doc_id, text FROM upd),
    old_t AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
        FROM documents WHERE doc_id % 50 = 0),
    new_t AS MATERIALIZED (
        SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
        FROM upd),
    aff AS MATERIALIZED (SELECT DISTINCT term, doc_id // 10 AS segment
            FROM (SELECT * FROM old_t UNION ALL SELECT * FROM new_t)),
    tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
              FROM merged)
        GROUP BY doc_id, term),
    p AS MATERIALIZED (
        SELECT term, doc_id // 10 AS segment, doc_id, tf FROM tf),
    rebuilt AS MATERIALIZED (
        SELECT p.term, p.segment,
               count(*) AS df_segment,
               md5(string_agg(p.doc_id || ':' || p.tf, ','
                              ORDER BY p.doc_id)) AS segment_digest
        FROM p JOIN aff ON p.term = aff.term AND p.segment = aff.segment
        GROUP BY p.term, p.segment)
    SELECT a.term, CAST(a.segment AS BIGINT) AS segment,
           CAST(coalesce(r.df_segment, 0) AS BIGINT) AS df_segment,
           coalesce(r.segment_digest, md5('')) AS segment_digest
    FROM aff a LEFT JOIN rebuilt r
      ON a.term = r.term AND a.segment = r.segment
    """


@register(
    "inverted_index_ranked_delta",
    f"""
    WITH {_CDC_UPD_SQL},
    merged AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        UNION ALL SELECT doc_id, text FROM upd),
    tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
              FROM merged)
        GROUP BY doc_id, term)
    SELECT term, CAST(doc_id // 10 AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS df_segment,
           md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id))
             AS segment_digest
    FROM tf GROUP BY term, doc_id // 10
    """,
)
def inverted_index_ranked_delta(spark, sf_dir):
    """Incremental maintenance of the RANKED (tf-carrying) index —
    the scored_index family catches up with the boolean one
    (functions.inverted.delta_scored_index): tf is sum-linear over
    documents, so the segment-pruned delta shape transfers verbatim —
    affected segments broadcast-semi-filter the corpus BELOW the
    tokenize, affected (term, segment) tf-postings rebuild, emptied
    pairs tombstone, and the SAME ``apply_delta`` applies the patch.
    Oracle = the strongest invariant: a from-scratch sharded
    ``scored_index`` of the merged corpus — patch ≡ rebuild, row for
    row, tf digests included, while at 100 TB the patch touches only
    delta-sized data. Same CDC fixture as delta/patch (one
    definition, _CDC_UPD_SQL)."""
    from slacken_spark.functions.inverted import (
        apply_delta,
        delta_scored_index,
        scored_postings_digest,
    )

    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    upd = _cdc_upd(docs)
    index = _fine_scored_index(spark, sf_dir)
    delta = delta_scored_index(docs, upd, X.tokens(F.col("text")), "doc_id", 10)
    patched = apply_delta(index, delta)
    return patched.select(
        "term",
        "segment",
        "df_segment",
        scored_postings_digest(F.col("postings")).alias("segment_digest"),
    )


# ---------------------------------------------------------------------------
# Corpus upsert (CDC latest-wins merge — dataset versioning)
# ---------------------------------------------------------------------------

# ONE definition of the deterministic version history shared by the
# whole dataset-versioning family (corpus_upsert_latest reads HEAD of
# versions 1-2; corpus_read_asof reads AS OF 2 with version 3 present)
# — a change to an update-batch rule cannot desynchronize the family.
# v1 = base corpus, v2 touches every 10th doc, v3 every 20th.
_VERSION_RULES = [
    (2, 10, "v2 "),
    (3, 20, "v3 "),
]


def _versions_sql(upto: int) -> str:
    """CTE body ``versions`` = (doc_id, text, version) for versions
    1..upto."""
    parts = ["SELECT doc_id, text, 1 AS version FROM documents"]
    for v, mod, prefix in _VERSION_RULES:
        if v <= upto:
            parts.append(
                f"SELECT doc_id, '{prefix}' || text AS text, {v} AS version"
                f"\n        FROM documents WHERE doc_id % {mod} = 0"
            )
    return "\n        UNION ALL\n        ".join(parts)


def _version_history(docs, upto: int):
    """DataFrame twin of ``_versions_sql``."""
    out = docs.select("doc_id", "text", F.lit(1).alias("version"))
    for v, mod, prefix in _VERSION_RULES:
        if v <= upto:
            out = out.unionAll(
                docs.where(F.col("doc_id") % mod == 0).select(
                    "doc_id",
                    F.concat(F.lit(prefix), F.col("text")).alias("text"),
                    F.lit(v).alias("version"),
                )
            )
    return out


@register(
    "corpus_upsert_latest",
    f"""
    WITH versions AS (
        {_versions_sql(2)}),
    r AS (SELECT doc_id, text, version,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY version DESC) AS rn
          FROM versions)
    SELECT doc_id, CAST(version AS BIGINT) AS version, md5(text) AS text_digest
    FROM r WHERE rn = 1
    """,
)
def corpus_upsert_latest(spark, sf_dir):
    """CDC-style corpus upsert: merge an update batch into the base
    corpus, latest version per doc_id wins (the MERGE INTO / dataset-
    versioning shape every continuously-refreshed training corpus
    needs). Union + one doc_id window — a single key-shuffle; at
    warehouse scale the same plan expresses incremental refreshes where
    the update batch is a stream micro-batch or a daily drop. The
    deterministic 'v2' update batch (every 10th doc) lets the oracle
    replay the merge exactly."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy(F.desc("version"))
    return (
        _version_history(docs, upto=2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("version").cast("long").alias("version"),
            F.md5("text").alias("text_digest"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus version diff (dataset release comparison)
# ---------------------------------------------------------------------------


@register(
    "corpus_diff",
    """
    WITH a AS (SELECT doc_id, md5(text) AS digest FROM documents),
    b AS (SELECT doc_id,
                 md5(CASE WHEN doc_id % 10 = 0 THEN 'v2 ' || text ELSE text END)
                   AS digest
          FROM documents WHERE doc_id % 7 != 3
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, md5('new ' || text) AS digest
          FROM documents WHERE doc_id % 13 = 0),
    j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                 CASE WHEN a.doc_id IS NULL THEN 'added'
                      WHEN b.doc_id IS NULL THEN 'removed'
                      WHEN a.digest != b.digest THEN 'changed'
                      ELSE 'same' END AS status
          FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
    SELECT status, count(*) AS n FROM j GROUP BY status
    """,
)
def corpus_diff(spark, sf_dir):
    """Dataset release diff: full outer join of two corpus versions on
    doc_id, digest comparison → added/removed/changed/same counts (the
    audit every corpus refresh publishes next to its manifest). One
    key-shuffle join on slim (id, digest) rows — text never moves, only
    its hash. Version B is derived deterministically (every 10th doc
    edited, every 7th-mod-3 dropped, every 13th re-added under a new
    id) so the oracle replays the exact diff."""
    docs = t(spark, sf_dir, "documents")
    a = docs.select("doc_id", F.md5("text").alias("digest"))
    b_kept = docs.where(F.col("doc_id") % 7 != 3).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 10 == 0, F.concat(F.lit("v2 "), F.col("text"))
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    b_new = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.md5(F.concat(F.lit("new "), F.col("text"))).alias("digest"),
    )
    b = b_kept.unionAll(b_new)
    j = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.digest") != F.col("b.digest"), "changed")
        .otherwise("same")
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n")
    )


# shared with inverted_index_compact: compaction's invariant is
# row-identity with THIS from-scratch 100-row build, so both gates
# must reference one SQL — an edit in one place cannot desynchronize
# what "from scratch" means
SHARDED_100_ORACLE_SQL = f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM d),
    p AS (SELECT term, doc_id // 100 AS segment, doc_id FROM e)
    SELECT term, CAST(segment AS BIGINT) AS segment,
           count(*) AS df_segment,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS segment_digest
    FROM p GROUP BY term, segment
    """


@register("inverted_index_sharded", SHARDED_100_ORACLE_SQL)
def inverted_index_sharded(spark, sf_dir):
    """Range-sharded posting lists
    (functions.inverted.inverted_index, segment_rows=100): the hot-term
    answer the flat inverted index's docstring promises. Posting lists
    build per (term, doc_id-range segment), so a stopword-grade term
    that appears in EVERY document reduces across |docs|/100 bounded
    tasks instead of one — no single reducer ever holds a full hot
    list (bound stress-pinned in tests/test_inverted.py). Readers
    merge segments in segment order (they are disjoint, pre-sorted
    ranges); the oracle reproduces each segment digest exactly."""
    from slacken_spark.functions.inverted import inverted_index, postings_digest

    docs = tp(spark, sf_dir, "documents")
    idx = inverted_index(docs, X.tokens(F.col("text")), segment_rows=100)
    return idx.select(
        "term",
        "segment",
        "df_segment",
        postings_digest(F.col("postings")).alias("segment_digest"),
    )




# ---------------------------------------------------------------------------
# Index segment compaction (LSM maintenance: build -> delta -> patch -> compact)
# ---------------------------------------------------------------------------


@register("inverted_index_compact", SHARDED_100_ORACLE_SQL)
def inverted_index_compact(spark, sf_dir):
    """LSM-style segment compaction, the fourth index-maintenance verb
    (functions.inverted.compact_segments): merge every 10 adjacent
    10-row segments of the sharded index into one 100-row segment.
    The oracle is the strongest invariant available — a FROM-SCRATCH
    100-row-sharded build of the same corpus, equal row for row,
    digests included (compaction must be indistinguishable from having
    built coarse in the first place). At 100 TB the from-scratch build
    re-tokenizes every document; compaction reads only INDEX rows
    (already tokenized — orders of magnitude smaller), moves posting
    lists whole (fine segments are disjoint sorted ranges, so the
    merge is concatenation in segment order — no explode, no re-sort),
    and pays one key-shuffle on (term, coarse segment)."""
    from slacken_spark.functions.inverted import (
        compact_segments,
        postings_digest,
    )

    fine = _fine_index(spark, sf_dir)
    idx = compact_segments(fine, 10)
    return idx.select(
        "term",
        "segment",
        "df_segment",
        postings_digest(F.col("postings")).alias("segment_digest"),
    )


@register(
    "inverted_index_ranked_compact",
    f"""
    WITH tf AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
              FROM documents)
        GROUP BY doc_id, term)
    SELECT term, CAST(doc_id // 100 AS BIGINT) AS segment,
           CAST(count(*) AS BIGINT) AS df_segment,
           md5(string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id))
             AS segment_digest
    FROM tf GROUP BY term, doc_id // 100
    """,
)
def inverted_index_ranked_compact(spark, sf_dir):
    """LSM compaction of the RANKED index: ``compact_segments`` is
    postings-type-generic (df sums, disjoint sorted segment lists
    concatenate in segment order — true whether a list element is a
    doc id or a (doc_id, tf) struct), so the scored index gets the
    same maintenance verb with ZERO new shuffle machinery. Merging
    ten 10-row segments must equal a from-scratch 100-row-sharded
    ``scored_index`` of the same corpus — the oracle, tf digests
    included. Completes the ranked family: build / delta / patch /
    COMPACT / flatten / serve."""
    from slacken_spark.functions.inverted import (
        compact_segments,
        scored_postings_digest,
    )

    fine = _fine_scored_index(spark, sf_dir)
    idx = compact_segments(fine, 10)
    return idx.select(
        "term",
        "segment",
        "df_segment",
        scored_postings_digest(F.col("postings")).alias("segment_digest"),
    )


# ---------------------------------------------------------------------------
# Training-batch layout: concat-and-chunk block plan, epoch shuffle
# ---------------------------------------------------------------------------


@register(
    "token_block_plan",
    f"""
    WITH d AS (SELECT doc_id,
                      len({SQL_TOKENS.format(expr='text')}) AS sz
               FROM documents),
    s AS (SELECT doc_id, sz,
                 CAST(sum(sz) OVER (ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) - sz AS BIGINT)
                   AS start
          FROM d WHERE sz > 0),
    b AS (SELECT doc_id, sz, start,
                 unnest(range(start // 512, (start + sz - 1) // 512 + 1))
                   AS block_id
          FROM s)
    SELECT doc_id,
           CAST(block_id AS BIGINT) AS block_id,
           CAST(greatest(start, block_id * 512) - start AS BIGINT)
             AS doc_offset,
           CAST(greatest(start, block_id * 512) - block_id * 512 AS BIGINT)
             AS block_offset,
           CAST(least(start + sz, (block_id + 1) * 512)
                - greatest(start, block_id * 512) AS BIGINT) AS n_toks
    FROM b
    """,
)
def token_block_plan(spark, sf_dir):
    """Concat-and-chunk block plan (functions.packing.token_blocks):
    documents concatenate into one virtual token stream in doc_id
    order, cut into fixed 512-token blocks; one output row per
    (document, block) overlap says which doc slice fills which block
    slot — the GPT-pretraining batch layout, computed as pure integer
    arithmetic over token counts (no tokens move). The document start
    offsets — a GLOBAL prefix sum, the classic single-task trap — are
    computed as a two-level distributed prefix sum: range-partition on
    the id (sampled boundaries, balanced for dense AND hash-derived
    ids), cumsum per partition in parallel, and cumsum the
    exactly-``buckets``-row totals once, broadcast back; the oracle's
    single global window is the small-N exact form of the same sum.
    token_blocks scans its input twice (window
    branch + totals branch), so the tokenize runs over the PERSISTED
    table — a production corpus would carry the token count as a
    stored column."""
    from slacken_spark.functions.packing import token_blocks

    docs = tp(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.tokens(F.col("text"))).cast("long").alias("ntok")
    )
    return token_blocks(docs, 512, "doc_id", "ntok", buckets=64)


@register(
    "epoch_shuffle_plan",
    f"""
    WITH d AS (SELECT doc_id,
                      {SQL_H64.format(expr="'ep1_' || CAST(doc_id AS VARCHAR)")}
                        AS h
               FROM documents)
    SELECT doc_id,
           CAST(h % 8 AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
                AS BIGINT) AS position
    FROM d
    """,
)
def epoch_shuffle_plan(spark, sf_dir):
    """Deterministic epoch shuffle (functions.packing.epoch_shuffle):
    every document gets a pseudorandom md5 order key salted by the
    epoch number, a shard (pmod(key, 8)), and its position within the
    shard — the (shard, position) address a training loader streams
    epoch 1 from. Hash-derived rather than random so a preempted epoch
    resumes bit-identically and every engine agrees on the layout.
    One shuffle on the shard key; the within-shard sort is the
    standard shuffle-sort with shards as the parallelism unit."""
    from slacken_spark.functions.packing import epoch_shuffle

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return epoch_shuffle(docs, "doc_id", shards=8, epoch=1)


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized dataset-stats view + CDC)
# ---------------------------------------------------------------------------


# shared with catalog_streaming.streaming_source_stats: one availableNow
# micro-batch applies the identical CDC batch, so the stream gates
# against the SAME oracle (the streaming_index_delta pattern)
SOURCE_STATS_ORACLE_SQL = f"""
    WITH upd AS MATERIALIZED (
        SELECT doc_id, 'cdc' AS source,
               'v2update ' || substr(text, 1, 40) AS text
        FROM documents WHERE doc_id % 50 = 0),
    merged AS MATERIALIZED (
        SELECT doc_id, source, text FROM documents WHERE doc_id % 50 <> 0
        UNION ALL SELECT doc_id, source, text FROM upd)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({SQL_TOKENS.format(expr='text')})) AS BIGINT)
             AS n_tokens
    FROM merged GROUP BY source
    """


@register("source_stats_maintain", SOURCE_STATS_ORACLE_SQL)
def source_stats_maintain(spark, sf_dir):
    """Incremental aggregate maintenance (functions.ivm.
    maintain_grouped_sums) — the materialized-view member of the
    maintenance family: the per-source (doc count, token sum) dataset
    card stays current under a CDC replacement batch WITHOUT
    re-aggregating the corpus (SUM/COUNT are self-maintainable: the
    view absorbs batch-new minus batch-old contributions through one
    group-cardinality-sized full-outer merge; the old rows fetch by a
    broadcast semi-join on the changed ids, which parquet pushes into
    the scan). The deterministic CDC batch rewrites every 50th doc's
    text AND moves it to a brand-new 'cdc' source, so the oracle — a
    from-scratch re-aggregation of the merged corpus — exercises group
    moves, a never-seen group, and count/sum updates at once;
    maintained ≡ recomputed, row for row."""
    from slacken_spark.functions.ivm import maintain_grouped_sums

    docs = tp(spark, sf_dir, "documents").select("doc_id", "source", "text")
    size = F.size(X.tokens(F.col("text"))).cast("long")
    view = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(size).cast("long").alias("n_tokens"),
    )
    upd = docs.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.lit("cdc").alias("source"),
        F.concat(F.lit("v2update "), F.substring("text", 1, 40)).alias("text"),
    )
    return maintain_grouped_sums(view, docs, upd, "source", size)


# The stored coarse (100-row-segment) index the serve path reads —
# the same artifact inverted_index_sharded builds (and prices); the
# query entry prices RETRIEVAL, like a production query server hitting
# a stored index (r14, the _fine_index convention applied to the read
# path).
_COARSE_INDEX_CACHE: dict = {}


def _coarse_index(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get
    from slacken_spark.functions.inverted import inverted_index

    return app_scoped_get(
        _COARSE_INDEX_CACHE,
        spark,
        ("coarse_index", sf_dir),
        lambda: inverted_index(
            tp(spark, sf_dir, "documents").select("doc_id", "text"),
            X.tokens(F.col("text")),
            segment_rows=100,
        ).persist(),
    )


_QUERY_TERMS = ("hash", "join", "scan", "filter")
# explicit SQL IN-list: repr(tuple) would emit ('x',) for one element
_QUERY_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _QUERY_TERMS) + ")"


@register(
    "inverted_index_query",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM d),
    m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched
          FROM e WHERE term IN {_QUERY_TERMS_SQL}
          GROUP BY doc_id),
    r AS (SELECT doc_id, n_matched,
                 CAST(row_number() OVER (ORDER BY n_matched DESC, doc_id)
                      AS BIGINT) AS rank
          FROM m)
    SELECT doc_id, n_matched, rank FROM r WHERE rank <= 20
    """,
)
def inverted_index_query(spark, sf_dir):
    """The index family's READ path (functions.inverted.query_index):
    boolean-OR retrieval of the top-20 documents by query-term match
    count from the sharded index the other operators build, patch,
    and compact — closing the lifecycle with serving. The index is the
    app-scoped STORED coarse index (r14 — a query server reads a
    stored artifact; it does not re-tokenize the corpus per query, and
    the inverted_index_sharded entry already prices that build). Query
    terms broadcast as a left-semi join so only their posting lists
    are touched (explode bounded by the query terms' df, never the
    index); one doc-id shuffle; the global top-k is the distributed
    TakeOrdered (per-partition heaps, one 20-row merge — no
    corpus-wide sort; plan-asserted), with ranks attached over the
    20 surviving rows. The oracle recomputes retrieval straight from
    the corpus — the index must answer exactly what a scan would."""
    from slacken_spark.functions.inverted import query_index

    return query_index(_coarse_index(spark, sf_dir), list(_QUERY_TERMS), 20)


@register(
    "corpus_read_asof",
    f"""
    WITH versions AS (
        {_versions_sql(3)}),
    r AS (SELECT doc_id, text, version,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY version DESC) AS rn
          FROM versions WHERE version <= 2)
    SELECT doc_id, CAST(version AS BIGINT) AS version_used,
           md5(text) AS text_digest
    FROM r WHERE rn = 1
    """,
)
def corpus_read_asof(spark, sf_dir):
    """Time-travel read (SELECT ... VERSION AS OF k): with a version
    history of base (v1) plus two CDC drops (v2 touches every 10th
    doc, v3 every 20th), reconstruct the corpus AS OF version 2 —
    each doc resolves to its latest version ≤ 2, so v3 rows must be
    invisible and v2 docs must NOT fall back to v1 (reading a MIDDLE
    version proves the filter is bounded on both sides, not
    latest-wins). Completes the dataset-versioning family:
    corpus_upsert_latest (HEAD read) / corpus_diff (release compare) /
    this (historical read — what reproducing last month's training
    run needs). Same single doc_id-window shuffle as the upsert; the
    version filter prunes BEFORE the window, so cost scales with the
    surviving versions, exactly like a table format replaying its
    log up to snapshot k."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy(F.desc("version"))
    return (
        _version_history(docs, upto=3)
        .where(F.col("version") <= 2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("version").cast("long").alias("version_used"),
            F.md5("text").alias("text_digest"),
        )
    )
