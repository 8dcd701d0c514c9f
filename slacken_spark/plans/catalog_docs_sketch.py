"""Query catalog, part 2e: SKETCH operators — Count-Min heavy
hitters (batch + CDC maintenance; the streaming twin lives in
``catalog_streaming``). Split from ``catalog_docs`` when it hit the
1k-line budget; registers into the same QUERIES registry and shares
its portability constants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.functions import text as X
from slacken_spark.plans.catalog import register, tp
from slacken_spark.plans.catalog_docs import SQL_H64, SQL_TOKENS


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy hitters
# ---------------------------------------------------------------------------

# sketch geometry + report threshold for the word-bigram stream
# (~916 distinct bigrams at the gate SFs → real cell collisions at
# width 512, so the est >= exact semantics are observable, not vacuous)
_CMS_D, _CMS_W, _CMS_T = 3, 512, 40


def _sql_cms_h(i: int) -> str:
    return SQL_H64.format(expr=f"'cms{i}_' || term") + f" % {_CMS_W}"


# shared with catalog_streaming.streaming_heavy_hitters: the stream
# accumulates the same grid per micro-batch (cms_merge), so it gates
# against the SAME oracle — the differential pattern
CMS_ORACLE_SQL = f"""
    WITH d AS MATERIALIZED (
        SELECT {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    o AS MATERIALIZED (
        SELECT unnest(list_transform(
                   range(0, greatest(len(toks) - 1, 0)),
                   i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]))
               AS term
        FROM d),
    h AS MATERIALIZED (
        SELECT term, {_sql_cms_h(0)} AS h0, {_sql_cms_h(1)} AS h1,
               {_sql_cms_h(2)} AS h2
        FROM o),
    sk AS MATERIALIZED (
        SELECT row, pos, count(*) AS c FROM (
            SELECT 0 AS row, h0 AS pos FROM h
            UNION ALL SELECT 1, h1 FROM h
            UNION ALL SELECT 2, h2 FROM h)
        GROUP BY row, pos),
    tc AS MATERIALIZED (
        SELECT term, h0, h1, h2, count(*) AS n FROM h
        GROUP BY term, h0, h1, h2)
    SELECT tc.term,
           CAST(least(s0.c, s1.c, s2.c) AS BIGINT) AS cms_est,
           CAST(tc.n AS BIGINT) AS n_exact
    FROM tc
    JOIN sk s0 ON s0.row = 0 AND s0.pos = tc.h0
    JOIN sk s1 ON s1.row = 1 AND s1.pos = tc.h1
    JOIN sk s2 ON s2.row = 2 AND s2.pos = tc.h2
    WHERE least(s0.c, s1.c, s2.c) >= {_CMS_T}
    """


def cms_occurrences(docs):
    """The ONE definition of the CMS term stream (word-bigram
    occurrences, non-distinct) — shared by the batch query and the
    streaming accumulator so a tokenizer change cannot desynchronize
    them from the shared oracle."""
    return X.shingle_rows(docs, "text", "doc_id", n=2, distinct=False).select(
        F.col("shingle").alias("term")
    )


@register("doc_heavy_hitters_cms", CMS_ORACLE_SQL)
def doc_heavy_hitters_cms(spark, sf_dir):
    """Count-Min-Sketch heavy hitters over the word-bigram stream
    (functions.sketch.cms_heavy_hitters): pass 1 folds every occurrence
    into a fixed 3x512 counter grid (mergeable — map-side partial agg
    collapses each task to grid size before one tiny shuffle); the grid
    comes back as three BROADCAST hash joins probed map-side per
    occurrence, and only occurrences whose estimate clears the
    threshold enter the exact per-term count shuffle. CMS never
    undercounts, so the pre-shuffle filter cannot lose a true heavy
    hitter — the long tail (the overwhelming term mass at corpus
    scale) is pruned BEFORE the only per-term shuffle. Collision
    false positives surface honestly as ``n_exact < threshold`` rows;
    md5-derived row hashes make every collision engine-portable, so
    the oracle reproduces estimates exactly.

    CMS is inherently TWO-PASS: the plan's sketch branch and probe
    branch each tokenize+shingle the corpus once (Spark does not dedupe
    common subplans). That second scan is the deliberate trade — the
    alternative is materializing the corpus-sized occurrence stream,
    which at 100 TB costs more than re-deriving it from the (persisted)
    table scan; the streaming twin pays the sketch pass incrementally
    and probes once."""
    from slacken_spark.functions.sketch import cms_heavy_hitters

    docs = tp(spark, sf_dir, "documents")
    return cms_heavy_hitters(
        cms_occurrences(docs), _CMS_T, "term", depth=_CMS_D, width=_CMS_W
    )


@register(
    "doc_heavy_hitters_delta",
    f"""
    WITH upd AS MATERIALIZED (
        SELECT doc_id, 'v2update ' || substr(text, 1, 40) AS text
        FROM documents WHERE doc_id % 50 = 0),
    merged AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        UNION ALL SELECT doc_id, text FROM upd),
    d AS MATERIALIZED (
        SELECT {SQL_TOKENS.format(expr='text')} AS toks FROM merged),
    o AS MATERIALIZED (
        SELECT unnest(list_transform(
                   range(0, greatest(len(toks) - 1, 0)),
                   i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]))
               AS term
        FROM d),
    h AS MATERIALIZED (
        SELECT {_sql_cms_h(0)} AS h0, {_sql_cms_h(1)} AS h1,
               {_sql_cms_h(2)} AS h2
        FROM o)
    SELECT row, pos, count(*) AS c FROM (
        SELECT 0 AS row, h0 AS pos FROM h
        UNION ALL SELECT 1, h1 FROM h
        UNION ALL SELECT 2, h2 FROM h)
    GROUP BY row, pos
    """,
)
def doc_heavy_hitters_delta(spark, sf_dir):
    """Incremental CMS maintenance under CDC
    (functions.sketch.cms_maintain) — the sketch member of the
    maintenance family (the grid is LINEAR, so document replacement is
    grid' = grid − grid(old occurrences) + grid(new occurrences),
    cell-exact with NO corpus rescan on the maintenance path; zero
    cells drop so maintained ≡ rebuilt). The deterministic CDC batch
    rewrites every 50th doc's text; old occurrences fetch by a
    broadcast semi-join on the changed ids, both partial grids are
    batch-bounded, and the oracle is the strongest invariant — the
    from-scratch grid of the MERGED corpus, cell for cell. Completes
    sketch maintenance across batch (doc_heavy_hitters_cms), streaming
    (streaming_heavy_hitters), and CDC."""
    from slacken_spark.functions.sketch import cms_maintain, cms_sketch

    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    upd = docs.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat(F.lit("v2update "), F.substring("text", 1, 40)).alias("text"),
    )
    grid = cms_sketch(
        cms_occurrences(docs), depth=_CMS_D, width=_CMS_W
    )
    old_docs = docs.join(
        F.broadcast(upd.select("doc_id")), "doc_id", "left_semi"
    )
    return cms_maintain(
        grid,
        cms_occurrences(old_docs),
        cms_occurrences(upd),
        depth=_CMS_D,
        width=_CMS_W,
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch → approximate quantiles
# ---------------------------------------------------------------------------

_HQ_BIN = 250  # cents per bin: ≤ ~200 bins over the value range


# shared by the batch operator and its streaming twin
# (catalog_streaming.streaming_value_quantiles): the sketch is
# mergeable by count addition, so the stream must reproduce the batch
# read-off exactly
VALUE_QUANTILE_ORACLE_SQL = f"""
    WITH h AS (
        SELECT event_type AS grp,
               CAST(round(value*100) AS BIGINT) // {_HQ_BIN} AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2),
    c AS (
        SELECT grp, bin, n,
               sum(n) OVER (PARTITION BY grp ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum,
               sum(n) OVER (PARTITION BY grp) AS ntot
        FROM h)
    SELECT grp AS event_type, CAST(max(ntot) AS BIGINT) AS n,
           CAST(min(CASE WHEN cum >= (ntot*50 + 99) // 100
                         THEN (bin+1)*{_HQ_BIN} END) AS BIGINT)
             AS q50_ub_cents,
           CAST(min(CASE WHEN cum >= (ntot*95 + 99) // 100
                         THEN (bin+1)*{_HQ_BIN} END) AS BIGINT)
             AS q95_ub_cents
    FROM c GROUP BY grp
    """


@register("value_quantile_sketch", VALUE_QUANTILE_ORACLE_SQL)
def value_quantile_sketch(spark, sf_dir):
    """Approximate per-group quantiles through a fixed-bin histogram
    sketch (functions.sketch.histogram_sketch / histogram_quantiles)
    — the bounded-memory member of the quantile family next to the
    exact ``value_percentiles``: the corpus pays ONE map-side partial
    aggregation into ≤ groups × ~200 bins (never a value sort or a
    per-value shuffle), the histograms are mergeable by count
    addition (same contract as the CMS grid — disjoint slices /
    micro-batches fold in losslessly), and the p50/p95 read-off
    touches only sketch-sized rows. Error is bounded by the bin width
    (the answer is each quantile's bin UPPER bound in cents); all
    arithmetic is int64, so the approximation itself is engine-exact
    and hash-gates. The oracle replays the identical binning and
    cumulative read-off."""
    from slacken_spark.functions.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )
    from slacken_spark.plans.catalog import t

    ev = t(spark, sf_dir, "events")
    hist = histogram_sketch(
        ev, "event_type", F.round(F.col("value") * 100), _HQ_BIN
    )
    q = histogram_quantiles(hist, _HQ_BIN, [50, 95])
    return q.select(
        F.col("grp").alias("event_type"), "n", "q50_ub_cents", "q95_ub_cents"
    )


@register(
    "value_quantile_delta",
    f"""
    WITH m AS (
        SELECT event_type,
               CASE WHEN event_id % 25 = 0 THEN value + 10
                    ELSE value END AS value
        FROM events)
    SELECT event_type,
           CAST(round(value*100) AS BIGINT) // {_HQ_BIN} AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM m GROUP BY 1, 2
    """,
)
def value_quantile_delta(spark, sf_dir):
    """CDC maintenance for the quantile sketch (functions.sketch.
    histogram_maintain): a correction batch revalues every 25th event
    (+$10), and the stored histogram absorbs it by LINEARITY —
    hist − hist(old rows) + hist(new rows), bin-exact, zero-count
    bins dropped — without rescanning the value column. The oracle is
    the strongest invariant: a from-scratch histogram of the merged
    stream, row for row (the same maintained ≡ rebuilt contract as
    doc_heavy_hitters_delta; sketch maintenance now spans CMS
    batch/stream/CDC and histogram batch/CDC). Cost: two batch-sized
    partial aggregations + one sketch-sized merge shuffle."""
    from slacken_spark.functions.sketch import (
        histogram_maintain,
        histogram_sketch,
    )
    from slacken_spark.plans.catalog import t

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    cents = F.round(F.col("value") * 100)
    hist = histogram_sketch(ev, "event_type", cents, _HQ_BIN)
    old = ev.where(F.col("event_id") % 25 == 0)
    new = old.withColumn("value", F.col("value") + 10)
    out = histogram_maintain(hist, old, new, "event_type", cents, _HQ_BIN)
    return out.select(F.col("grp").alias("event_type"), "bin", "n")
