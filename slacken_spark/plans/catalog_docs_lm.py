"""Query catalog, part 2f: LM-data statistics — the per-document
bigram language-model quality scorer (the consumer of
``ngram_lm_counts``'s corpus tables) and the integer-exact systematic
PPS corpus sampler (token-budget corpus selection). Registers into
the same QUERIES registry as the other catalog modules and shares
``catalog_docs``'s portability constants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.functions import text as X
from slacken_spark.plans.catalog import register, t, tp
from slacken_spark.plans.catalog_docs import SQL_TOKENS


@register(
    "doc_bigram_lm_scores",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks
               FROM documents),
    bg AS (SELECT doc_id, toks[CAST(i AS INT)] AS l,
                  toks[CAST(i+1 AS INT)] AS r
           FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
                 FROM d)),
    c AS MATERIALIZED (
        SELECT l, r, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY l, r),
    cont AS (SELECT r, CAST(count(*) AS BIGINT) AS cont_r FROM c GROUP BY r),
    sc AS (
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(CASE WHEN c.n >= 30 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_known,
               CAST(sum(c.n) AS BIGINT) AS sum_n,
               CAST(sum(cont.cont_r) AS BIGINT) AS sum_cont
        FROM bg JOIN c USING (l, r) JOIN cont USING (r)
        GROUP BY bg.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(sc.n_known, 0) AS BIGINT) AS n_known,
           CAST(coalesce(sc.sum_n, 0) AS BIGINT) AS sum_n,
           CAST(coalesce(sc.sum_cont, 0) AS BIGINT) AS sum_cont,
           CASE WHEN coalesce(sc.n_bigrams, 0) > 0
                THEN CAST(sc.n_known AS DOUBLE) / sc.n_bigrams
           END AS known_frac
    FROM d LEFT JOIN sc USING (doc_id)
    """,
)
def doc_bigram_lm_scores(spark, sf_dir):
    """Per-document bigram LM quality signals
    (functions.text.bigram_lm_scores, min_count=30) — the
    document-scoring consumer of ``ngram_lm_counts``'s corpus tables:
    a CCNet-style quality filter thresholds on these instead of a
    floating LM perplexity. Per doc: adjacent-pair count, pairs known
    to the corpus (count ≥ 30 — template text scores high, OCR noise
    and wrong-language text low), corpus popularity mass, Kneser-Ney
    continuation mass (context diversity — separates natural reuse
    from copy-paste boilerplate), and known_frac = n_known/n_bigrams
    (every statistic an INTEGER plus that one int/int division, so
    the float hash-gates bit-exact). Pair construction is the ONE
    shared ``bigram_count_tables`` definition with ngram_lm_counts —
    the tables and their consumer cannot drift. Scale shape: one
    posexplode + lead window (single doc_id shuffle) builds pairs,
    the pair table reduces on a vocab²-bounded partial-agg shuffle,
    the continuation count reduces ALREADY-aggregated pairs, both
    stat joins are size-based broadcasts (never forced hints — an
    open-vocabulary outlier degrades to a shuffle join instead of
    OOMing), and <2-token docs rejoin as zero rows with NULL
    known_frac."""
    docs = tp(spark, sf_dir, "documents")
    return X.bigram_lm_scores(docs, "text", "doc_id", 30)


@register(
    "corpus_pps_sample",
    f"""
    WITH d AS (SELECT doc_id,
                      CAST(len({SQL_TOKENS.format(expr='text')}) AS BIGINT)
                        AS ntok
               FROM documents),
    c AS (SELECT doc_id, ntok,
                 CAST(sum(ntok) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS cum
          FROM d)
    SELECT doc_id, ntok, cum,
           CAST(cum // 1000 - (cum - ntok) // 1000 AS BIGINT) AS n_hits
    FROM c WHERE cum // 1000 - (cum - ntok) // 1000 > 0
    """,
)
def corpus_pps_sample(spark, sf_dir):
    """Token-budget corpus selection by systematic PPS sampling
    (operators.relational_ext.pps_systematic_sample, stride=1000
    tokens): lay the documents end-to-end by token count in doc_id
    order and keep every document whose cumulative token interval
    crosses a 1000-token mark — long documents proportionally more
    likely, expected sample mass = total_tokens/stride, with ZERO
    floating point (selection and multiplicity are integer arithmetic
    over the distributed prefix sum, so any engine reproduces the
    exact row set; the oracle's window cumsum + closed form is that
    proof). n_hits > 1 records the multiplicity a with-replacement
    design would assign to a document longer than the stride.

    Scale shape: ONE global_prefix_sum — range-partitioned local
    cumsums + a broadcast bucket-offset join, bounded stages, bucket
    ids frozen by the operator's lazy checkpoint (the r11 two-level
    fix: branch agreement never leans on runtime exchange reuse) —
    then a map-side closed-form filter; nothing corpus-sized
    concentrates on one task. Randomness, when wanted, enters by
    ordering on a hash (order_cols=[hash(id)]), keeping the design
    engine-exact."""
    from slacken_spark.operators.relational_ext import pps_systematic_sample

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.tokens(F.col("text"))).cast("long").alias("ntok")
    )
    return pps_systematic_sample(docs, "ntok", 1000, ["doc_id"])
