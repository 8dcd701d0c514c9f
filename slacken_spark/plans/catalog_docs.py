"""Query catalog, part 2a: TEXT-ANALYSIS operators over the
``documents`` table — token stats, quality, language id, PII, scrubs,
TF-IDF, chunking, BPE training/apply, grouping-set reports. Shared
portability constants (``SQL_H64``/``SQL_TOKENS``) live here and are
imported by the sibling ``catalog_docs_*`` modules (dedup, embedding,
pipeline), which round 7 split out of this file by domain.

Portability contract: every hash derives from md5 (`token_hash64` =
first 15 hex chars → bigint), so the DuckDB oracle reproduces Spark's
values bit-for-bit; every ratio is a single int/int division (exact same
IEEE double on both engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from slacken_spark.functions import text as X
from slacken_spark.plans.catalog import register, t, tp

# DuckDB equivalents of the portable building blocks -----------------------

# token_hash64(s): first 15 md5 hex chars as bigint
SQL_H64 = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
# whitespace tokens of trimmed text
SQL_TOKENS = "string_split_regex(trim({expr}), '\\s+')"


# ---------------------------------------------------------------------------
# Text analysis: token stats, quality, language id
# ---------------------------------------------------------------------------


@register(
    "doc_token_stats",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks, text FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           list_sum(list_transform(toks, x -> length(x))) / len(toks) AS mean_token_len
    FROM d
    """,
)
def doc_token_stats(spark, sf_dir):
    # Materialize toks in a prior projection: Catalyst does not CSE the
    # repeated split(), and re-tokenizing per output column is the
    # difference between one and four passes over every document.
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "text", X.tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        X.mean_token_len(toks).alias("mean_token_len"),
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in X.STOPWORDS_EN)


@register(
    "doc_quality",
    f"""
    WITH d AS (SELECT doc_id, text, {SQL_TOKENS.format(expr='text')} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> lower(x) IN ({_STOP_SQL}))) AS BIGINT)
             * 1.0 / greatest(len(toks), 1) AS stopword_ratio,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0
             / greatest(length(text), 1) AS punct_ratio,
           CASE WHEN len(toks) >= 50 THEN 'long' WHEN len(toks) >= 20 THEN 'mid'
                ELSE 'short' END AS length_bucket
    FROM d
    """,
)
def doc_quality(spark, sf_dir):
    """Quality signals via exploded tokens + one codegen'd aggregation
    (the array filter-with-isin lambda runs interpreted per token)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("tok")
    )
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.lower(F.col("tok")).isin(*X.STOPWORDS_EN), 1).otherwise(0)
        ).alias("stop_hits"),
    )
    return docs.join(stats, "doc_id").select(
        "doc_id",
        (F.col("stop_hits") / F.greatest(F.col("n_tokens"), F.lit(1))).alias(
            "stopword_ratio"
        ),
        X.punct_ratio(F.col("text")).alias("punct_ratio"),
        F.when(F.col("n_tokens") >= 50, "long")
        .when(F.col("n_tokens") >= 20, "mid")
        .otherwise("short")
        .alias("length_bucket"),
    )


def _lang_sql_score(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in X.LANG_MARKERS[lang])
    return f"len(list_filter(toks, x -> lower(x) IN ({markers})))"


@register(
    "doc_langid",
    f"""
    WITH d AS (SELECT doc_id, lang, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
                 {_lang_sql_score('en')} AS s_en, {_lang_sql_score('es')} AS s_es,
                 {_lang_sql_score('fr')} AS s_fr, {_lang_sql_score('de')} AS s_de
          FROM d)
    SELECT doc_id, lang AS meta_lang,
           CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_es, s_fr, s_de) THEN 'en'
                WHEN s_es = greatest(s_en, s_es, s_fr, s_de) THEN 'es'
                WHEN s_fr = greatest(s_en, s_es, s_fr, s_de) THEN 'fr'
                ELSE 'de' END AS pred_lang
    FROM s
    """,
)
def doc_langid(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", X.tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    return docs.select(
        "doc_id",
        F.col("lang").alias("meta_lang"),
        X.lang_id(toks).alias("pred_lang"),
    )


@register(
    "doc_bpe_token_stats",
    f"""
    WITH d AS (SELECT doc_id,
                      regexp_extract_all(text, '{X.BPE_PATTERN}') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
           CAST(len(list_filter(toks, x -> x ~ '^[0-9]+$')) AS BIGINT) AS n_number_tokens,
           CAST(len(list_filter(toks, x -> x ~ '^[A-Za-z]+$')) AS BIGINT) AS n_word_tokens
    FROM d
    """,
)
def doc_bpe_token_stats(spark, sf_dir):
    """BPE-style pre-tokenization counts (letters-run / digits-run /
    symbol segmentation) — the tokenizer-budget estimator for training
    pipelines; one regexp pass, codegen'd."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", X.bpe_tokens(F.col("text")).alias("toks")
    )
    toks = F.col("toks")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.filter(toks, lambda x: x.rlike("^[0-9]+$")))
        .cast("long")
        .alias("n_number_tokens"),
        F.size(F.filter(toks, lambda x: x.rlike("^[A-Za-z]+$")))
        .cast("long")
        .alias("n_word_tokens"),
    )


@register(
    "value_percentiles",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def value_percentiles(spark, sf_dir):
    """Exact per-group percentiles (SQL quantile_cont interpolation),
    computed via grouped_exact_quantiles — the two-pass rank-based
    form — instead of Spark's exact `percentile` aggregate, whose
    per-group value→count buffer concentrates a continuous-domain
    corpus into single-reducer state when groups are few. Semantics
    pinned against F.percentile by test; `n` counts all rows per
    group (events.value is non-null, so the helper's non-null count
    is the same number — asserted against the oracle's count(*))."""
    from slacken_spark.operators.relational_ext import (
        grouped_exact_quantiles,
    )

    ev = t(spark, sf_dir, "events")
    q = grouped_exact_quantiles(ev, ["event_type"], "value", [0.5, 0.9, 0.99])
    return q.groupBy("event_type").agg(
        F.max(F.when(F.col("p") == 0.5, F.col("q"))).alias("p50"),
        F.max(F.when(F.col("p") == 0.9, F.col("q"))).alias("p90"),
        F.max(F.when(F.col("p") == 0.99, F.col("q"))).alias("p99"),
        F.max("n").alias("n"),
    )


@register(
    "doc_repetition",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest(list_transform(
                      range(0, greatest(len(toks) - 1, 0)),
                      i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]))
                    AS shingle
           FROM d),
    c AS (SELECT doc_id, shingle, count(*) AS n FROM sh GROUP BY doc_id, shingle)
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_2grams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(n) AS BIGINT) AS top_n
    FROM c GROUP BY doc_id
    """,
)
def doc_repetition(spark, sf_dir):
    """Repetition-based quality signal (the Gopher-style duplicate-
    n-gram rule): per doc, total 2-gram count, distinct count, and the
    top 2-gram's count — consumers derive dup ratios; the catalog emits
    exact integers so the hash gate is float-free. One shuffle: the
    shingle window partitions on doc_id and both aggregations reuse
    that partitioning (doc_id ⊂ both grouping keys → no re-exchange)."""
    docs = tp(spark, sf_dir, "documents")
    sh = X.shingle_rows(docs, "text", "doc_id", n=2, distinct=False)
    c = sh.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("n"))
    return c.groupBy("doc_id").agg(
        F.sum("n").alias("n_2grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("n").alias("top_n"),
    )


@register(
    "doc_unigram_rarity",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT doc_id, unnest(toks) AS tok FROM d),
    f AS (SELECT tok, count(DISTINCT doc_id) AS df FROM e GROUP BY tok)
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(f.df) AS BIGINT) AS sum_df,
           CAST(sum(f.df) AS BIGINT) * 1.0 / count(*) AS mean_df
    FROM e JOIN f USING (tok)
    GROUP BY e.doc_id
    """,
)
def doc_unigram_rarity(spark, sf_dir):
    """Corpus-statistics quality signal: per-token document frequency is
    computed over the whole corpus, broadcast back onto the token rows,
    and aggregated per doc — low mean_df means the doc is full of rare
    tokens (OCR noise, code, another language), the unigram analog of a
    LM perplexity filter but exactly reproducible (integer sums + ONE
    int/int division). Scale shape: token df is a partial-agg shuffle;
    the df table is vocabulary-sized (Heaps' law: ~millions of rows at
    100 TB, megabytes serialized) so it broadcasts; per-doc aggregation
    is the only other shuffle. A trillion-token vocab outlier would flip
    the broadcast to a shuffle join — the plan degrades, not breaks."""
    docs = tp(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("tok"))
    dfreq = e.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        e.join(F.broadcast(dfreq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("df").alias("sum_df"),
            (F.sum("df") * F.lit(1.0) / F.count(F.lit(1))).alias("mean_df"),
        )
    )


@register(
    "doc_boilerplate_scrub",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    nd AS (SELECT CAST(ceil(0.065 * count(*)) AS BIGINT) AS min_df FROM d),
    g AS (SELECT doc_id, unnest(range(0, greatest(len(toks) - 1, 0))) AS pos FROM d),
    gr AS (SELECT g.doc_id, g.pos,
                  d.toks[CAST(g.pos + 1 AS INT)] || ' ' || d.toks[CAST(g.pos + 2 AS INT)] AS gram
           FROM g JOIN d ON g.doc_id = d.doc_id),
    freq AS (SELECT gram FROM gr GROUP BY gram
             HAVING count(DISTINCT doc_id) >= (SELECT min_df FROM nd)),
    cov AS (SELECT DISTINCT gr.doc_id, gr.pos + o.o AS pos
            FROM gr JOIN freq USING (gram), (SELECT unnest([0, 1]) AS o) o),
    tk AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos FROM d),
    tok AS (SELECT tk.doc_id, tk.pos, d.toks[CAST(tk.pos + 1 AS INT)] AS tok
            FROM tk JOIN d ON tk.doc_id = d.doc_id),
    kept AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
             LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
             WHERE cov.doc_id IS NULL),
    reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   count(*) AS n_kept FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(reb.clean_text, '') AS clean_text,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(d.toks) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
    FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id
    """,
)
def doc_boilerplate_scrub(spark, sf_dir):
    """Boilerplate span removal (the CCNet/RefinedWeb line-dedup rule,
    adapted to word 2-grams because this corpus has no line structure):
    any 2-gram present in ≥6.5% of documents is boilerplate; covered token
    positions are dropped and each document's survivors are reassembled
    in order. Emits the cleaned text plus kept/removed counts — the row
    a cleaning pass writes. See functions/text.boilerplate_scrub for the
    broadcast-threshold scale design."""
    docs = tp(spark, sf_dir, "documents")
    return X.boilerplate_scrub(docs, "text", "doc_id", n=2, min_df_frac=0.065)


# ---------------------------------------------------------------------------
# PII redaction (training-data scrubbing: regex ops, exact string output)
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
_PHONE_RE = "\\+1-555-[0-9][0-9][0-9][0-9]"


@register(
    "doc_pii_redact",
    """
    WITH d AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
                 AS enriched
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(enriched, '{email}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(enriched, '{phone}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(enriched, '{email}', '<EMAIL>', 'g'),
                              '{phone}', '<PHONE>', 'g')) AS redacted_digest
    FROM d
    """.format(email=_EMAIL_RE, phone=_PHONE_RE),
)
def doc_pii_redact(spark, sf_dir):
    """PII scrubbing: count and redact emails/phones with codegen'd
    regex ops (regexp_extract_all + regexp_replace — JVM-side, no UDF).
    The synthetic corpus carries no PII, so deterministic addresses are
    appended first; the digest of the redacted text is compared
    bit-for-bit against the oracle (regex dialect kept to the
    Java∩RE2 common subset)."""
    docs = t(spark, sf_dir, "documents")
    enriched = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )
    d = docs.select("doc_id", enriched.alias("enriched"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("enriched", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("enriched", F.lit(_PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("enriched", _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("redacted_digest"),
    )


# ---------------------------------------------------------------------------
# Vocabulary build (top-k terms by document frequency)
# ---------------------------------------------------------------------------


@register(
    "doc_vocab_top50",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT doc_id, unnest(toks) AS term FROM d)
    SELECT term,
           count(*) AS tf,
           count(DISTINCT doc_id) AS df
    FROM e GROUP BY term
    ORDER BY df DESC, tf DESC, term ASC LIMIT 50
    """,
)
def doc_vocab_top50(spark, sf_dir):
    """Vocabulary build: global term/document frequencies, top 50 by df
    (tokenizer-training precursor). Explode + two-level count — partial
    aggregation map-side, one shuffle on the term; the top-k order is
    fully deterministic (df, tf, term) so the LIMIT boundary is
    engine-independent."""
    docs = tp(spark, sf_dir, "documents")
    e = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("term")
    )
    return (
        e.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("term"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Context-window chunking (map-only explode; pretraining doc → window prep)
# ---------------------------------------------------------------------------

_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@register(
    "doc_chunks",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    c AS (SELECT doc_id, toks,
                 range(0, greatest(CAST(ceil((len(toks) - {_CHUNK_LEN}) * 1.0
                                             / {_CHUNK_STRIDE}) AS BIGINT), 0) + 1)
                   AS starts
          FROM d)
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_no,
           CAST(s * {_CHUNK_STRIDE} AS BIGINT) AS tok_start,
           CAST(least(s * {_CHUNK_STRIDE} + {_CHUNK_LEN}, len(toks)) AS BIGINT)
             AS tok_end,
           md5(array_to_string(
               toks[CAST(s * {_CHUNK_STRIDE} + 1 AS BIGINT)
                    :CAST(least(s * {_CHUNK_STRIDE} + {_CHUNK_LEN}, len(toks)) AS BIGINT)],
               ' ')) AS chunk_digest
    FROM c, unnest(starts) AS u(s)
    """,
)
def doc_chunks(spark, sf_dir):
    """Sliding context-window chunking (len 64, stride 48): every doc
    explodes into overlapping token windows, the pretraining doc→sample
    prep step. Map-only: tokenize once, posexplode the window starts,
    slice — no shuffle at all; chunk content is digest-compared."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", X.tokens(F.col("text")).alias("toks")
    )
    n = F.size("toks")
    n_starts = F.greatest(
        F.ceil((n - F.lit(_CHUNK_LEN)) / F.lit(_CHUNK_STRIDE)).cast("long"),
        F.lit(0),
    ) + 1
    d = docs.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_starts - 1)).alias("s"),
    )
    start = F.col("s") * _CHUNK_STRIDE
    end = F.least(start + _CHUNK_LEN, F.size("toks"))
    return d.select(
        "doc_id",
        F.col("s").cast("long").alias("chunk_no"),
        start.cast("long").alias("tok_start"),
        end.cast("long").alias("tok_end"),
        F.md5(
            F.concat_ws(" ", F.slice("toks", start + 1, end - start))
        ).alias("chunk_digest"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (retrieval / topicality features)
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT doc_id, unnest(toks) AS term FROM d),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                                    ORDER BY tf.tf DESC, df.df ASC, tf.term ASC)
                   AS rnk
          FROM tf JOIN df USING (term))
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """Per-document top-3 TF-IDF terms, rank-only formulation: terms
    order by (tf DESC, df ASC, term ASC) — exactly the tf·idf ordering
    for any monotone idf, with zero floats so the hash gate is
    engine-exact.

    Scale shape: one explode + (doc, term) partial-agg shuffle builds
    tf; df reduces the ALREADY-aggregated tf rows (one row per
    (doc, term), not per token) on the term; the vocabulary-sized df
    side broadcasts back (Heaps' law — same argument as
    doc_unigram_rarity); the per-doc ranking window re-shuffles only the
    slim (doc, term, tf, df) rows.
    """
    docs = tp(spark, sf_dir, "documents")
    e = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
    tf = e.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "rnk")
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate-span removal (exact substring dedup)
# ---------------------------------------------------------------------------


@register(
    "doc_dupspan_scrub",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                 array_to_string(toks[CAST(i AS INT):CAST(i + 4 AS INT)], ' ') AS gram
          FROM d, unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS u(i)),
    own AS (SELECT gram, min(doc_id) AS owner
            FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    cov AS (SELECT DISTINCT g.doc_id, CAST(p AS BIGINT) AS pos
            FROM g JOIN own USING (gram), unnest(range(g.pos, g.pos + 5)) AS v(p)
            WHERE g.doc_id != own.owner),
    tok AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[CAST(i AS INT)] AS tok
            FROM d, unnest(range(1, len(toks) + 1)) AS u(i)),
    kept AS (SELECT t.doc_id, t.pos, t.tok
             FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
             WHERE c.pos IS NULL),
    reb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           md5(coalesce(reb.clean_text, '')) AS clean_digest,
           CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(d.toks) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
    FROM d LEFT JOIN reb USING (doc_id)
    """,
)
def doc_dupspan_scrub(spark, sf_dir):
    """Exact duplicate-span removal (Lee et al. 2022 substring dedup as
    a relational plan): any word 5-gram present in ≥2 documents is kept
    only by its lowest-id owner; every other document drops the covered
    positions (functions.text.dupspan_scrub). The oracle replays
    ownership + coverage with list slicing and compares the rebuilt
    text by digest."""
    docs = tp(spark, sf_dir, "documents")
    out = X.dupspan_scrub(docs, "text", "doc_id", n=5)
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_digest"),
        "n_kept",
        "n_removed",
    )


# ---------------------------------------------------------------------------
# BPE tokenizer training (pair statistics + learned merges)
# ---------------------------------------------------------------------------


@register(
    "bpe_top_pairs",
    f"""
    WITH d AS (SELECT regexp_extract_all(text, '{X.BPE_PATTERN}') AS ws FROM documents),
    w AS (SELECT unnest(ws) AS word FROM d),
    wf AS (SELECT word, count(*) AS wc FROM w GROUP BY 1),
    p AS (SELECT substr(word, CAST(i AS INT), 1) AS left_sym,
                 substr(word, CAST(i AS INT) + 1, 1) AS right_sym,
                 wc
          FROM wf, unnest(range(1, greatest(len(word) - 1, 0) + 1)) AS u(i))
    SELECT left_sym, right_sym, CAST(sum(wc) AS BIGINT) AS cnt
    FROM p GROUP BY 1, 2
    ORDER BY cnt DESC, left_sym ASC, right_sym ASC
    LIMIT 20
    """,
)
def bpe_top_pairs(spark, sf_dir):
    """Round-0 BPE pair statistics: the top-20 adjacent character pairs
    weighted by word frequency — the first merge decision of tokenizer
    training, over the vocabulary-sized word-frequency table (ONE corpus
    pass; functions.bpe). Deterministic (cnt, left, right) boundary."""
    from slacken_spark.functions import bpe as B

    wf = B.word_frequencies(tp(spark, sf_dir, "documents"), "text")
    syms = wf.select(B._chars(F.col("word")).alias("symbols"), "wc")
    return (
        B.pair_counts(syms)
        .select(
            F.col("left").alias("left_sym"),
            F.col("right").alias("right_sym"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        .orderBy(F.desc("cnt"), F.asc("left_sym"), F.asc("right_sym"))
        .limit(20)
    )


def _bpe_unrolled_ctes(n_rounds: int) -> list[str]:
    """Fixed-round BPE training unrolled as DuckDB CTEs — the SQL oracle
    for the iterative trainer. Each round is the same four relational
    steps the distributed trainer runs (pair count → deterministic
    argmax → greedy merge → renumber), expressed over a long-form
    (word-id, position, symbol) state table:

    - ``p{k}``: adjacent pairs via ``lead`` per word;
    - ``m{k}``: the round's merge — argmax on (cnt DESC, left, right),
      identical tie-break to ``functions.bpe``;
    - ``c{k}``/``g{k}``: greedy left-to-right selection. Candidates for
      a pair (a, b) with a != b are never adjacent, so all are merged;
      for a == b (a symbol run) the textbook rule merges alternating
      candidates, which is exactly odd-rank-within-consecutive-run;
    - ``t{k}``/``s{k+1}``: selected positions become the merged symbol,
      their right partners drop, positions renumber.

    When a round finds no pair (all words single-symbol), ``m{k}`` is
    empty and the state passes through unchanged — matching the
    trainer's early stop.

    Every CTE is MATERIALIZED: each round's state is referenced more
    than once, and DuckDB's default CTE inlining would re-evaluate the
    whole prefix per reference — exponential in the round count.
    """
    ctes = [
        "d AS (SELECT doc_id, regexp_extract_all(text, '"
        + X.BPE_PATTERN
        + "') AS ws FROM documents)",
        "w0 AS (SELECT unnest(ws) AS word FROM d)",
        "wf AS (SELECT word, count(*) AS wc FROM w0 GROUP BY 1)",
        "wid AS (SELECT row_number() OVER (ORDER BY word) AS wid, word, wc FROM wf)",
        "s0 AS (SELECT wid, wc, CAST(i AS BIGINT) AS pos,"
        " substr(word, CAST(i AS INT), 1) AS sym"
        " FROM wid, unnest(range(1, len(word) + 1)) AS u(i))",
    ]
    for k in range(n_rounds):
        ctes += [
            f"p{k} AS (SELECT wid, wc, pos, sym AS l,"
            f" lead(sym) OVER (PARTITION BY wid ORDER BY pos) AS r FROM s{k})",
            f"m{k} AS (SELECT l, r, CAST(sum(wc) AS BIGINT) AS cnt FROM p{k}"
            " WHERE r IS NOT NULL GROUP BY l, r"
            " ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)",
            f"c{k} AS (SELECT p.wid, p.pos,"
            " p.pos - row_number() OVER (PARTITION BY p.wid ORDER BY p.pos) AS run"
            f" FROM p{k} p JOIN m{k} m ON p.l = m.l AND p.r = m.r)",
            f"g{k} AS (SELECT wid, pos FROM ("
            "SELECT wid, pos, row_number() OVER (PARTITION BY wid, run ORDER BY pos) AS rn"
            f" FROM c{k}) WHERE rn % 2 = 1)",
            f"t{k} AS (SELECT s.wid, s.wc, s.pos,"
            f" CASE WHEN gs.pos IS NOT NULL THEN (SELECT l || r FROM m{k})"
            " ELSE s.sym END AS sym"
            f" FROM s{k} s"
            f" LEFT JOIN g{k} gs ON s.wid = gs.wid AND s.pos = gs.pos"
            f" LEFT JOIN g{k} gd ON s.wid = gd.wid AND s.pos = gd.pos + 1"
            " WHERE gd.pos IS NULL)",
            f"s{k + 1} AS (SELECT wid, wc,"
            " CAST(row_number() OVER (PARTITION BY wid ORDER BY pos) AS BIGINT) AS pos,"
            f" sym FROM t{k})",
        ]
    return [c.replace(" AS (", " AS MATERIALIZED (", 1) for c in ctes]


def _bpe_merges_sql(n_rounds: int) -> str:
    union = "\n    UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_rank, l AS left_sym,"
        f" r AS right_sym, cnt FROM m{k}"
        for k in range(n_rounds)
    )
    return "WITH " + ",\n".join(_bpe_unrolled_ctes(n_rounds)) + "\n" + union


def _bpe_apply_counts_sql(n_rounds: int) -> str:
    ctes = _bpe_unrolled_ctes(n_rounds) + [
        f"wlen AS MATERIALIZED (SELECT wid, count(*) AS n_syms"
        f" FROM s{n_rounds} GROUP BY wid)",
        "wmap AS MATERIALIZED (SELECT w.word, l.n_syms"
        " FROM wid w JOIN wlen l USING (wid))",
        "dw AS MATERIALIZED (SELECT doc_id, unnest(ws) AS word FROM d)",
        "dc AS MATERIALIZED (SELECT dw.doc_id, CAST(sum(m.n_syms) AS BIGINT) AS n"
        " FROM dw JOIN wmap m USING (word) GROUP BY dw.doc_id)",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + "\nSELECT d2.doc_id, coalesce(dc.n, CAST(0 AS BIGINT)) AS n_bpe_symbols"
        + "\nFROM documents d2 LEFT JOIN dc USING (doc_id)"
    )


# One BPE training per (application, sf_dir): the merge sequence is
# prefix-consistent (round k depends only on rounds < k), so any query
# needing n merges slices the longest list trained so far — the same
# build-once/use-many shape as the index and components caches. The
# cached value is a plain driver-side list (no persisted blocks).
_BPE_MERGES_CACHE: dict = {}


def _bpe_merges(spark, sf_dir, n: int):
    from slacken_spark.appcache import app_scoped_get
    from slacken_spark.functions import bpe as B

    def build():
        # cache (target, merges): the target distinguishes "trained for
        # fewer rounds" (retrain longer) from "corpus exhausted its
        # mergeable pairs early" (never retrain — it cannot grow)
        return (
            n,
            B.bpe_train(tp(spark, sf_dir, "documents"), "text", n_merges=n),
        )

    target, merges = app_scoped_get(_BPE_MERGES_CACHE, spark, sf_dir, build)
    if len(merges) < n and target < n:
        # trained for fewer rounds than requested — retrain longer and
        # replace (prefix consistency keeps earlier users valid)
        target, merges = build()
        app_id = spark.sparkContext.applicationId
        _BPE_MERGES_CACHE[(app_id, sf_dir)] = (target, merges)
    return merges[:n]


@register("bpe_learned_merges", _bpe_merges_sql(6))
def bpe_learned_merges(spark, sf_dir):
    """Six learned BPE merges over the corpus (functions.bpe.bpe_train).
    The trainer is genuinely iterative — each round's merge decision
    feeds the next round's pair counts — but FIXED-round training is
    SQL-expressible by unrolling: the oracle chains six rounds of
    pair-count → (cnt DESC, left, right) argmax → greedy merge as CTEs
    (``_bpe_unrolled_ctes``), so the learned sequence is now hash-gated,
    not rows-only. tests/test_bpe.py additionally pins the sequence
    against a pure-Python reference trainer. Returned as (merge_rank,
    left_sym, right_sym, cnt) rows. Bench note: one action per round;
    the wall cost is this VM's ~1 s/round scheduling floor
    (vocabulary-sized data), the same amortizing floor as
    dedup_components' rounds. Training is shared with
    bpe_tokenized_counts via the app-scoped merge cache."""
    merges = _bpe_merges(spark, sf_dir, 6)
    return spark.createDataFrame(
        [
            (i, lf, rt, cnt)
            for i, (lf, rt, cnt) in enumerate(merges)
        ],
        "merge_rank long, left_sym string, right_sym string, cnt long",
    )


@register("bpe_tokenized_counts", _bpe_apply_counts_sql(4))
def bpe_tokenized_counts(spark, sf_dir):
    """The full tokenizer loop in one query: train 4 BPE merges on the
    corpus, then apply them corpus-wide and return per-doc BPE symbol
    counts (the token-budget planner's input). Apply is one map-only
    Arrow-batched pass, memoized per distinct word. The oracle unrolls
    the 4 training rounds as CTEs and exploits that applying the merge
    list to a word IS the training state after round 4 — per-word symbol
    counts join back to the doc → word explosion (docs with no words
    coalesce to 0). tests/test_bpe.py additionally pins Spark apply ≡
    the pure-Python reference on every doc."""
    from slacken_spark.functions import bpe as B

    docs = tp(spark, sf_dir, "documents")
    merges = _bpe_merges(spark, sf_dir, 4)
    return B.bpe_apply(docs, "text", merges).select(
        "doc_id", F.col("n_bpe_symbols")
    )


# ---------------------------------------------------------------------------
# Remaining relational surface: CUBE and ntile window
# ---------------------------------------------------------------------------


@register(
    "cube_source_lang",
    """
    SELECT coalesce(source, '<all>') AS source,
           coalesce(lang, '<all>') AS lang,
           count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY CUBE (source, lang)
    """,
)
def cube_source_lang(spark, sf_dir):
    """CUBE aggregation (all 2^k grouping sets in one pass — partial-agg
    per set, single shuffle): corpus occupancy by source × lang with
    both margins and the grand total. NULL grouping placeholders are
    coalesced to a literal so the hash gate never compares engine NULL
    conventions."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n",
            "chars",
        )
    )


@register(
    "doc_length_quartiles",
    f"""
    WITH d AS (SELECT doc_id, len({SQL_TOKENS.format(expr='text')}) AS ntok
               FROM documents),
    q AS (SELECT doc_id, ntok,
                 ntile(4) OVER (ORDER BY ntok, doc_id) AS quartile
          FROM d)
    SELECT CAST(quartile AS BIGINT) AS quartile,
           count(*) AS n,
           CAST(min(ntok) AS BIGINT) AS min_tokens,
           CAST(max(ntok) AS BIGINT) AS max_tokens
    FROM q GROUP BY quartile
    """,
)
def doc_length_quartiles(spark, sf_dir):
    """Exact ntile(4): documents ranked into 4 equal-size length
    buckets (the curriculum / length-bucketing primitive). The order
    key is (ntok, doc_id) so tile boundaries are fully deterministic
    across engines. Computed DISTRIBUTED via global_ntile — the
    two-level range-partitioned prefix count — instead of a bare
    global window, which would serialize the whole corpus through one
    task (Spark's own "No Partition Defined" warning); identical exact
    semantics, pinned against F.ntile by test."""
    from slacken_spark.operators.relational_ext import global_ntile

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.tokens(F.col("text"))).alias("ntok")
    )
    q = global_ntile(docs, 4, ["ntok", "doc_id"], out_col="quartile")
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ntok").cast("long").alias("min_tokens"),
        F.max("ntok").cast("long").alias("max_tokens"),
    )


@register(
    "ngram_lm_counts",
    f"""
    WITH d AS (SELECT {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    bg AS (SELECT toks[CAST(i AS INT)] AS l, toks[CAST(i+1 AS INT)] AS r
           FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)),
    c AS MATERIALIZED (
        SELECT l, r, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY l, r),
    cont AS (SELECT r, CAST(count(*) AS BIGINT) AS cont_r FROM c GROUP BY r)
    SELECT c.l AS left_tok, c.r AS right_tok, c.n AS n,
           cont.cont_r AS cont_right
    FROM c JOIN cont USING (r) WHERE c.n >= 30
    """,
)
def ngram_lm_counts(spark, sf_dir):
    """Bigram language-model count tables — the n-gram LM / data-
    quality statistics a pretraining pipeline extracts per corpus:
    corpus-wide bigram counts plus the Kneser-Ney CONTINUATION count
    (for each right word, how many DISTINCT left contexts it follows
    — the N1+(·w) numerator of KN smoothing). Scale shape mirrors
    tfidf_top_terms: one lead-window pass builds adjacent pairs
    (single doc_id shuffle), one (l, r) partial-agg shuffle reduces
    occurrences to the vocab²-bounded count table, the continuation
    count reduces those ALREADY-aggregated rows (a row per distinct
    pair, never per occurrence), and the result joins back onto the
    frequent-bigram rows as a size-based broadcast (never a forced
    hint — an open-vocabulary outlier degrades to a shuffle join
    instead of OOMing). The n ≥ 30
    threshold is non-vacuous at every gate SF (keeps 429-900 of
    ~916-931 observed bigrams). All-integer output."""
    docs = tp(spark, sf_dir, "documents")
    # ONE shared definition of the bigram statistics with the
    # per-document scorer (text.bigram_lm_scores) — pair construction
    # cannot drift between the tables and their consumer (r10 review);
    # the unused id column prunes out of this entry's plan
    _, c, cont = X.bigram_count_tables(docs, "text", "doc_id")
    # the cont join is the optimizer's size-based call, not a forced
    # hint: cont is vocabulary-sized and open-vocabulary text grows it
    # with the corpus (the r11 bigram_lm_scores advice applies here
    # identically — an unconditional hint OOMs where the unhinted join
    # degrades to a shuffle)
    return (
        c.where(F.col("n") >= 30)
        .join(cont, "r")
        .select(
            F.col("l").alias("left_tok"),
            F.col("r").alias("right_tok"),
            "n",
            F.col("cont_r").alias("cont_right"),
        )
    )


@register(
    "source_token_drift",
    f"""
    WITH d AS (SELECT source, {SQL_TOKENS.format(expr='text')} AS toks
               FROM documents),
    o AS (SELECT source, unnest(toks) AS tok FROM d),
    sc AS MATERIALIZED (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS ns
        FROM o GROUP BY source, tok),
    st AS MATERIALIZED (
        SELECT source, CAST(sum(ns) AS BIGINT) AS nsrc FROM sc
        GROUP BY source),
    vc AS MATERIALIZED (
        SELECT tok, CAST(sum(ns) AS BIGINT) AS nc FROM sc GROUP BY tok),
    tot AS MATERIALIZED (SELECT CAST(sum(nc) AS BIGINT) AS n FROM vc),
    present AS (
        SELECT sc.source,
               CAST(sum(abs(sc.ns * tot.n - vc.nc * st.nsrc)) AS BIGINT)
                 AS l1_present,
               CAST(sum(vc.nc) AS BIGINT) AS nc_present
        FROM sc JOIN vc USING (tok) JOIN st USING (source) CROSS JOIN tot
        GROUP BY sc.source)
    SELECT p.source,
           CAST(p.l1_present + (tot.n - p.nc_present) * st.nsrc AS BIGINT)
             AS l1_num,
           CAST(st.nsrc * tot.n AS BIGINT) AS denom
    FROM present p JOIN st USING (source) CROSS JOIN tot
    """,
)
def source_token_drift(spark, sf_dir):
    """Per-source token-distribution drift vs the whole corpus — the
    ingest-monitoring statistic that flags a source whose unigram mix
    diverges (new crawl snapshot gone wrong, a source switching
    language, boilerplate floods). The metric is the exact L1
    distance between the source's and the corpus's unigram
    distributions as an INTEGER fraction: ``l1_num / denom`` with
    ``l1_num = Σ_w |n_s(w)·N − n(w)·N_s|`` and ``denom = N_s·N`` —
    cross-multiplied so the whole computation is int64 and the hash
    gate is float-free (safe while N·max n_s(w) < 2^63; rescale
    counts for larger corpora). Terms ABSENT from a source
    contribute ``(N − Σ_{{w∈S}} n(w))·N_s`` in closed form, so
    nothing ever materializes source × vocabulary. Scale shape: one
    (source, token) partial-agg shuffle over occurrences; the
    vocabulary and per-source totals reduce those ALREADY-aggregated
    rows and broadcast back (Heaps' law, the tfidf_top_terms
    argument)."""
    docs = tp(spark, sf_dir, "documents")
    return X.source_unigram_drift(docs, "text", "source")
