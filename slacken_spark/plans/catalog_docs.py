"""Query catalog, part 2: training-data pipeline operators over the
``documents`` and ``embeddings`` tables — dedup, similarity search, text
analysis, fingerprinting. Registered into the same QUERIES registry.

Portability contract: every hash derives from md5 (`token_hash64` =
first 15 hex chars → bigint), so the DuckDB oracle reproduces Spark's
values bit-for-bit; every ratio is a single int/int division (exact same
IEEE double on both engines).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from slacken_spark.functions import dedup as D
from slacken_spark.functions import similarity as SIM
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
    """Exact distributed percentiles (Spark's `percentile` matches SQL
    quantile_cont interpolation)."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.9)).alias("p90"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Dedup: exact, MinHash signatures, LSH candidate pairs, n-gram Jaccard,
# SimHash, winnowing fingerprints
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS digest,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    return D.exact_dedup(t(spark, sf_dir, "documents"), "text", "doc_id")


def _minhash_cte(n_hashes: int = 8, shingle_words: int = 3) -> str:
    """WITH-clause producing CTE ``sig`` = (doc_id, sig_0..sig_{n-1}),
    mirroring the engine's explode + hash-once + affine-permutation plan
    (see functions.dedup.minhash_signature)."""
    from slacken_spark.functions.dedup import MINHASH_P, minhash_perm_constants

    sig_cols = ",\n           ".join(
        f"min((h * {A} + {B}) % {MINHASH_P}) AS sig_{p}"
        for p, (A, B) in enumerate(minhash_perm_constants(n_hashes))
    )
    base_h = SQL_H64.format(expr="s")
    return f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                      range(0, greatest(len(toks) - {shingle_words - 1}, 0)),
                      i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)] || ' ' || toks[CAST(i+{shingle_words} AS INT)]
                  )) AS shingles
           FROM d),
    e AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    hh AS (SELECT doc_id, {base_h} % {MINHASH_P} AS h FROM e),
    sig0 AS (SELECT doc_id,
           {sig_cols}
    FROM hh GROUP BY doc_id),
    sig AS (SELECT d2.doc_id, sig0.* EXCLUDE (doc_id)
            FROM documents d2 LEFT JOIN sig0 ON d2.doc_id = sig0.doc_id)
    """


@register("minhash_signatures", _minhash_cte() + "\n    SELECT * FROM sig")
def minhash_signatures(spark, sf_dir):
    return D.minhash_signature(
        tp(spark, sf_dir, "documents"), "text", "doc_id", n_hashes=8, shingle_words=3
    )


@register(
    "minhash_lsh_pairs",
    _minhash_cte()
    + """
    , banded AS (
        SELECT doc_id, b.band_id,
               CASE b.band_id
                 WHEN 0 THEN coalesce(CAST(sig_0 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_1 AS VARCHAR),'null')
                 WHEN 1 THEN coalesce(CAST(sig_2 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_3 AS VARCHAR),'null')
                 WHEN 2 THEN coalesce(CAST(sig_4 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_5 AS VARCHAR),'null')
                 ELSE coalesce(CAST(sig_6 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_7 AS VARCHAR),'null')
               END AS band_key
        FROM sig, (SELECT unnest(range(0, 4)) AS band_id) b
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def minhash_lsh_pairs(spark, sf_dir):
    sig = D.minhash_signature(
        tp(spark, sf_dir, "documents"), "text", "doc_id", n_hashes=8, shingle_words=3
    )
    return D.minhash_band_pairs(sig, "doc_id", n_hashes=8, bands=4)


_BANDED_PAIRS_SQL = """
    , banded AS (
        SELECT doc_id, b.band_id,
               CASE b.band_id
                 WHEN 0 THEN coalesce(CAST(sig_0 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_1 AS VARCHAR),'null')
                 WHEN 1 THEN coalesce(CAST(sig_2 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_3 AS VARCHAR),'null')
                 WHEN 2 THEN coalesce(CAST(sig_4 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_5 AS VARCHAR),'null')
                 ELSE coalesce(CAST(sig_6 AS VARCHAR),'null') || '_' || coalesce(CAST(sig_7 AS VARCHAR),'null')
               END AS band_key
        FROM sig, (SELECT unnest(range(0, 4)) AS band_id) b
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
"""


# The LSH-pair graph's connected components are computed once per
# corpus and reused by every downstream dedup consumer (labeling,
# keep-one-per-cluster, audits) — exactly like the genomic index's
# build-once/classify-many shape. Memoized per (applicationId, sf_dir)
# with dead-application eviction (same rationale as
# catalog_genomic._INDEX_CACHE: applicationId never outlives its
# SparkContext, unlike id(spark)). The labels DataFrame is persisted —
# it is one (node, component) row per non-singleton node, tiny next to
# the corpus.
_COMPONENTS_CACHE: dict = {}


def _doc_components(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get

    def build():
        docs = tp(spark, sf_dir, "documents")
        sig = D.minhash_signature(docs, "text", "doc_id", n_hashes=8, shingle_words=3)
        pairs = D.minhash_band_pairs(sig, "doc_id", n_hashes=8, bands=4)
        # loop shuffles sized to the label-table cardinality (≤ |docs|
        # rows), not the scan-sized session setting
        return D.connected_components(pairs, loop_partitions=8).persist()

    return app_scoped_get(_COMPONENTS_CACHE, spark, sf_dir, build)


@register(
    "dedup_components",
    _minhash_cte().replace("WITH d AS", "WITH RECURSIVE d AS", 1)
    + _BANDED_PAIRS_SQL
    + """
    , edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS component
    FROM reach GROUP BY node
    """,
)
def dedup_components(spark, sf_dir):
    """Near-dup CLUSTER labels: weakly-connected components over the
    MinHash-LSH candidate-pair graph, every document labeled with its
    component's min doc_id (singletons label themselves). This is the
    operator a keep-one-per-cluster dedup pass groups on; the oracle
    recomputes components with a recursive-CTE closure (tractable at
    oracle scale only — the engine side materializes one (node, lbl)
    row per node per round, never the closure)."""
    docs = tp(spark, sf_dir, "documents")
    comp = _doc_components(spark, sf_dir)
    return docs.select("doc_id").join(
        comp, docs["doc_id"] == comp["node"], "left"
    ).select(
        F.col("doc_id"),
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
    )


@register(
    "dedup_keep_canonical",
    _minhash_cte().replace("WITH d AS", "WITH RECURSIVE d AS", 1)
    + _BANDED_PAIRS_SQL
    + """
    , edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
        SELECT doc_id AS node, doc_id AS lbl FROM documents
        UNION
        SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
    SELECT CAST(component AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS cluster_size
    FROM comp GROUP BY component
    """,
)
def dedup_keep_canonical(spark, sf_dir):
    """End-to-end near-dup dedup: LSH pairs → connected components →
    keep ONE document per cluster (the min doc_id, which IS the
    component label) with its cluster size — the row set a dedup pass
    would retain. Composes the banded self-join and the O(log d) label
    loop (shared with dedup_components via the memoized component
    labels); one extra key-shuffle on the component label."""
    docs = tp(spark, sf_dir, "documents")
    comp = _doc_components(spark, sf_dir)
    labeled = docs.select("doc_id").join(
        comp, docs["doc_id"] == comp["node"], "left"
    ).select(
        F.coalesce(F.col("component"), F.col("doc_id")).alias("component")
    )
    return labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    ).select(F.col("component").alias("doc_id"), "cluster_size")


@register(
    "doc_decontaminate",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                      range(0, greatest(len(toks) - 2, 0)),
                      i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]
                           || ' ' || toks[CAST(i+3 AS INT)]))) AS shingle
           FROM d),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev USING (shingle)
    GROUP BY tr.doc_id
    """,
)
def doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination: training docs sharing a word 3-gram
    with the (deterministic doc_id%97) eval set, with the shared-shingle
    count — the audit row a decontamination filter drops on. Eval
    shingles dedupe and broadcast (benchmarks are tiny next to the
    corpus), so the corpus scan stays map-side + one doc-id shuffle."""
    docs = tp(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    tr = docs.where(F.col("doc_id") % 97 != 0)
    return D.contamination_overlap(tr, ev, "text", "doc_id", n=3).select(
        "doc_id", F.col("n_shared").cast("long").alias("n_shared")
    )


def _bloom_h(i: int, m_bits: int) -> str:
    return SQL_H64.format(expr=f"'bloom{i}_' || shingle") + f" % {m_bits}"


@register(
    "doc_bloom_decontaminate",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                      range(0, greatest(len(toks) - 2, 0)),
                      i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)]
                           || ' ' || toks[CAST(i+3 AS INT)]))) AS shingle
           FROM d),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    pos AS (SELECT unnest([{_bloom_h(0, 8192)}, {_bloom_h(1, 8192)}]) AS p FROM ev),
    words AS (SELECT p // 32 AS word_idx,
                     bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
              FROM pos GROUP BY p // 32),
    tr AS (SELECT doc_id, shingle,
                  {_bloom_h(0, 8192)} AS h0,
                  {_bloom_h(1, 8192)} AS h1
           FROM sh WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_maybe
    FROM tr
    JOIN words w0 ON w0.word_idx = tr.h0 // 32
                 AND (w0.bits & (CAST(1 AS BIGINT) << CAST(tr.h0 % 32 AS INT))) <> 0
    JOIN words w1 ON w1.word_idx = tr.h1 // 32
                 AND (w1.bits & (CAST(1 AS BIGINT) << CAST(tr.h1 % 32 AS INT))) <> 0
    GROUP BY tr.doc_id
    """,
)
def doc_bloom_decontaminate(spark, sf_dir):
    """Fixed-memory decontamination: the eval set's 3-gram shingles
    build an 8192-bit / k=2 Bloom bitmap (one bit_or shuffle onto ≤256
    word rows), which broadcasts at constant size; training shingles
    probe it map-side and docs report how many of their shingles the
    bitmap flags (an upper bound on the exact doc_decontaminate count —
    md5-derived positions make even the false positives deterministic,
    so the hash gate holds). This is the membership plan for filter
    sets too large to broadcast exactly — bitmap size is a knob, not a
    function of the filter cardinality."""
    docs = tp(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    tr = docs.where(F.col("doc_id") % 97 != 0)
    ev_sh = X.shingle_rows(ev, "text", "doc_id", n=3).select("shingle").distinct()
    words = D.bloom_bitmap(ev_sh, "shingle", m_bits=8192, k=2)
    tr_sh = X.shingle_rows(tr, "text", "doc_id", n=3)
    return D.bloom_membership_count(
        tr_sh, "shingle", "doc_id", words, m_bits=8192, k=2
    ).select("doc_id", F.col("n_maybe").cast("long").alias("n_maybe"))


@register(
    "embedding_random_projection",
    f"""
    SELECT vec_id,
           {SIM.rp_sql('embedding', 64, 16)}
    FROM embeddings
    """,
)
def embedding_random_projection(spark, sf_dir):
    """Johnson–Lindenstrauss 64→16 reduction with md5-derived ±1 signs
    folded into the plan as literals: ONE codegen'd map-only projection
    (no shuffle, no UDF, no interpreted array lambda), elements promoted
    to double before left-to-right accumulation so Spark and the oracle
    produce identical IEEE doubles. The cheap front half of any
    ANN/clustering pipeline at 100 TB — a pure scan→project stage."""
    return SIM.random_projection(
        t(spark, sf_dir, "embeddings"), "embedding", "vec_id", in_dim=64, out_dim=16
    )


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


@register(
    "ngram_jaccard_adjacent",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct(list_transform(
                      range(0, greatest(len(toks) - 2, 0)),
                      i -> toks[CAST(i+1 AS INT)] || ' ' || toks[CAST(i+2 AS INT)] || ' ' || toks[CAST(i+3 AS INT)]
                  )) AS shingles
           FROM d)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) * 1.0
             / greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def ngram_jaccard_adjacent(spark, sf_dir):
    """Exact n-gram Jaccard of adjacent doc pairs via exploded shingle
    rows and a codegen'd equi-join — the scale plan (array-lambda
    intersect/union runs interpreted per element and dies at corpus
    scale; this shape shuffles once on the shingle and once on the pair).
    """
    docs = tp(spark, sf_dir, "documents")
    sh = X.shingle_rows(docs, "text", "doc_id", n=3)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id") + 1)
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ids = docs.select("doc_id")
    pairs = (
        ids.alias("x")
        .join(ids.alias("y"), F.col("y.doc_id") == F.col("x.doc_id") + 1)
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
    )
    return (
        pairs.join(inter, "id_a", "left")
        .join(counts.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "n_a"), "id_a", "left")
        .join(counts.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "n_b"), "id_b", "left")
        .select(
            "id_a",
            "id_b",
            (
                F.coalesce(F.col("inter"), F.lit(0))
                / F.greatest(
                    F.coalesce(F.col("n_a"), F.lit(0))
                    + F.coalesce(F.col("n_b"), F.lit(0))
                    - F.coalesce(F.col("inter"), F.lit(0)),
                    F.lit(1),
                )
            ).alias("jaccard"),
        )
    )


def _simhash_sql(bits: int = 16) -> str:
    return f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    h AS (SELECT doc_id, list_transform(toks, x -> {SQL_H64.format(expr='x')}) AS hashes FROM d)
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, {bits}), b ->
               CASE WHEN list_sum(list_transform(hashes, h ->
                     CASE WHEN (h & (CAST(1 AS BIGINT) << CAST(b AS INT))) != 0 THEN 1 ELSE -1 END)) > 0
                    THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END)) AS BIGINT) AS simhash
    FROM h
    """


@register("simhash_docs", _simhash_sql())
def simhash_docs(spark, sf_dir):
    """Exploded-row simhash (codegen'd conditional sums; see
    dedup.simhash_rows for why the array-lambda form is avoided)."""
    return D.simhash_rows(tp(spark, sf_dir, "documents"), "text", "doc_id", bits=16)


@register(
    "doc_fingerprints",
    f"""
    WITH g AS (SELECT doc_id,
                      list_transform(range(1, greatest(length(text) - 7, 0) + 1),
                                     i -> {SQL_H64.format(expr='substr(text, CAST(i AS INT), 8)')}) AS hashes
               FROM documents),
    m AS (SELECT doc_id,
                 list_sort(list_distinct(list_transform(
                     range(0, greatest(len(hashes) - 3, 0)),
                     i -> list_min(hashes[CAST(i+1 AS INT):CAST(i+4 AS INT)])
                 ))) AS fps
          FROM g)
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           fps[1] AS min_fp,
           fps[len(fps)] AS max_fp
    FROM m
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Winnowing fingerprints as an exploded window-min plan.

    The array-expression form (X.winnow_fingerprints) re-evaluates the
    k-gram hash array once per window position inside the lambda —
    O(n²) md5 calls. The scale plan explodes grams to rows (hash
    computed exactly once per gram, codegen'd) and takes a 4-row sliding
    minimum with a window function; one shuffle on doc_id.
    """
    docs = tp(spark, sf_dir, "documents")
    # n_grams derives from the text length BEFORE the explode — a second
    # count-over-partition window pass just to bound full windows would
    # re-sort every exploded row
    grams = docs.select(
        "doc_id",
        (F.length("text") - F.lit(7)).alias("n_grams"),
        F.posexplode(X.char_ngrams(F.col("text"), 8)).alias("pos", "gram"),
    )
    hashed = grams.select(
        "doc_id", "pos", "n_grams", X.token_hash64(F.col("gram")).alias("h")
    )
    w_min = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    mins = hashed.withColumn("fp", F.min("h").over(w_min)).where(
        F.col("pos") <= F.col("n_grams") - 4  # full windows only
    )
    agg = mins.groupBy("doc_id").agg(
        F.count_distinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_fingerprints"), F.lit(0)).cast("long").alias(
                "n_fingerprints"
            ),
            "min_fp",
            "max_fp",
        )
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


@register(
    "embedding_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
    sims AS (
        SELECT q.q_id, c.vec_id AS c_id,
               round(
                 list_sum(list_transform(range(1, len(q.q_vec)+1),
                   i -> CAST(q.q_vec[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 4) AS sim
        FROM q CROSS JOIN embeddings c
        WHERE q.q_id != c.vec_id
    ),
    r AS (SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
          FROM sims)
    SELECT q_id, c_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def embedding_cosine_topk(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = SIM.cosine_topk(queries, corpus, k=3, round_digits=4)
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def _centroids(n: int = 4, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish centroids (integer-derived
    literals embedded identically in the oracle SQL)."""
    out = []
    for i in range(n):
        row = []
        for j in range(dim):
            v = ((i * dim + j) * 1103515245 + 12345) % 2000
            row.append((v - 1000) / 1000.0)
        out.append(row)
    return out


def _cos_sql(vec_expr: str, lits: list[float]) -> str:
    arr = ", ".join(repr(x) for x in lits)
    nrm = sum(x * x for x in lits) ** 0.5
    return (
        f"(list_sum(list_transform(range(1, 65), i ->"
        f" CAST({vec_expr}[CAST(i AS INT)] AS DOUBLE) * (ARRAY[{arr}])[CAST(i AS INT)]))"
        f" / (sqrt(list_sum(list_transform({vec_expr}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform(ARRAY[{arr}], x -> x*x)))))"
    )


def _ivf_assign_sql(vec_expr: str) -> str:
    """Sequential strict-> argmax over the centroid literals, matching
    similarity.ivf_assign's fold order exactly."""
    cents = _centroids()
    sims = [_cos_sql(vec_expr, c) for c in cents]
    return (
        f"CASE WHEN {sims[3]} > greatest({sims[0]}, {sims[1]}, {sims[2]}) THEN 3"
        f" WHEN {sims[2]} > greatest({sims[0]}, {sims[1]}) THEN 2"
        f" WHEN {sims[1]} > {sims[0]} THEN 1 ELSE 0 END"
    )


@register(
    "embedding_ivf_topk",
    f"""
    WITH assigned AS (
        SELECT vec_id, embedding, {_ivf_assign_sql("embedding")} AS centroid_id
        FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec, centroid_id FROM assigned WHERE vec_id < 10),
    sims AS (
        SELECT q.q_id, c.vec_id AS c_id,
               round(
                 list_sum(list_transform(range(1, len(q.q_vec)+1),
                   i -> CAST(q.q_vec[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 4) AS sim
        FROM q JOIN assigned c ON q.centroid_id = c.centroid_id
        WHERE q.q_id != c.vec_id
    ),
    r AS (SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
          FROM sims)
    SELECT q_id, c_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def embedding_ivf_topk(spark, sf_dir):
    """IVF (nprobe=1) approximate top-k: centroid equi-join instead of a
    cross join — the billion-vector scale path. The oracle reproduces the
    coarse quantization and candidate ranking exactly."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = SIM.ivf_topk(queries, corpus, _centroids(), k=3, round_digits=4)
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def _ivf_probe_union_sql() -> str:
    """Per-(query, centroid) similarity rows — the oracle's probe-ranking
    input (one SELECT per centroid literal, same fold as _cos_sql)."""
    cents = _centroids()
    return " UNION ALL ".join(
        f"SELECT q_id, q_vec, CAST({i} AS INT) AS cid,"
        f" {_cos_sql('q_vec', c)} AS sim FROM q"
        for i, c in enumerate(cents)
    )


@register(
    "embedding_ivf_topk_nprobe2",
    f"""
    WITH assigned AS (
        SELECT vec_id, embedding, {_ivf_assign_sql("embedding")} AS centroid_id
        FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
    qs AS ({_ivf_probe_union_sql()}),
    qp AS (
        SELECT q_id, cid FROM (
            SELECT q_id, cid,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY sim DESC, cid) AS rn
            FROM qs) t
        WHERE rn <= 2
    ),
    sims AS (
        SELECT q.q_id, c.vec_id AS c_id,
               round(
                 list_sum(list_transform(range(1, len(q.q_vec)+1),
                   i -> CAST(q.q_vec[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(q.q_vec, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
                 4) AS sim
        FROM q JOIN qp ON q.q_id = qp.q_id
               JOIN assigned c ON qp.cid = c.centroid_id
        WHERE q.q_id != c.vec_id
    ),
    r AS (SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id ASC) AS rnk
          FROM sims)
    SELECT q_id, c_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 3
    """,
)
def embedding_ivf_topk_nprobe2(spark, sf_dir):
    """IVF top-k with nprobe=2: the query side probes its two nearest
    centroids (recall control for boundary-straddling queries); the
    corpus keeps one inverted list per vector, so candidates stay an
    equi-join and need no dedup. The oracle ranks the probe centroids
    per query with the same (sim DESC, cid) tiebreak."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    out = SIM.ivf_topk(
        queries, corpus, _centroids(), k=3, round_digits=4, nprobe=2
    )
    return out.withColumn("rnk", F.col("rnk").cast("long"))


def _planes(n_planes: int = 6, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from integer arithmetic
    (identical literals are embedded in the oracle SQL — no libm calls)."""
    out = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            v = ((i * dim + j) * 2654435761 + 104729) % 2000
            row.append((v - 1000) / 1000.0)
        out.append(row)
    return out


def _lsh_sql() -> str:
    planes = _planes()
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * (ARRAY[{lits}])[CAST(i AS INT)])) >= 0 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {i})"
        )
    bucket = " + ".join(terms)
    return f"""
    SELECT {bucket} AS bucket, count(*) AS n_vecs
    FROM embeddings
    GROUP BY 1
    """


@register("embedding_lsh_buckets", _lsh_sql())
def embedding_lsh_buckets(spark, sf_dir):
    emb = tp(spark, sf_dir, "embeddings")
    bucketed = SIM.lsh_hyperplane_buckets(emb, "embedding", _planes())
    return bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))


def _bucket_sql() -> str:
    planes = _planes()
    terms = []
    for i, p in enumerate(planes):
        lits = ", ".join(repr(x) for x in p)
        terms.append(
            f"(CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * (ARRAY[{lits}])[CAST(i AS INT)])) >= 0 "
            f"THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END << {i})"
        )
    return " + ".join(terms)


_NEARDUP_PAIR_SQL = f"""
    WITH b AS (SELECT vec_id, embedding, {_bucket_sql()} AS bucket FROM embeddings)
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round(
             list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) AS sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE round(
             list_sum(list_transform(range(1, 65),
               i -> CAST(a.embedding[CAST(i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INT)] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
             4) >= 0.2
    """


@register("embedding_neardup_pairs", _NEARDUP_PAIR_SQL)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate candidates: LSH-bucket equi-join
    (one shuffle, no all-pairs) + exact cosine threshold (0.2) — the
    embedding twin of MinHash dedup. ``embedding_semdedup_keep`` builds
    its component graph over these same pairs."""
    return _emb_neardup_pairs(spark, sf_dir)


def _emb_neardup_pairs(spark, sf_dir):
    emb = tp(spark, sf_dir, "embeddings")
    b = SIM.lsh_hyperplane_buckets(emb, "embedding", _planes()).select(
        "vec_id",
        "embedding",
        "bucket",
        SIM.l2_norm(F.col("embedding")).alias("norm"),
    )
    a, c = b.alias("a"), b.alias("c")
    # per-row norms materialized before the join: the interpreted norm
    # aggregate runs once per vector, not once per candidate pair
    sim = F.round(
        SIM.dot(F.col("a.embedding"), F.col("c.embedding"))
        / (F.col("a.norm") * F.col("c.norm")),
        4,
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= 0.2)
    )


# SemDedup-style keep-one-per-embedding-cluster: components over the
# near-dup pair graph, memoized per (application, sf_dir) like the text
# component labels (tiny label table, persisted).
_EMB_COMPONENTS_CACHE: dict = {}


def _emb_components(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get

    def build():
        pairs = _emb_neardup_pairs(spark, sf_dir).select("id_a", "id_b")
        return D.connected_components(pairs, loop_partitions=8).persist()

    return app_scoped_get(_EMB_COMPONENTS_CACHE, spark, sf_dir, build)


_SEMDEDUP_SQL = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({_NEARDUP_PAIR_SQL}),
edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM pairs
                       UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
    SELECT vec_id AS node, vec_id AS lbl FROM embeddings
    UNION
    SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node)
SELECT CAST(component AS BIGINT) AS vec_id,
       CAST(count(*) AS BIGINT) AS cluster_size
FROM comp GROUP BY component
"""


@register("embedding_semdedup_keep", _SEMDEDUP_SQL)
def embedding_semdedup_keep(spark, sf_dir):
    """SemDedup-shaped embedding dedup: weakly-connected components
    over the cosine near-dup pair graph (LSH-bucketed, never
    all-pairs), keep ONE vector per cluster (the min vec_id — the
    component label) with its cluster size — the embedding twin of
    ``dedup_keep_canonical``. Composes the bucket equi-join with the
    O(log d) label loop (functions.dedup.connected_components);
    singletons keep themselves. The oracle replays the closure as a
    recursive CTE over the SAME pair SQL (pairs/edges MATERIALIZED —
    the recursive member re-evaluates inlined CTEs per iteration:
    measured 62.6 s vs 5.0 s at sf0.01), tractable at oracle scale
    only."""
    emb = tp(spark, sf_dir, "embeddings").select("vec_id")
    comp = _emb_components(spark, sf_dir)
    labeled = emb.join(
        comp, emb["vec_id"] == comp["node"], "left"
    ).select(
        F.coalesce(F.col("component"), F.col("vec_id")).alias("component")
    )
    return (
        labeled.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("component").alias("vec_id"), "cluster_size")
    )


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
# k-means training (distributed Lloyd's) — the INTEGER-EXACT quantized
# formulation, so even the iterative trainer sits under the hash gate.
# The float IVF trainer (similarity.kmeans_train: convergence, empty-
# cluster reseed) remains the production centroid path, pytest-pinned
# in tests/test_kmeans.py.
# ---------------------------------------------------------------------------


_KMEANSQ_K, _KMEANSQ_ITERS, _KMEANSQ_DIM = 4, 3, 64


def _kmeans_quantized_sql(k: int, iters: int, dim: int) -> str:
    """DuckDB replay of similarity.kmeans_quantized: the fixed Lloyd's
    rounds unroll as MATERIALIZED CTEs (default CTE inlining
    re-evaluates the whole prefix per reference — exponential in
    rounds, the BPE-unroll lesson). Every compared value is an
    integer-valued double (quantized coords, integer sum-centroids,
    one exact-operand IEEE division per score), so the hash gate is
    float-hazard-free; ties break to the smallest cluster id, matching
    the engine's >=-chain argmax."""
    parts = [
        f"""q AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
        FROM embeddings),
    c0 AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
               qv AS s, CAST(1 AS BIGINT) AS cnt
        FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k}))"""
    ]
    for r in range(1, iters + 1):
        parts.append(
            f"""sc{r} AS MATERIALIZED (
        SELECT q.vec_id, c.cid,
               CAST(sum(q.qv[CAST(i AS INT)] * c.s[CAST(i AS INT)]) AS DOUBLE)
                 / CAST(min(c.cnt) AS DOUBLE) AS score
        FROM q, c{r - 1} c, range(1, {dim + 1}) t(i)
        GROUP BY q.vec_id, c.cid),
    a{r} AS MATERIALIZED (
        SELECT vec_id, cid FROM (
            SELECT sc.vec_id, sc.cid,
                   row_number() OVER (PARTITION BY sc.vec_id
                                      ORDER BY sc.score DESC, sc.cid) AS rn
            FROM sc{r} sc) WHERE rn = 1)"""
        )
        if r < iters:
            parts.append(
                f"""g{r} AS MATERIALIZED (
        SELECT a.cid, i, CAST(sum(q.qv[CAST(i AS INT)]) AS BIGINT) AS sv,
               CAST(count(*) AS BIGINT) AS cnt
        FROM a{r} a, q, range(1, {dim + 1}) t(i)
        WHERE a.vec_id = q.vec_id
        GROUP BY a.cid, i),
    c{r} AS MATERIALIZED (
        SELECT cid, list(sv ORDER BY i) AS s, min(cnt) AS cnt
        FROM g{r} GROUP BY cid
        UNION ALL
        SELECT c.cid, c.s, c.cnt FROM c{r - 1} c
        WHERE c.cid NOT IN (SELECT cid FROM g{r}))"""
            )
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(cid AS BIGINT) AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           md5(string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id))
             AS members_digest
    FROM a{iters} GROUP BY cid
    """


# Training is a build artifact (like the genomic index and the BPE
# merges): one training per (application, sf_dir); the cached value is
# the lazy assignment plan over the persisted quantized projection.
_KMEANSQ_CACHE: dict = {}


def _kmeans_quantized_assigned(spark, sf_dir):
    from slacken_spark.appcache import app_scoped_get

    def build():
        emb = t(spark, sf_dir, "embeddings")
        assigned, _state = SIM.kmeans_quantized(
            emb,
            "embedding",
            "vec_id",
            k=_KMEANSQ_K,
            iters=_KMEANSQ_ITERS,
            dim=_KMEANSQ_DIM,
        )
        return assigned.persist()

    return app_scoped_get(_KMEANSQ_CACHE, spark, ("kmeansq", sf_dir), build)


@register(
    "embedding_kmeans_clusters",
    _kmeans_quantized_sql(_KMEANSQ_K, _KMEANSQ_ITERS, _KMEANSQ_DIM),
)
def embedding_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd's k-means training, hash-gated end to end
    (similarity.kmeans_quantized, k=4, 3 fixed rounds): vectors
    quantize to integers, centroids stay (integer-sum, count) pairs,
    and each assignment score is one IEEE division of exact operands —
    so the ITERATIVE TRAINER ITSELF is engine-portable and the oracle
    replays all three rounds as unrolled MATERIALIZED CTEs (this was
    the catalog's last rows-only entry). Assignment is a map-only
    codegen'd argmax with the round's centroids folded in as literals
    (no window, no shuffle — the plan that scales to 100 TB); each
    update round is one k×(dim+1)-cell aggregate. Output: per-cluster
    member counts + the md5 digest of the sorted member ids. The float
    trainer (kmeans_train: convergence, reseed) remains the production
    IVF path, pinned by tests/test_kmeans.py."""
    from slacken_spark.functions.inverted import postings_digest

    assigned = _kmeans_quantized_assigned(spark, sf_dir)
    return assigned.groupBy(F.col("cluster_id").cast("long").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        postings_digest(
            F.sort_array(F.collect_list("vec_id"))
        ).alias("members_digest"),
    )


# ---------------------------------------------------------------------------
# Embedding int8 quantization (storage compression for vector corpora)
# ---------------------------------------------------------------------------


@register(
    "embedding_quantize_int8",
    """
    WITH b AS (
        SELECT vec_id, embedding,
               list_min(embedding) AS lo, list_max(embedding) AS hi
        FROM embeddings
    )
    SELECT vec_id,
           CAST(round(CAST(lo AS DOUBLE) * 1000000) AS BIGINT) AS lo_micro,
           CAST(round(CAST(hi AS DOUBLE) * 1000000) AS BIGINT) AS hi_micro,
           md5(array_to_string(list_transform(embedding,
               x -> CAST(CASE WHEN hi > lo
                              THEN round((CAST(x AS DOUBLE) - CAST(lo AS DOUBLE))
                                         / (CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE)) * 255)
                              ELSE 0 END AS BIGINT)), ',')) AS codes_digest
    FROM b
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Per-vector min-max int8 scalar quantization — the storage
    compression step for large vector corpora (4× smaller than float32;
    dequantize = lo + code/255*(hi-lo)). Map-only codegen'd array
    expressions; codes are exact integers so the digest compares
    bit-for-bit. Scale params surface as micro-units (exact ints)."""
    emb = t(spark, sf_dir, "embeddings")
    lo, hi = F.array_min("embedding"), F.array_max("embedding")
    b = emb.select(
        "vec_id",
        "embedding",
        lo.alias("lo"),
        hi.alias("hi"),
    )
    # promote to double BEFORE the arithmetic: float32 division rounds
    # differently from DuckDB's double-promoted division at .5 edges
    code = lambda x: F.when(  # noqa: E731
        F.col("hi") > F.col("lo"),
        F.round(
            (x.cast("double") - F.col("lo").cast("double"))
            / (F.col("hi").cast("double") - F.col("lo").cast("double"))
            * 255
        ),
    ).otherwise(F.lit(0.0)).cast("long")
    return b.select(
        "vec_id",
        F.round(F.col("lo").cast("double") * 1_000_000).cast("long").alias(
            "lo_micro"
        ),
        F.round(F.col("hi").cast("double") * 1_000_000).cast("long").alias(
            "hi_micro"
        ),
        F.md5(
            F.concat_ws(
                ",", F.transform(F.col("embedding"), lambda x: code(x).cast("string"))
            )
        ).alias("codes_digest"),
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


@register(
    "inverted_index_delta",
    f"""
    WITH upd AS (SELECT doc_id, 'v2update ' || substr(text, 1, 40) AS text
                 FROM documents WHERE doc_id % 50 = 0),
    merged AS (SELECT doc_id, text FROM documents
               WHERE doc_id % 50 <> 0 AND (doc_id // 10) % 5 = 0
               UNION ALL SELECT doc_id, text FROM upd),
    old_t AS (SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
              FROM documents WHERE doc_id % 50 = 0),
    new_t AS (SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
              FROM upd),
    aff AS (SELECT DISTINCT term, doc_id // 10 AS segment
            FROM (SELECT * FROM old_t UNION ALL SELECT * FROM new_t)),
    e AS (SELECT DISTINCT doc_id, unnest({SQL_TOKENS.format(expr='text')}) AS term
          FROM merged),
    p AS (SELECT term, doc_id // 10 AS segment, doc_id FROM e),
    rebuilt AS (SELECT p.term, p.segment,
                       count(*) AS df_segment,
                       md5(string_agg(CAST(p.doc_id AS VARCHAR), ','
                                      ORDER BY p.doc_id)) AS segment_digest
                FROM p JOIN aff ON p.term = aff.term AND p.segment = aff.segment
                GROUP BY p.term, p.segment)
    SELECT term, CAST(segment AS BIGINT) AS segment,
           CAST(df_segment AS BIGINT) AS df_segment, segment_digest
    FROM rebuilt
    UNION ALL
    SELECT a.term, CAST(a.segment AS BIGINT) AS segment,
           CAST(0 AS BIGINT) AS df_segment, md5('') AS segment_digest
    FROM aff a LEFT JOIN rebuilt r
      ON a.term = r.term AND a.segment = r.segment
    WHERE r.term IS NULL
    """,
)
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
    upd = docs.where(F.col("doc_id") % 50 == 0).select(
        "doc_id",
        F.concat(F.lit("v2update "), F.substring("text", 1, 40)).alias("text"),
    )
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


# ---------------------------------------------------------------------------
# Corpus upsert (CDC latest-wins merge — dataset versioning)
# ---------------------------------------------------------------------------


@register(
    "corpus_upsert_latest",
    """
    WITH base AS (SELECT doc_id, text, 1 AS version FROM documents),
    updates AS (SELECT doc_id, 'v2 ' || text AS text, 2 AS version
                FROM documents WHERE doc_id % 10 = 0),
    unioned AS (SELECT * FROM base UNION ALL SELECT * FROM updates),
    r AS (SELECT doc_id, text, version,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY version DESC) AS rn
          FROM unioned)
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
    base = docs.select("doc_id", "text", F.lit(1).alias("version"))
    updates = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
        F.lit(2).alias("version"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("version"))
    return (
        base.unionAll(updates)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("version").cast("long").alias("version"),
            F.md5("text").alias("text_digest"),
        )
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
# End-to-end retrieval: ANN top-k + document metadata join
# ---------------------------------------------------------------------------

from slacken_spark.plans.catalog import QUERIES as _Q  # noqa: E402

_IVF_TOPK_SQL = _Q["embedding_ivf_topk"][1]


@register(
    "ann_retrieve_docs",
    f"""
    WITH topk AS ({_IVF_TOPK_SQL})
    SELECT t.q_id, t.rnk, t.c_id, t.sim, d.source, d.lang
    FROM topk t JOIN documents d ON t.c_id = d.doc_id
    """,
)
def ann_retrieve_docs(spark, sf_dir):
    """The full retrieval stack in one query: IVF ANN top-k over the
    embedding corpus, then the tiny (queries × k) hit list joins BACK to
    the documents table for display metadata — broadcast on the hit
    side, so the metadata fetch is a map-only pass over the documents
    scan (the exact shape of serving-time candidate hydration at
    corpus scale; vec_id ≡ doc_id in the test tables)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = tp(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    topk = SIM.ivf_topk(queries, corpus, _centroids(), k=3, round_digits=4)
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return (
        docs.join(F.broadcast(topk), docs.doc_id == topk.c_id)
        .select(
            "q_id",
            F.col("rnk").cast("long").alias("rnk"),
            "c_id",
            "sim",
            "source",
            "lang",
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


@register(
    "inverted_index_sharded",
    f"""
    WITH d AS (SELECT doc_id, {SQL_TOKENS.format(expr='text')} AS toks FROM documents),
    e AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM d),
    p AS (SELECT term, doc_id // 100 AS segment, doc_id FROM e)
    SELECT term, CAST(segment AS BIGINT) AS segment,
           count(*) AS df_segment,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS segment_digest
    FROM p GROUP BY term, segment
    """,
)
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
    """ntile window: documents ranked into 4 equal-size length buckets
    (the curriculum / length-bucketing primitive). The order key is
    (ntok, doc_id) so tile boundaries are fully deterministic across
    engines. A single global window is the point of the operator; at
    warehouse scale the same statistic comes from approx quantiles or a
    two-pass range partitioner — this is the exact small-N form."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(X.tokens(F.col("text"))).alias("ntok")
    )
    w = Window.orderBy("ntok", "doc_id")
    q = docs.withColumn("quartile", F.ntile(4).over(w).cast("long"))
    return q.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ntok").cast("long").alias("min_tokens"),
        F.max("ntok").cast("long").alias("max_tokens"),
    )
