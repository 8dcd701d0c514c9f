"""Mid-scale stress for the document operators: 50k synthetic docs
(10× the sf0.1 corpus) with planted duplication and a corpus-wide hot
term, generated distributed (no driver-side data). Pins completion,
key invariants, and determinism — the shapes sf0.01 parity cannot
exercise."""

import pytest
from pyspark.sql import functions as F

N_DOCS = 50_000


@pytest.fixture(scope="module")
def big_docs(spark):
    # ~18 tokens/doc: a hot term in every doc, md5-derived filler, and
    # every 100th doc an exact copy of doc (id-100) → planted dup spans
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    # each copy clones the (non-copy) doc right before it; 8-hex-char
    # filler words keep within-doc collisions (which would perturb the
    # tf ranking below) at ~1e-3 over the whole corpus
    src = F.when(
        (F.col("doc_id") % 100 == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words = [
        F.substring(F.md5(F.concat(F.lit(f"w{j}:"), src.cast("string"))), 1, 8)
        for j in range(16)
    ]
    df = base.select(
        "doc_id",
        F.concat_ws(" ", F.lit("the"), *words, F.lit("the")).alias("text"),
    )
    df = df.repartition(16).persist()
    df.count()
    yield df
    df.unpersist()


def test_inverted_index_hot_term_posting_list(spark, big_docs):
    from slacken_spark.functions.text import positioned_tokens

    e = positioned_tokens(big_docs, "text", "doc_id").select(
        "doc_id", F.col("tok").alias("term")
    ).distinct()
    idx = e.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    hot = idx.where(F.col("term") == "the").collect()[0]
    assert hot["df"] == N_DOCS  # the stopword-grade skew key survives


def test_dupspan_scrubs_planted_copies_only(spark, big_docs):
    from slacken_spark.functions.text import dupspan_scrub

    out = dupspan_scrub(big_docs, "text", "doc_id", n=5).persist()
    try:
        copies = out.where(F.col("doc_id") % 100 == 0).where(F.col("doc_id") > 0)
        originals = out.where(
            (F.col("doc_id") % 100 != 0) | (F.col("doc_id") == 0)
        )
        # every planted copy loses its whole text to the original's span
        assert copies.where(F.col("n_kept") != 0).count() == 0
        # no original loses anything: filler words are doc-unique, and
        # the hot term alone cannot form a cross-doc 5-gram outside the
        # planted copies
        assert originals.where(F.col("n_removed") != 0).count() == 0
        assert out.count() == N_DOCS
    finally:
        out.unpersist()


def test_tfidf_shape_and_determinism(spark, big_docs):
    e = big_docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    )
    tf = e.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    top = (
        tf.join(F.broadcast(df), "term")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
    )
    assert top.count() == 3 * N_DOCS
    # rank 1 is the hot term everywhere (tf=2 beats the tf=1 fillers)
    assert (
        top.where((F.col("rnk") == 1) & (F.col("term") != "the")).count() == 0
    )


def test_source_drift_tokenizes_once(spark, big_docs):
    """source_unigram_drift references its (group, token) count table
    four times (per-group totals, vocabulary counts, the present join);
    r13-opt pins it so the corpus tokenize + explode + partial agg runs
    exactly once — the returned plan must read the pinned blocks (Scan
    ExistingRDD) and contain NO Generate (explode) of its own. Also
    pins correctness at this scale: every source's drift vs itself-only
    corpus is 0 when there is a single source."""
    from slacken_spark.functions.text import source_unigram_drift

    docs = big_docs.select("doc_id", "text", F.lit("s0").alias("source"))
    out = source_unigram_drift(docs, "text", "source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "tokenize subtree re-printed per reference"
    assert "Scan ExistingRDD" in plan, "count table not on pinned blocks"
    rows = out.collect()
    # one source == the whole corpus -> exact L1 distance is zero
    assert len(rows) == 1 and rows[0]["l1_num"] == 0 and rows[0]["denom"] > 0
