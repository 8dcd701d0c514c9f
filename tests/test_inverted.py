"""functions.inverted: flat vs range-sharded posting lists, and the
hot-term skew bound the sharded form exists for."""

import pytest
from pyspark.sql import functions as F


def _corpus(spark, n_docs):
    # every doc contains the stopword-grade term 'hot' plus a spread
    # term that recurs every 97 docs (and a repeat of 'hot' to prove
    # per-doc de-duplication)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hot w"), (F.col("id") % 97).cast("string"), F.lit(" hot")
        ).alias("text"),
    )


def test_hot_term_segments_stay_bounded_at_50k_docs(spark):
    """One term in EVERY doc at 50k docs: the sharded build must never
    give one task more than segment_rows postings for it — the bound
    that makes the operator safe where the flat build serializes."""
    from slacken_spark.functions.inverted import inverted_index

    n, seg_rows = 50_000, 100
    docs = _corpus(spark, n)
    sharded = inverted_index(
        docs, F.split(F.col("text"), " "), segment_rows=seg_rows
    )
    hot = sharded.where(F.col("term") == "hot")
    stats = hot.agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("df_segment").alias("max_df"),
        F.sum("df_segment").alias("total"),
        F.max(F.size("postings")).alias("max_list"),
    ).first()
    assert stats["n_segments"] == n // seg_rows
    assert stats["max_df"] <= seg_rows and stats["max_list"] <= seg_rows
    assert stats["total"] == n  # de-duplicated per doc, present in all


def test_sharded_segments_concatenate_to_the_flat_list(spark):
    """Segments are disjoint sorted ranges: concatenating them in
    segment order must reproduce the flat posting list exactly."""
    from slacken_spark.functions.inverted import inverted_index

    docs = _corpus(spark, 1_000)
    flat = {
        r["term"]: r["postings"]
        for r in inverted_index(docs, F.split(F.col("text"), " ")).collect()
    }
    merged: dict = {}
    sharded = inverted_index(
        docs, F.split(F.col("text"), " "), segment_rows=64
    ).orderBy("term", "segment")
    for r in sharded.collect():
        merged.setdefault(r["term"], []).extend(r["postings"])
    assert merged == flat
    assert flat["hot"] == list(range(1_000))


def test_bad_segment_rows_rejected(spark):
    from slacken_spark.functions.inverted import inverted_index

    docs = _corpus(spark, 10)
    with pytest.raises(ValueError):
        inverted_index(docs, F.split(F.col("text"), " "), segment_rows=0)
