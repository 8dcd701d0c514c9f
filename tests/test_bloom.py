"""Bloom membership: no false negatives, bounded bitmap, and the
upper-bound relation to exact contamination overlap."""

from pyspark.sql import functions as F

from slacken_spark.functions.dedup import (
    bloom_bitmap,
    bloom_membership_count,
    contamination_overlap,
)


def test_no_false_negatives_and_bitmap_bound(spark):
    vals = spark.createDataFrame(
        [(f"item {i} payload",) for i in range(200)], "s string"
    )
    words = bloom_bitmap(vals, "s", m_bits=4096, k=2)
    # bitmap never exceeds m_bits/32 word rows regardless of input size
    assert words.count() <= 4096 // 32
    # every inserted value must be reported present (Bloom guarantee)
    probe = vals.withColumn("pid", F.monotonically_increasing_id())
    found = bloom_membership_count(probe, "s", "pid", words, m_bits=4096, k=2)
    assert found.count() == 200
    assert found.agg(F.min("n_maybe")).collect()[0][0] == 1


def test_absent_values_mostly_rejected_and_deterministic(spark):
    present = spark.createDataFrame([(f"in {i}",) for i in range(50)], "s string")
    words = bloom_bitmap(present, "s", m_bits=8192, k=2)
    absent = spark.createDataFrame(
        [(i, f"out {i}") for i in range(500)], "pid long, s string"
    )
    hits1 = {
        r["pid"]
        for r in bloom_membership_count(
            absent, "s", "pid", words, m_bits=8192, k=2
        ).collect()
    }
    # 50 inserts into 8192 bits → FP rate ≈ (50·2/8192)² ≈ 0.015% — a
    # handful at most out of 500 probes
    assert len(hits1) <= 5
    # false positives are md5-determined: a second build+probe agrees
    words2 = bloom_bitmap(present, "s", m_bits=8192, k=2)
    hits2 = {
        r["pid"]
        for r in bloom_membership_count(
            absent, "s", "pid", words2, m_bits=8192, k=2
        ).collect()
    }
    assert hits1 == hits2


def test_bloom_upper_bounds_exact_overlap(spark, sf_dir):
    from slacken_spark.functions.text import shingle_rows
    from slacken_spark.plans.catalog import t

    docs = t(spark, sf_dir, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    tr = docs.where(F.col("doc_id") % 97 != 0)
    exact = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_overlap(tr, ev, "text", "doc_id", n=3).collect()
    }
    ev_sh = shingle_rows(ev, "text", "doc_id", n=3).select("shingle").distinct()
    words = bloom_bitmap(ev_sh, "shingle", m_bits=8192, k=2)
    tr_sh = shingle_rows(tr, "text", "doc_id", n=3)
    maybe = {
        r["doc_id"]: r["n_maybe"]
        for r in bloom_membership_count(
            tr_sh, "shingle", "doc_id", words, m_bits=8192, k=2
        ).collect()
    }
    # every exactly-contaminated doc is flagged with at least its true count
    for doc, n in exact.items():
        assert maybe.get(doc, 0) >= n
