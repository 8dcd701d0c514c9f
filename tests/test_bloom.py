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


def test_bloom_merge_and_maintain_equal_rebuild(spark):
    """Mergeability + append-CDC maintenance, word-exact:
    bitmap(A ∪ B) == bloom_merge(bitmap(A), bitmap(B)) ==
    bloom_maintain(bitmap(A), B) — the shard/stream/CDC property; and
    probes through the maintained table still show no false
    negatives for values inserted by EITHER side."""
    from slacken_spark.functions.dedup import (
        bloom_bitmap,
        bloom_maintain,
        bloom_merge,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(150)], "s string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(120)], "s string")
    whole = {
        r["word_idx"]: r["bits"]
        for r in bloom_bitmap(a.unionByName(b), "s", 4096, 2).collect()
    }
    wa = bloom_bitmap(a, "s", 4096, 2)
    wb = bloom_bitmap(b, "s", 4096, 2)
    merged = {
        r["word_idx"]: r["bits"]
        for r in bloom_merge(wa.unionByName(wb)).collect()
    }
    maintained_df = bloom_maintain(wa, b, "s", 4096, 2)
    maintained = {
        r["word_idx"]: r["bits"] for r in maintained_df.collect()
    }
    assert merged == whole
    assert maintained == whole
    # no false negatives through the maintained table
    from slacken_spark.functions.dedup import bloom_membership_count

    probe = a.unionByName(b).withColumn("pid", F.monotonically_increasing_id())
    found = bloom_membership_count(
        probe, "s", "pid", maintained_df, m_bits=4096, k=2
    )
    assert found.count() == 270


def test_bloom_stream_two_batches_equal_batch_bitmap(spark, tmp_path):
    """bloom_stream over two genuine micro-batches from a non-empty
    base: final maintained words == one batch build over the union,
    word for word; per-epoch tables only ever set bits (monotone)."""
    from slacken_spark.functions.dedup import bloom_bitmap
    from slacken_spark.streaming import ops

    base_vals = [(f"seed{i}",) for i in range(60)]
    a = [(i, f"x{i}") for i in range(200)]
    b = [(i, f"y{i}") for i in range(150)]
    spark.createDataFrame(a, "rid long, s string").coalesce(1).write.parquet(
        str(tmp_path / "src" / "a.parquet")
    )
    spark.createDataFrame(b, "rid long, s string").coalesce(1).write.parquet(
        str(tmp_path / "src" / "b.parquet")
    )
    stream = (
        spark.readStream.schema("rid long, s string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(tmp_path / "src") + "/*/")
    )
    base = bloom_bitmap(
        spark.createDataFrame(base_vals, "s string"), "s", 4096, 2
    )
    seen = []

    def sink(words_df, epoch):
        seen.append({r["word_idx"]: r["bits"] for r in words_df.collect()})

    ops.run_foreach_to_completion(
        ops.bloom_stream(base, stream, "s", sink, 4096, 2)
    )
    assert len(seen) >= 2
    whole = spark.createDataFrame(
        base_vals + [(s,) for _, s in a + b], "s string"
    )
    want = {
        r["word_idx"]: r["bits"]
        for r in bloom_bitmap(whole, "s", 4096, 2).collect()
    }
    assert seen[-1] == want
    for prev, cur in zip(seen, seen[1:]):
        assert set(prev) <= set(cur)
        # monotone: every previously-set bit stays set
        assert all((cur[w] & bits) == bits for w, bits in prev.items())


def test_bloom_bitmap_ignores_null_keys(spark):
    """NULL keys must not set bits or emit the junk (null, null) word
    row a null hash otherwise produces — and an all-null build yields
    an EMPTY word table, not a one-row null table."""
    from slacken_spark.functions.dedup import bloom_bitmap

    df = spark.createDataFrame(
        [("x",), (None,), ("y",)], "s string"
    )
    rows = bloom_bitmap(df, "s", 4096, 2).collect()
    assert all(r["word_idx"] is not None and r["bits"] is not None for r in rows)
    want = {
        (r["word_idx"], r["bits"])
        for r in bloom_bitmap(
            spark.createDataFrame([("x",), ("y",)], "s string"), "s", 4096, 2
        ).collect()
    }
    assert {(r["word_idx"], r["bits"]) for r in rows} == want
    assert bloom_bitmap(
        spark.createDataFrame([(None,)], "s string"), "s", 4096, 2
    ).count() == 0


def test_membership_probe_builds_filter_once(spark):
    """The k broadcast joins each re-print the words subtree and Spark
    does not dedupe common subplans, so an expensive filter build would
    run once per hash; r13-opt pins the word table so the build runs
    exactly once — the returned plan's broadcast sides must read the
    pinned blocks (Scan ExistingRDD), with no aggregate (the build's
    bit_or) re-printed under them."""
    vals = spark.createDataFrame(
        [(f"item {i} payload",) for i in range(200)], "s string"
    )
    words = bloom_bitmap(vals, "s", m_bits=4096, k=2)
    probe = vals.withColumn("pid", F.monotonically_increasing_id())
    found = bloom_membership_count(probe, "s", "pid", words, m_bits=4096, k=2)
    plan = found._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 2, "broadcast sides not pinned"
    # the one aggregate left is the per-id count; the build's bit_or
    # aggregate must not appear under either broadcast
    import re
    assert len(re.findall(r"bit_or", plan)) == 0, "filter build re-printed"
