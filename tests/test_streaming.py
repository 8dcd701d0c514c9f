"""Streaming ops tests: batch-vs-stream equivalence, watermark late-data
drops, stateful running totals across micro-batches."""

import pytest
from pyspark.sql import functions as F

from slacken_spark.streaming import ops

SCHEMA = "user_id long, ts timestamp, value double"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _write_batch(spark, path, rows):
    _df(spark, rows).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    d = str(tmp_path / "stream_in")
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:20:00", 2.0),
        (2, "2024-01-01 10:05:00", 3.0),
        (1, "2024-01-01 12:00:00", 4.0),
        (2, "2024-01-01 12:30:00", 5.0),
    ]
    _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_match_batch(spark, stream_dir):
    stream = ops.file_stream(spark, stream_dir, SCHEMA)
    out = ops.run_to_completion(
        ops.windowed_counts(stream, "ts", "user_id", window="1 hour"),
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "user_id",
            "n",
            "value_sum",
        )
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_sliding_windows(spark, stream_dir):
    stream = ops.file_stream(spark, stream_dir, SCHEMA)
    out = ops.run_to_completion(
        ops.windowed_counts(
            stream, "ts", "user_id", window="1 hour", slide="30 minutes"
        ),
        output_mode="complete",
    ).collect()
    # the 10:20 event of user 1 appears in two overlapping windows
    hits = [
        r
        for r in out
        if r["user_id"] == 1
        and str(r["window_start"]).endswith(("09:30:00", "10:00:00"))
        and r["n"] >= 1
    ]
    assert len(hits) == 2


def test_session_windows(spark, stream_dir):
    stream = ops.file_stream(spark, stream_dir, SCHEMA)
    out = ops.run_to_completion(
        ops.session_windows(stream, "ts", "user_id", gap="30 minutes"),
        output_mode="complete",
    ).collect()
    # user 1: 10:00 + 10:20 chain into one session; 12:00 starts a second
    u1 = sorted(
        [r for r in out if r["user_id"] == 1], key=lambda r: r["session_start"]
    )
    assert len(u1) == 2
    assert u1[0]["n_events"] == 2 and u1[0]["value_sum"] == 3.0
    assert u1[1]["n_events"] == 1


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windows close as the watermark advances; a row arriving
    after its window's watermark horizon is dropped, never re-opening the
    emitted window."""
    d = str(tmp_path / "late_in")
    ck = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _write_batch(spark, d, [(1, "2024-01-01 10:00:00", 1.0)])
    _write_batch(spark, d, [(1, "2024-01-01 20:00:00", 1.0)])
    stream = ops.file_stream(spark, d, SCHEMA, max_files_per_trigger=1)
    agg = ops.windowed_counts(
        stream, "ts", "user_id", window="1 hour", watermark="1 hour"
    )

    def run_once():
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # late row: 10:30 is far behind the persisted watermark (19:00) → dropped
    _write_batch(spark, d, [(1, "2024-01-01 10:30:00", 99.0)])
    run_once()
    rows = spark.read.parquet(sink).collect()
    w10 = [r for r in rows if str(r["window_start"]).endswith("10:00:00")]
    assert len(w10) == 1 and w10[0]["n"] == 1  # closed once, late row dropped
    assert not any(r["value_sum"] == 99.0 for r in rows)


def test_running_user_totals_accumulate(spark, tmp_path):
    d = str(tmp_path / "state_in")
    ck = str(tmp_path / "ckpt")
    _write_batch(
        spark,
        d,
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:00:00", 2.0)],
    )
    stream = ops.file_stream(spark, d, SCHEMA, max_files_per_trigger=1)
    out = ops.running_user_totals(stream)
    emitted: list = []

    def run_once():
        q = (
            out.writeStream.foreachBatch(
                lambda bdf, _id: emitted.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # second micro-batch adds more events for user 1; state must carry over
    _write_batch(spark, d, [(1, "2024-01-01 11:00:00", 10.0)])
    run_once()
    u1 = [r for r in emitted if r["user_id"] == 1]
    assert any(r["n_events_total"] == 2 and r["value_total"] == 11.0 for r in u1)


def test_streaming_queries_restore_session_timezone(spark, sf_dir):
    """The streaming catalog entries pin UTC for their run but must
    restore the caller's session timezone — batch results would
    otherwise depend on whether a streaming query ran first."""
    from slacken_spark.plans import load_all

    reg = load_all()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        reg["streaming_window_counts"][0](spark, sf_dir).count()
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_streaming_shard_publish(spark, sf_dir, tmp_path):
    """Continuous publish: the documents table consumed as a stream,
    shard-assigned map-side, and written partitionBy(shard_id) with an
    availableNow trigger — the streaming form of write_training_shards.
    The written layout must match the batch assignment exactly."""
    import os

    from pyspark.sql import functions as F

    from slacken_spark.functions.packing import shard_assign
    from slacken_spark.plans.catalog import t

    schema = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .format("parquet")
        .load(sf_dir)
        .select("doc_id", "source")
    )
    sharded = shard_assign(stream, "doc_id", 4)
    out = str(tmp_path / "stream_shards")
    q = (
        sharded.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .partitionBy("shard_id")
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out)
    batch = shard_assign(
        t(spark, sf_dir, "documents").select("doc_id", "source"), "doc_id", 4
    )
    assert written.count() == batch.count()
    assert (
        written.select("doc_id", "shard_id")
        .exceptAll(batch.select("doc_id", "shard_id"))
        .count()
        == 0
    )
    dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard_id=")
    )
    assert dirs == [f"shard_id={i}" for i in range(4)]


def test_index_delta_stream_applies_batches_sequentially(spark, tmp_path):
    """Two CDC micro-batches touching the SAME doc: batch 2's delta must
    be computed against the batch-1-patched base (sequential
    application), so its posting digests reflect batch 1's text for
    other docs and the final state equals applying both batches in
    order. maxFilesPerTrigger=1 forces two real micro-batches."""
    from slacken_spark.functions.inverted import delta_index

    base = spark.createDataFrame(
        [(i, f"tok{i % 3} common") for i in range(20)],
        "doc_id long, text string",
    )
    b1 = [(0, "alpha common"), (10, "beta common")]
    b2 = [(0, "gamma solo"), (5, "alpha common")]
    up_dir = tmp_path / "updates"
    up_dir.mkdir()
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(up_dir / "b1"))
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(up_dir / "b2"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(str(up_dir))
    )
    batches = []

    def sink(delta, epoch):
        batches.append(
            {
                (r["term"], r["segment"]): (r["df_segment"], list(r["postings"]))
                for r in delta.collect()
            }
        )

    import glob
    import os

    # FileStreamSource orders files by modification time: force b1
    # strictly older so the processing order is deterministic
    for name, age in (("b1", 200), ("b2", 100)):
        for f in glob.glob(str(up_dir / name / "*.parquet")):
            st = os.stat(f)
            os.utime(f, (st.st_atime, st.st_mtime - age))

    ops.run_foreach_to_completion(
        ops.index_delta_stream(
            base, stream, F.split(F.col("text"), " "), sink, segment_rows=10
        )
    )

    assert len(batches) == 2, "maxFilesPerTrigger=1 must yield two batches"
    # identify which micro-batch carried b1 by a key UNIQUE to it
    # (('beta', 1): doc 10's new term — b2 has no doc in segment 1),
    # then replay the batches with the batch operator IN THAT ORDER
    first_is_b1 = ("beta", 1) in batches[0]
    order = [b1, b2] if first_is_b1 else [b2, b1]
    cur = base
    refs = []
    for batch_rows in order:
        bdf = spark.createDataFrame(batch_rows, "doc_id long, text string")
        refs.append(
            delta_index(cur, bdf, F.split(F.col("text"), " "), segment_rows=10)
        )
        cur = cur.where(
            ~F.col("doc_id").isin([i for i, _ in batch_rows])
        ).unionByName(bdf)
    as_dict = lambda df: {
        (r["term"], r["segment"]): (r["df_segment"], list(r["postings"]))
        for r in df.collect()
    }
    assert batches[0] == as_dict(refs[0])
    assert batches[1] == as_dict(refs[1])
    fb2 = batches[1] if first_is_b1 else batches[0]
    assert first_is_b1, "mtime ordering should process b1 first"
    # the sequential property is visible: batch 2 replaces doc 0 again,
    # so its ('alpha', 0) row must account for doc 0's BATCH-1 text
    # going away while doc 5's new 'alpha' arrives — a batch-2 delta
    # computed against the ORIGINAL base would get this pair wrong
    assert ("alpha", 0) in fb2
    assert fb2[("alpha", 0)] == (1, [5])


def test_index_delta_stream_ranked_variant_sequences_too(spark, tmp_path):
    """The delta_fn hook: the SAME foreachBatch harness maintaining the
    RANKED index (delta_scored_index) must apply micro-batches
    sequentially exactly like the boolean path — batch 2's tf-postings
    computed against the batch-1-patched base."""
    from slacken_spark.functions.inverted import delta_scored_index

    base = spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 3} common") for i in range(20)],
        "doc_id long, text string",
    )
    b1 = [(0, "alpha alpha common"), (10, "beta common")]
    b2 = [(0, "gamma solo"), (5, "alpha common")]
    up_dir = tmp_path / "upd_ranked"
    up_dir.mkdir()
    spark.createDataFrame(b1, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(up_dir / "b1"))
    spark.createDataFrame(b2, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(up_dir / "b2"))
    import glob
    import os

    for name, age in (("b1", 200), ("b2", 100)):
        for f in glob.glob(str(up_dir / name / "*.parquet")):
            st = os.stat(f)
            os.utime(f, (st.st_atime, st.st_mtime - age))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .format("parquet")
        .load(str(up_dir))
    )
    as_dict = lambda df: {
        (r["term"], r["segment"]): (
            r["df_segment"],
            [(p["doc_id"], p["tf"]) for p in r["postings"]],
        )
        for r in df.collect()
    }
    batches = []
    ops.run_foreach_to_completion(
        ops.index_delta_stream(
            base,
            stream,
            F.split(F.col("text"), " "),
            lambda d, _e: batches.append(as_dict(d)),
            segment_rows=10,
            delta_fn=delta_scored_index,
        )
    )
    assert len(batches) == 2
    first_is_b1 = ("beta", 1) in batches[0]
    order = [b1, b2] if first_is_b1 else [b2, b1]
    cur = base
    for got, batch_rows in zip(batches, order):
        bdf = spark.createDataFrame(batch_rows, "doc_id long, text string")
        want = as_dict(
            delta_scored_index(
                cur, bdf, F.split(F.col("text"), " "), segment_rows=10
            )
        )
        assert got == want
        cur = cur.where(
            ~F.col("doc_id").isin([i for i, _ in batch_rows])
        ).unionByName(bdf)
    # tf actually exercised: doc 0's batch-1 rebuild carries alpha tf=2
    b1_batch = batches[0] if first_is_b1 else batches[1]
    assert b1_batch[("alpha", 0)][1] == [(0, 2)]
