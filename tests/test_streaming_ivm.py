"""streaming/ops.grouped_sums_stream: sequential CDC view maintenance
across REAL micro-batches ≡ a from-scratch recompute after both."""

from pyspark.sql import functions as F

from slacken_spark.streaming import ops


def test_two_batch_stream_maintains_view_sequentially(spark, tmp_path):
    """maxFilesPerTrigger=1 over two CDC files → two micro-batches;
    batch 2's delta must be computed against the batch-1-ADVANCED base
    (doc 4 starts in 'a', moves a→b in batch 1, then b→c in batch 2:
    only a sequentially-advanced base subtracts it from 'b' — a stale
    base would subtract it from 'a' the second time). The final view
    must equal a recompute over base+batch1+batch2, and the
    intermediate view must equal a recompute over base+batch1."""
    base_rows = [(i, "a" if i % 2 == 0 else "b", 10 + i) for i in range(20)]
    b1 = [(4, "b", 100), (0, "a", 7)]  # move 4 a→b; resize 0 in place
    b2 = [(4, "c", 1), (99, "c", 50)]  # move 4 on b→c; insert 99
    base = spark.createDataFrame(base_rows, "doc_id long, source string, sz long")
    view = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("n_tokens"),
    )
    spark.createDataFrame(b1, "doc_id long, source string, sz long").coalesce(
        1
    ).write.parquet(str(tmp_path / "cdc" / "b1.parquet"))
    spark.createDataFrame(b2, "doc_id long, source string, sz long").coalesce(
        1
    ).write.parquet(str(tmp_path / "cdc" / "b2.parquet"))
    import glob
    import os

    # FileStreamSource orders files by modification time: backdate b1
    # strictly older (the tests/test_streaming.py idiom) so processing
    # order is deterministic without sleeping
    for name, age in (("b1.parquet", 200), ("b2.parquet", 100)):
        for f in glob.glob(str(tmp_path / "cdc" / name / "*.parquet")):
            st = os.stat(f)
            os.utime(f, (st.st_atime, st.st_mtime - age))
    stream = (
        spark.readStream.schema("doc_id long, source string, sz long")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(tmp_path / "cdc") + "/*/")
    )
    snapshots = []

    def sink(view_df, epoch):
        snapshots.append(
            {r["source"]: (r["n_docs"], r["n_tokens"]) for r in view_df.collect()}
        )

    ops.run_foreach_to_completion(
        ops.grouped_sums_stream(base, view, stream, "source", F.col("sz"), sink)
    )
    assert len(snapshots) == 2, "expected two micro-batches"

    def recompute(*batches):
        rows = {i: (g, s) for i, g, s in base_rows}
        for b in batches:
            for i, g, s in b:
                rows[i] = (g, s)
        out = {}
        for g, s in rows.values():
            n, t = out.get(g, (0, 0))
            out[g] = (n + 1, t + s)
        return out

    assert snapshots[0] == recompute(b1)
    assert snapshots[1] == recompute(b1, b2)
    assert snapshots[1]["c"] == (2, 51)  # doc 4 landed in c exactly once


def test_empty_cdc_batch_reports_unchanged_view(spark, tmp_path):
    """A CDC micro-batch that filters to zero rows must still surface
    the (unchanged) maintained view — a silent skip would make an
    all-empty stream report an empty view while the batch operator
    returns the view untouched."""
    base_rows = [(1, "a", 5), (2, "b", 6)]
    base = spark.createDataFrame(base_rows, "doc_id long, source string, sz long")
    view = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("n_tokens"),
    )
    spark.createDataFrame(
        [(7, "x", 1)], "doc_id long, source string, sz long"
    ).coalesce(1).write.parquet(str(tmp_path / "cdc" / "b.parquet"))
    stream = (
        spark.readStream.schema("doc_id long, source string, sz long")
        .format("parquet")
        .load(str(tmp_path / "cdc") + "/*/")
        .where(F.col("doc_id") < 0)  # filters the whole batch away
    )
    seen = []

    def sink(view_df, _epoch):
        seen.append(
            {r["source"]: (r["n_docs"], r["n_tokens"]) for r in view_df.collect()}
        )

    ops.run_foreach_to_completion(
        ops.grouped_sums_stream(base, view, stream, "source", F.col("sz"), sink)
    )
    assert seen == [{"a": (1, 5), "b": (1, 6)}]


def test_advance_base_lineage_stays_bounded(spark):
    """A long-running stream's advancing base must NOT grow one
    anti-join+union layer per batch forever: every
    ops._ADVANCE_CKPT_EVERY-th advancement eagerly localCheckpoints
    the base (plan truncates to a Scan of the materialized RDD) and
    frees the previous checkpoint. Pinned on the PLAN, not wall time
    (deterministic; this VM's timing noise would flake a flatness
    assertion): join-node count right after a checkpoint is zero, and
    never exceeds the cadence in between. Content must equal plain
    sequential application throughout."""
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "doc_id long, text string"
    )
    state: dict = {}
    expect = {i: f"t{i}" for i in range(20)}
    joins_after = []
    for b in range(1, 10):
        batch = spark.createDataFrame(
            [(b % 20, f"v{b}"), (100 + b, f"new{b}")],
            "doc_id long, text string",
        )
        expect[b % 20] = f"v{b}"
        expect[100 + b] = f"new{b}"
        base = ops._advance_base(base, batch, "doc_id", state)
        plan = base._jdf.queryExecution().optimizedPlan().toString()
        joins_after.append(plan.count("Join"))
    k = ops._ADVANCE_CKPT_EVERY
    # right after the k-th and 2k-th advancement the plan is a pure
    # scan of the checkpointed RDD
    assert joins_after[k - 1] == 0 and joins_after[2 * k - 1] == 0
    # and the growth between checkpoints REPEATS instead of
    # compounding — the plan k batches after a checkpoint looks like
    # the plan k batches after the start
    assert joins_after[k : 2 * k] == joins_after[:k], joins_after
    got = {r["doc_id"]: r["text"] for r in base.collect()}
    assert got == expect


def test_advance_base_final_checkpoint_released_after_run(spark):
    """The per-batch cadence frees every predecessor checkpoint; the
    LAST one must be freed when the stream completes — the
    run_foreach_to_completion harness calls the maintainer's release
    hook, so a session running many >=k-batch streams does not leak
    one base-sized materialized RDD per run."""
    state: dict = {}
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    for b in range(ops._ADVANCE_CKPT_EVERY):
        batch = spark.createDataFrame(
            [(b, f"v{b}")], "doc_id long, text string"
        )
        base = ops._advance_base(base, batch, "doc_id", state)
    ckpt = state.get("_base_ckpt")
    assert ckpt is not None
    rdd_id = ckpt._jdf.queryExecution().analyzed().rdd().id()
    persistent = spark.sparkContext._jsc.sc().getPersistentRDDs()
    assert persistent.contains(rdd_id), "checkpoint should be materialized"
    ops._release_advance_ckpt(state)
    assert "_base_ckpt" not in state
    persistent = spark.sparkContext._jsc.sc().getPersistentRDDs()
    assert not persistent.contains(rdd_id), "release must unpersist the blocks"


def test_advance_base_checkpoint_routes_through_stats_free(spark, monkeypatch):
    """The k-th advancement's eager checkpoint must rebuild through
    dedup._stats_free: each checkpoint's plan holds a JOIN over the
    previous checkpoint, so over a long stream preserved sizeInBytes
    estimates compound per checkpoint (the dedup BigInteger planning
    blowup, stream-shaped). The stored _base_ckpt must be the REBUILT
    frame, so the release path still reaches the same backing RDD
    (pinned by test_advance_base_final_checkpoint_released_after_run)."""
    import slacken_spark.functions.dedup as dedup

    seen = []
    orig = dedup._stats_free

    def recording(df):
        out = orig(df)
        seen.append(out)
        return out

    monkeypatch.setattr(dedup, "_stats_free", recording)
    state: dict = {}
    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    for b in range(ops._ADVANCE_CKPT_EVERY):
        batch = spark.createDataFrame(
            [(b, f"v{b}")], "doc_id long, text string"
        )
        base = ops._advance_base(base, batch, "doc_id", state)
    assert len(seen) == 1
    assert state["_base_ckpt"] is seen[-1] is base
    got = {r["doc_id"]: r["text"] for r in base.collect()}
    assert got == {**{i: f"t{i}" for i in range(4, 10)},
                   **{b: f"v{b}" for b in range(4)}}
    ops._release_advance_ckpt(state)
