"""streaming/ops.grouped_sums_stream: sequential CDC view maintenance
across REAL micro-batches ≡ a from-scratch recompute after both."""

from pyspark.sql import functions as F

from slacken_spark.streaming import ops


def test_two_batch_stream_maintains_view_sequentially(spark, tmp_path):
    """maxFilesPerTrigger=1 over two CDC files → two micro-batches;
    batch 2's delta must be computed against the batch-1-ADVANCED base
    (doc 5 moves a→b in batch 1, then b→c in batch 2: only a
    sequentially-advanced base subtracts it from 'b', not 'a', the
    second time). The final view must equal a recompute over
    base+batch1+batch2, and the intermediate view must equal a
    recompute over base+batch1."""
    base_rows = [(i, "a" if i % 2 == 0 else "b", 10 + i) for i in range(20)]
    b1 = [(5, "b", 100), (0, "a", 7)]  # move 5 into b; resize 0
    b2 = [(5, "c", 1), (99, "c", 50)]  # move 5 on into c; insert 99
    base = spark.createDataFrame(base_rows, "doc_id long, source string, sz long")
    view = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("n_tokens"),
    )
    spark.createDataFrame(b1, "doc_id long, source string, sz long").coalesce(
        1
    ).write.parquet(str(tmp_path / "cdc" / "b1.parquet"))
    import time

    time.sleep(1.1)  # distinct mtimes pin file (hence batch) order
    spark.createDataFrame(b2, "doc_id long, source string, sz long").coalesce(
        1
    ).write.parquet(str(tmp_path / "cdc" / "b2.parquet"))
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
    assert snapshots[1]["c"] == (2, 51)  # doc 5 landed in c exactly once
