"""functions.skipping (zone-map data skipping) and the ranked
retrieval path (functions.inverted.scored_index / query_index_ranked)."""

import pytest
from pyspark.sql import functions as F

from slacken_spark.functions.skipping import (
    layout_shard,
    pruned_scan_predicate,
    surviving_shards,
    zone_maps,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_zone_maps_and_surviving_shards(spark):
    # 4 shards of width 10 over v=0..39; stat column w = 2*v
    df = spark.range(40).select(
        F.col("id").alias("v"), (F.col("id") * 2).alias("w")
    )
    zm = zone_maps(df, layout_shard("v", 10), ["w"])
    rows = {r["shard"]: r for r in zm.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert all(r["n_rows"] == 10 for r in rows.values())
    assert rows[1]["min_w"] == 20 and rows[1]["max_w"] == 38
    # band [20, 45] intersects shards 1 ([20,38]) and 2 ([40,58]) only
    assert surviving_shards(zm, "w", 20, 45) == [1, 2]
    # sound over-approximation: the envelope check keeps a shard with
    # no exact match (w is even-only; 21 sits inside shard 1's
    # [20, 38] envelope) but drops envelope gaps (39 sits between
    # shard 1's max and shard 2's min)
    assert surviving_shards(zm, "w", 21, 21) == [1]
    assert surviving_shards(zm, "w", 39, 39) == []
    assert surviving_shards(zm, "w", 1000, 2000) == []


def test_pruned_scan_predicate_merges_adjacent_runs(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    # shards {1,2,3, 7} of width 10 → two ranges: [10,40) and [70,80)
    pred = pruned_scan_predicate([1, 2, 3, 7], "v", 10)
    kept = sorted(r["v"] for r in df.where(pred).collect())
    assert kept == list(range(10, 40)) + list(range(70, 80))
    # a merged run must be ONE range, not three OR'd ranges
    import re

    s = str(pred._jc)
    assert len(re.findall(r">=", s)) == 2
    # empty surviving set scans nothing
    assert df.where(pruned_scan_predicate([], "v", 10)).count() == 0


def test_zone_map_pruned_scan_pushes_layout_ranges(spark, sf_dir):
    """The read path's whole point: the surviving-shard ranges must
    reach the parquet scan as pushed filters on the LAYOUT column, and
    at the fixture SF the zone maps must actually prune shards."""
    from slacken_spark.plans import load_all

    reg = load_all()
    fn, _ = reg["zone_map_pruned_scan"]
    df = fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "n_chars" in plan.split("PushedFilters")[1][:600]
    # observable pruning: the scan's pushed ranges exclude the extremes
    # (shards 0 and 11 exist in the data but cannot satisfy the band)
    shards = sorted(r["shard"] for r in df.collect())
    assert shards and min(shards) > 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = reg["doc_shard_zone_maps"]
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("Exchange") == 1, "stats build is one tiny shuffle"


def _tf_corpus(spark):
    # doc 0: 'a' x3 + 'b'; doc 1: 'a b b'; doc 2: 'c' only; doc 3: 'b'
    rows = [
        (0, "a a a b x"),
        (1, "a b b y"),
        (2, "c z"),
        (3, "b q"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scored_index_and_ranked_query_match_model(spark):
    from slacken_spark.functions.inverted import (
        query_index_ranked,
        scored_index,
    )

    docs = _tf_corpus(spark)
    idx = scored_index(docs, F.split(F.col("text"), " "))
    by_term = {
        r["term"]: (r["df"], [(p["doc_id"], p["tf"]) for p in r["postings"]])
        for r in idx.collect()
    }
    assert by_term["a"] == (2, [(0, 3), (1, 1)])
    assert by_term["b"] == (3, [(0, 1), (1, 2), (3, 1)])
    assert by_term["c"] == (1, [(2, 1)])

    # N=4: idf_scaled(a) = 4000//2 = 2000, (b) = 4000//3 = 1333
    # scores: doc0 = 3*2000 + 1*1333 = 7333; doc1 = 2000 + 2*1333 = 4666;
    # doc3 = 1333
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in query_index_ranked(idx, ["a", "b"], 3, 4)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(0, 7333, 1), (1, 4666, 2), (3, 1333, 3)]
    # duplicate query terms must not double-score
    got_dup = query_index_ranked(idx, ["a", "b", "a"], 3, 4).collect()
    assert sorted((r["doc_id"], r["score"]) for r in got_dup) == [
        (0, 7333),
        (1, 4666),
        (3, 1333),
    ]
    for k, terms, n in ((0, ["a"], 4), (3, [], 4), (3, ["a"], 0)):
        with pytest.raises(ValueError):
            query_index_ranked(idx, terms, k, n)


def test_ranked_query_plan_is_takeordered_broadcast(spark):
    from slacken_spark.functions.inverted import (
        query_index_ranked,
        scored_index,
    )

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hot w"), (F.col("id") % 97).cast("string")).alias(
            "text"
        ),
    )
    idx = scored_index(docs, F.split(F.col("text"), " "))
    plan = _plan(query_index_ranked(idx, ["hot", "w3"], 10, 500))
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_maintain_zone_maps_equals_rebuild(spark, tmp_path):
    from slacken_spark.functions.skipping import maintain_zone_maps

    # base: ids 0..39, layout v = id, stat w = 2*id → shards 0..3
    base = spark.range(40).select(
        F.col("id"),
        F.col("id").alias("v"),
        (F.col("id") * 2).alias("w"),
    )
    old_zm = zone_maps(base, layout_shard("v", 10), ["w"])
    # batch: every shard-1 resident moves to shard 0 (shard 1 empties),
    # and id 25 changes stats IN PLACE in shard 2; shards 0 and 3 are
    # untouched by ids but shard 0 gains movers
    batch = spark.createDataFrame(
        [(10 + i, 5, 1000 + i) for i in range(10)] + [(25, 25, -7)],
        "id long, v long, w long",
    )
    got = maintain_zone_maps(old_zm, base, batch, "id", "v", 10, ["w"])
    merged = base.join(batch.select("id"), "id", "left_anti").unionByName(
        batch
    )
    want = zone_maps(merged, layout_shard("v", 10), ["w"])
    key = lambda r: (r["shard"], r["n_rows"], r["min_w"], r["max_w"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    # the emptied shard is gone, exactly like a rebuild
    assert 1 not in {r["shard"] for r in got.collect()}


def test_maintain_zone_maps_empty_batch_is_identity(spark):
    from slacken_spark.functions.skipping import maintain_zone_maps

    base = spark.range(20).select(
        F.col("id"), F.col("id").alias("v"), (F.col("id") * 3).alias("w")
    )
    old_zm = zone_maps(base, layout_shard("v", 10), ["w"])
    batch = spark.createDataFrame([], "id long, v long, w long")
    got = maintain_zone_maps(old_zm, base, batch, "id", "v", 10, ["w"])
    key = lambda r: tuple(r)
    assert sorted(map(key, got.collect())) == sorted(
        map(key, old_zm.collect())
    )


def test_maintain_zone_maps_prunes_recompute_scan(spark, tmp_path):
    """The maintenance claim: the affected-shard recompute must reach
    the parquet base as PUSHED layout ranges (untouched shards' bytes
    unread), and the batch-id lookups must be broadcast, never a
    corpus shuffle."""
    from slacken_spark.functions.skipping import maintain_zone_maps

    p = str(tmp_path / "zm_base")
    spark.range(1000).select(
        F.col("id"), F.col("id").alias("v"), (F.col("id") * 2).alias("w")
    ).write.parquet(p)
    base = spark.read.parquet(p)
    old_zm = zone_maps(base, layout_shard("v", 100), ["w"])
    batch = spark.createDataFrame(
        [(150, 155, 9), (160, 42, 9)], "id long, v long, w long"
    )
    got = maintain_zone_maps(old_zm, base, batch, "id", "v", 100, ["w"])
    plan = _plan(got)
    pushed = [
        seg[:400] for seg in plan.split("PushedFilters: [")[1:] if "v" in seg
    ]
    assert pushed, "recompute scan must push the affected layout ranges"
    # the old-shard semi-join collects at construction (plan-time
    # metadata, like surviving_shards), so the RETURNED plan carries
    # only the anti-join — which must be broadcast on the batch ids
    assert plan.count("BroadcastHashJoin") >= 1, "id lookup broadcast"
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # affected = {0 (new shard of mover), 1 (old shards)} → shards 2..9
    # pass through; result still equals a rebuild
    merged = base.join(batch.select("id"), "id", "left_anti").unionByName(
        batch
    )
    want = zone_maps(merged, layout_shard("v", 100), ["w"])
    key = lambda r: tuple(r)
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_maintain_zone_maps_rejects_null_layout(spark):
    from slacken_spark.functions.skipping import maintain_zone_maps

    base = spark.range(10).select(
        F.col("id"), F.col("id").alias("v"), F.col("id").alias("w")
    )
    old_zm = zone_maps(base, layout_shard("v", 10), ["w"])
    batch = spark.createDataFrame(
        [(3, None, 5)], "id long, v long, w long"
    )
    with pytest.raises(ValueError, match="non-null"):
        maintain_zone_maps(old_zm, base, batch, "id", "v", 10, ["w"])


def _zm_model(rows, width):
    """Pure-python zone-map rebuild: {shard: (n, min_w, max_w)}."""
    out = {}
    for v, w in rows:
        s = v // width
        if s not in out:
            out[s] = [0, w, w]
        out[s][0] += 1
        out[s][1] = min(out[s][1], w)
        out[s][2] = max(out[s][2], w)
    return {s: tuple(x) for s, x in out.items()}


def test_two_batch_zone_map_stream_advances_base(spark, tmp_path):
    """maxFilesPerTrigger=1 over two CDC files → two micro-batches;
    id 35 moves shard 3→0 in batch 1 and 0→2 in batch 2. Only a
    sequentially-advanced base resolves its OLD shard as 0 in batch 2
    — a stale base would read shard 3, leave shard 0 out of the
    affected set, and pass through shard-0 stats that still contain
    id 35. Each snapshot must equal a from-scratch rebuild of the
    merged rows at that point."""
    import glob
    import os

    from slacken_spark.streaming import ops

    base_rows = [(i, i, 2 * i) for i in range(40)]
    b1 = [(35, 5, 1000), (2, 2, -50)]
    b2 = [(35, 25, 7)]
    base = spark.createDataFrame(base_rows, "id long, v long, w long")
    zm = zone_maps(base, layout_shard("v", 10), ["w"])
    for name, rows in (("b1.parquet", b1), ("b2.parquet", b2)):
        spark.createDataFrame(rows, "id long, v long, w long").coalesce(
            1
        ).write.parquet(str(tmp_path / "cdc" / name))
    for name, age in (("b1.parquet", 200), ("b2.parquet", 100)):
        for f in glob.glob(str(tmp_path / "cdc" / name / "*.parquet")):
            st = os.stat(f)
            os.utime(f, (st.st_atime, st.st_mtime - age))
    stream = (
        spark.readStream.schema("id long, v long, w long")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(tmp_path / "cdc") + "/*/")
    )
    snapshots = []

    def sink(zm_df, _epoch):
        snapshots.append(
            {
                r["shard"]: (r["n_rows"], r["min_w"], r["max_w"])
                for r in zm_df.collect()
            }
        )

    ops.run_foreach_to_completion(
        ops.zone_maps_stream(base, zm, stream, sink, "id", "v", 10, ["w"])
    )
    assert len(snapshots) == 2, "expected two micro-batches"

    def merged(*batches):
        rows = {i: (v, w) for i, v, w in base_rows}
        for b in batches:
            for i, v, w in b:
                rows[i] = (v, w)
        return list(rows.values())

    assert snapshots[0] == _zm_model(merged(b1), 10)
    assert snapshots[1] == _zm_model(merged(b1, b2), 10)
    # the discriminator: shard 0 after batch 2 must have dropped id 35
    # (its batch-1 w=1000 max would otherwise linger in a stale run)
    assert snapshots[1][0][2] != 1000


def test_empty_zone_map_batch_reports_unchanged_stats(spark, tmp_path):
    from slacken_spark.streaming import ops

    base = spark.createDataFrame(
        [(1, 1, 5), (2, 15, 6)], "id long, v long, w long"
    )
    zm = zone_maps(base, layout_shard("v", 10), ["w"])
    spark.createDataFrame([(9, 9, 9)], "id long, v long, w long").coalesce(
        1
    ).write.parquet(str(tmp_path / "cdc" / "b.parquet"))
    stream = (
        spark.readStream.schema("id long, v long, w long")
        .format("parquet")
        .load(str(tmp_path / "cdc") + "/*/")
        .where(F.col("id") < 0)
    )
    seen = []

    def sink(zm_df, _epoch):
        seen.append(sorted(tuple(r) for r in zm_df.collect()))

    ops.run_foreach_to_completion(
        ops.zone_maps_stream(base, zm, stream, sink, "id", "v", 10, ["w"])
    )
    assert seen == [sorted(tuple(r) for r in zm.collect())]


def test_maintain_zone_maps_keeps_null_base_shard(spark):
    """A NULL-layout row in the BASE (not the batch) owns a NULL-shard
    stats row; it can never be affected, so maintenance must pass it
    through — review catch: plain ~isin() evaluates NULL and dropped
    it, diverging from the rebuild."""
    from slacken_spark.functions.skipping import maintain_zone_maps

    base = spark.createDataFrame(
        [(1, 1, 5), (2, 15, 6), (3, None, 7)], "id long, v long, w long"
    )
    old_zm = zone_maps(base, layout_shard("v", 10), ["w"])
    batch = spark.createDataFrame([(1, 2, 50)], "id long, v long, w long")
    got = maintain_zone_maps(old_zm, base, batch, "id", "v", 10, ["w"])
    merged = base.join(batch.select("id"), "id", "left_anti").unionByName(
        batch
    )
    want = zone_maps(merged, layout_shard("v", 10), ["w"])
    key = lambda r: tuple(r)
    assert sorted(map(key, got.collect()), key=str) == sorted(
        map(key, want.collect()), key=str
    )
    assert None in {r["shard"] for r in got.collect()}
