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
