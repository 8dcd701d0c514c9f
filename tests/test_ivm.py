"""functions.ivm: grouped SUM/COUNT view maintenance ≡ from-scratch
recompute under CDC replacement batches — moves, inserts, new groups,
group disappearance, NULL groups."""

import pytest
from pyspark.sql import functions as F


def _maintained(spark, base_rows, upd_rows):
    from slacken_spark.functions.ivm import maintain_grouped_sums

    base = spark.createDataFrame(base_rows, "doc_id long, source string, sz long")
    upd = spark.createDataFrame(upd_rows, "doc_id long, source string, sz long")
    view = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("sz").cast("long").alias("n_tokens"),
    )
    out = maintain_grouped_sums(view, base, upd, "source", F.col("sz"))
    return {r["source"]: (r["n_docs"], r["n_tokens"]) for r in out.collect()}


def _recomputed(base_rows, upd_rows):
    upd_ids = {i for i, _, _ in upd_rows}
    merged = [r for r in base_rows if r[0] not in upd_ids] + upd_rows
    out = {}
    for _, g, sz in merged:
        n, s = out.get(g, (0, 0))
        out[g] = (n + 1, s + sz)
    return out


def test_maintain_matches_recompute_with_moves_and_inserts(spark):
    base = [(i, f"s{i % 3}", 10 + i % 7) for i in range(60)]
    upd = (
        [(i, "s1", 100 + i) for i in range(0, 20, 5)]  # moves into s1
        + [(999, "brand_new", 42)]  # insert creating a new group
        + [(7, "s0", 1)]  # in-place size change, s0 stays
    )
    assert _maintained(spark, base, upd) == _recomputed(base, upd)


def test_maintain_drops_a_group_that_empties(spark):
    base = [(1, "a", 5), (2, "a", 6), (3, "b", 7)]
    upd = [(1, "b", 5), (2, "b", 6)]  # group 'a' empties
    got = _maintained(spark, base, upd)
    assert got == _recomputed(base, upd)
    assert "a" not in got


def test_maintain_handles_null_groups(spark):
    base = [(1, None, 5), (2, None, 6), (3, "b", 7)]
    upd = [(2, "b", 9), (3, None, 1)]  # out of and into the NULL group
    assert _maintained(spark, base, upd) == _recomputed(base, upd)


def test_maintain_random_batches_match_recompute(spark):
    import random

    rng = random.Random(7)
    base = [
        (i, rng.choice(["x", "y", "z", None]), rng.randrange(0, 50))
        for i in range(200)
    ]
    ids = rng.sample(range(200), 40)
    upd = [
        (i, rng.choice(["x", "y", "z", "w", None]), rng.randrange(0, 50))
        for i in ids
    ] + [(1000 + k, rng.choice(["x", "w"]), rng.randrange(0, 50)) for k in range(5)]
    assert _maintained(spark, base, upd) == _recomputed(base, upd)
