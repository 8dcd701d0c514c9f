"""pack_greedy: greedy invariants, shard coverage, and the hot-group
shape — one source spread across shards instead of one task."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from slacken_spark.functions.packing import pack_greedy

BUDGET = 100


def _ref_pack(sizes):
    acc, pid, out = 0, 0, []
    for i, n in enumerate(sizes):
        if i > 0 and acc + n > BUDGET:
            pid += 1
            acc = n
        else:
            acc += n
        out.append(pid)
    return out


@pytest.fixture(scope="module")
def hot(spark):
    rng = np.random.default_rng(99)
    rows = [
        ("hot", int(i), int(rng.integers(5, 60))) for i in range(200)
    ] + [("cold", int(i), int(rng.integers(5, 60))) for i in range(10)]
    return spark.createDataFrame(
        rows, "source string, doc_id long, n_tokens long"
    )


def test_sharded_pack_matches_per_shard_reference(hot):
    out = (
        pack_greedy(hot, BUDGET, shards=4)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    # every doc exactly once
    assert len(out) == 210
    assert out.groupby(["source", "doc_id"]).size().max() == 1
    # the hot source really spreads across 4 shards, contiguous ranges
    hot_rows = out[out["source"] == "hot"]
    assert sorted(hot_rows["shard_id"].unique()) == [0, 1, 2, 3]
    assert hot_rows.groupby("shard_id").size().tolist() == [50, 50, 50, 50]
    bounds = hot_rows.groupby("shard_id")["doc_id"].agg(["min", "max"])
    assert (bounds["max"].to_numpy()[:-1] < bounds["min"].to_numpy()[1:]).all()
    # greedy recurrence holds independently per (source, shard)
    for (_, _), grp in out.groupby(["source", "shard_id"]):
        grp = grp.sort_values("doc_id")
        assert grp["pack_id"].tolist() == _ref_pack(grp["n_tokens"].tolist())


def test_unsharded_is_one_chain_per_group(hot):
    out = (
        pack_greedy(hot, BUDGET)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert (out["shard_id"] == 0).all()
    for _, grp in out.groupby("source"):
        grp = grp.sort_values("doc_id")
        assert grp["pack_id"].tolist() == _ref_pack(grp["n_tokens"].tolist())


def test_pack_never_overflows_unless_single_doc(hot):
    out = pack_greedy(hot, BUDGET, shards=4).toPandas()
    sums = out.groupby(["source", "shard_id", "pack_id"]).agg(
        total=("n_tokens", "sum"), n=("doc_id", "count")
    )
    over = sums[sums["total"] > BUDGET]
    assert (over["n"] == 1).all()


def test_hash_sharding_is_map_only_and_covers(hot):
    """shard_by='hash' must not introduce a window (no per-group
    serialization): the plan has exactly one exchange (the composite
    repartition) and no Window/Sort before it; coverage and the budget
    invariant still hold."""
    import re

    out_df = pack_greedy(hot, BUDGET, shards=4, shard_by="hash")
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "hash sharding must not sort per group"
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    out = out_df.toPandas()
    assert len(out) == 210
    assert out.groupby(["source", "doc_id"]).size().max() == 1
    assert sorted(out[out["source"] == "hot"]["shard_id"].unique()) == [0, 1, 2, 3]
    for (_, _), grp in out.groupby(["source", "shard_id"]):
        grp = grp.sort_values("doc_id")
        assert grp["pack_id"].tolist() == _ref_pack(grp["n_tokens"].tolist())


def test_bad_shard_by_rejected(hot):
    with pytest.raises(ValueError):
        pack_greedy(hot, BUDGET, shards=4, shard_by="rand")


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    from slacken_spark.functions.packing import shard_assign, write_training_shards

    rows = [("s", i, 10 + i % 7) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, path, "doc_id", n_shards=4, size_col="n_tokens"
    ).toPandas().sort_values("shard_id").reset_index(drop=True)

    # one partition directory per shard, every shard occupied
    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard_id="))
    assert dirs == [f"shard_id={i}" for i in range(4)]

    # manifest certifies the written data: counts match the assignment
    expect = (
        shard_assign(df, "doc_id", 4)
        .groupBy("shard_id")
        .count()
        .toPandas()
        .set_index("shard_id")["count"]
    )
    assert manifest["n_rows"].sum() == 100
    for _, r in manifest.iterrows():
        assert r["n_rows"] == expect[r["shard_id"]]

    # round-trip: written rows identical to the input
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == list(range(100))

    # assignment is md5-deterministic: same ids → same shards on re-run
    again = shard_assign(df, "doc_id", 4).select("doc_id", "shard_id")
    assert again.subtract(shard_assign(df, "doc_id", 4).select("doc_id", "shard_id")).count() == 0


def test_manifest_emits_zero_row_entries_for_empty_shards(spark, tmp_path):
    # 2 docs across 16 shards: most shards get no rows and hence no
    # partition directory — the manifest must still carry an explicit
    # zero entry for each so a gap is distinguishable from a lost shard.
    from slacken_spark.functions.packing import write_training_shards

    df = spark.createDataFrame(
        [("s", 1, 5), ("s", 2, 7)], "source string, doc_id long, n_tokens long"
    )
    manifest = (
        write_training_shards(df, str(tmp_path / "sparse"), "doc_id", 16, "n_tokens")
        .toPandas()
        .sort_values("shard_id")
        .reset_index(drop=True)
    )
    assert manifest["shard_id"].tolist() == list(range(16))
    assert manifest["n_rows"].sum() == 2
    assert manifest["n_tokens"].sum() == 12
    assert (manifest[manifest["n_rows"] == 0]["n_tokens"] == 0).all()


def _quota_ref(rows, quota):
    """Reference kept set: per group, hash order, prefix while cum<=quota."""
    import hashlib
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, i, n in rows:
        by_g[g].append((hashlib.md5(str(i).encode()).hexdigest(), i, n))
    kept = set()
    for g, lst in by_g.items():
        cum = 0
        for _h, i, n in sorted(lst):
            cum += n
            if cum > quota:
                break
            kept.add((g, i))
    return kept


def test_quota_sample_modes_agree_and_match_reference(spark):
    """Window and hash modes must produce the IDENTICAL kept set (the
    hash mode's bucket order refines hash order), and both must match
    the pure-Python reference — including zero-size rows, a group fully
    under quota, and a group where the first doc already overflows."""
    from slacken_spark.functions.packing import quota_sample

    rows = (
        [("big", i, 7) for i in range(200)]  # quota cuts mid-way
        + [("small", i + 1000, 3) for i in range(5)]  # fully under quota
        + [("zero", i + 2000, 0) for i in range(10)]  # all zero-size kept
        + [("fat", 3000, 10_000)]  # first doc overflows alone
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, ntok long")
    quota = 170
    ref = _quota_ref(rows, quota)
    for mode in ("window", "hash"):
        got = {
            (r["source"], r["doc_id"])
            for r in quota_sample(
                df, quota, "source", "doc_id", "ntok", mode, n_buckets=16
            ).collect()
        }
        assert got == ref, f"mode={mode}"
    assert ("small", 1000) in ref and ("zero", 2000) in ref
    assert not any(g == "fat" for g, _ in ref)


def test_quota_sample_null_groups_and_sizes_agree_across_modes(spark):
    """NULL source rows form ONE group (window-partition semantics) and
    NULL sizes count as 0 — in BOTH modes. Regression: hash mode's
    inner join on the raw group silently dropped every NULL-group row,
    and a NULL histogram sum crashed the driver prefix scan."""
    from slacken_spark.functions.packing import quota_sample

    rows = [
        (None, 1, 5),
        (None, 2, None),  # NULL size → counts as 0, stays kept
        (None, 3, 5),
        ("s", 4, None),  # a (group, bucket) whose only size is NULL
        ("s", 5, 3),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, ntok long")
    for mode in ("window", "hash"):
        got = {
            (r["source"], r["doc_id"])
            for r in quota_sample(
                df, 100, "source", "doc_id", "ntok", mode, n_buckets=16
            ).collect()
        }
        assert got == {(g, i) for g, i, _ in rows}, f"mode={mode}"
    # and a quota that cuts inside the NULL group still agrees
    for mode in ("window", "hash"):
        kept = quota_sample(
            df, 5, "source", "doc_id", "ntok", mode, n_buckets=16
        ).where(F.col("source").isNull()).count()
        assert kept == quota_sample(
            df, 5, "source", "doc_id", "ntok", "window"
        ).where(F.col("source").isNull()).count(), f"mode={mode}"


def test_quota_sample_modes_agree_on_random_inputs(spark):
    """Property: window ≡ hash ≡ pure-Python reference for random
    group/size layouts and quotas, across bucket counts (including
    n_buckets small enough that many boundary buckets hold several
    docs, and power-of-16 vs non-power-of-16)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from slacken_spark.functions.packing import quota_sample

    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=0, max_value=40),
            ),
            min_size=1,
            max_size=60,
            unique_by=lambda r: r[1],
        ),
        quota=st.integers(min_value=0, max_value=400),
        n_buckets=st.sampled_from([4, 16, 100]),
    )
    def check(rows, quota, n_buckets):
        df = spark.createDataFrame(
            rows, "source string, doc_id long, ntok long"
        )
        ref = _quota_ref(rows, quota)
        for mode in ("window", "hash"):
            got = {
                (r["source"], r["doc_id"])
                for r in quota_sample(
                    df, quota, "source", "doc_id", "ntok", mode, n_buckets
                ).collect()
            }
            assert got == ref, (mode, quota, n_buckets, sorted(rows)[:5])

    check()


def test_quota_sample_hash_mode_hot_group_stress(spark):
    """The hash mode's reason to exist: ONE group is the dataset (100k
    rows). The kept token total must land exactly in (quota - max_size,
    quota], the kept set must equal window mode's, and the boundary
    bucket — the only rows that ever see a sort — must be a tiny
    fraction of the group."""
    from pyspark.sql import functions as F

    from slacken_spark.functions.packing import quota_sample

    n, quota = 100_000, 50_000
    df = spark.range(n).select(
        F.lit("the_corpus").alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("ntok"),
    )
    kept = quota_sample(df, quota, "source", "doc_id", "ntok", "hash")
    row = kept.agg(
        F.sum("ntok").alias("tok"), F.count(F.lit(1)).alias("n")
    ).first()
    assert quota - 7 < row["tok"] <= quota
    # exact agreement with window mode on the kept ids
    w_ids = {
        r["doc_id"]
        for r in quota_sample(
            df, quota, "source", "doc_id", "ntok", "window"
        ).select("doc_id").collect()
    }
    h_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert h_ids == w_ids and len(h_ids) == row["n"]
    # the boundary bucket is ~n/4096 of the group (allow 5x headroom)
    edge_bound = 5 * (n // 4096 + 1)
    assert 0 < len(h_ids) < n
    # reconstruct the boundary bucket size from the plan semantics:
    # rows in the kept set whose bucket equals the max kept bucket
    kept_with_bkt = kept.withColumn(
        "_bkt",
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3), 16, 10
        ).cast("long"),
    )
    mx = kept_with_bkt.agg(F.max("_bkt")).first()[0]
    edge_rows = kept_with_bkt.where(F.col("_bkt") == mx).count()
    assert edge_rows <= edge_bound, f"boundary bucket {edge_rows} > {edge_bound}"


def test_quota_sample_per_group_dict_quotas(spark):
    """Dict quotas: each group gets its own budget, both modes agree
    with the per-group reference, and an unlisted group is DROPPED
    ENTIRELY — including its zero/NULL-size rows, which a quota-0
    bounds row would leak (the convention: dual-mode identical-set
    contracts need NULL-group and zero-size rows in the fixture)."""
    import pyspark.sql.functions as SF

    from slacken_spark.functions.packing import quota_sample

    rows = (
        [("big", i, 7) for i in range(100)]
        + [("mid", i + 1000, 5) for i in range(20)]
        + [("unlisted", 2000, 1)]
        + [("unlisted", 2001, 0), ("unlisted", 2002, None)]  # must NOT leak
        + [(None, 3000, 2), (None, 3001, None)]  # NULL group, listed
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, ntok long")
    quotas = {"big": 70, "mid": 1_000, None: 100}
    expect = (
        _quota_ref([r for r in rows if r[0] == "big"], 70)
        | _quota_ref([r for r in rows if r[0] == "mid"], 1_000)
        | _quota_ref(
            [(g, i, n or 0) for g, i, n in rows if g is None], 100
        )
    )
    for mode in ("window", "hash"):
        got = {
            (r["source"], r["doc_id"])
            for r in quota_sample(
                df, quotas, "source", "doc_id", "ntok", mode, n_buckets=16
            ).collect()
        }
        assert got == expect, f"mode={mode}"
        assert not any(g == "unlisted" for g, _ in got)
        assert (None, 3001) in got  # NULL size counts as 0, stays kept
    # empty dict → nothing kept, either mode
    assert quota_sample(df, {}, "source", "doc_id", "ntok", "window").count() == 0
    assert quota_sample(df, {}, "source", "doc_id", "ntok", "hash").count() == 0
    # non-str dict keys are rejected, not silently unmatched
    bdf = df.withColumn("source", SF.col("doc_id") < 1000)
    with pytest.raises(ValueError):
        quota_sample(bdf, {True: 10}, "source", "doc_id", "ntok", "hash")


def test_quota_sample_negative_sizes_clamp_identically(spark):
    """Negative sizes clamp to 0 in BOTH modes (documented contract):
    a raw window sum over negative sizes is non-monotone, so the
    window filter and the hash boundary prefix scan would diverge —
    the clamp keeps the kept sets byte-identical by construction."""
    from slacken_spark.functions.packing import quota_sample

    rows = [("s", 1, -50), ("s", 2, 5), ("s", 3, -1), ("s", 4, 4), ("s", 5, 3)]
    df = spark.createDataFrame(rows, "source string, doc_id long, ntok long")
    ref = _quota_ref([(g, i, max(n, 0)) for g, i, n in rows], 8)
    for mode in ("window", "hash"):
        got = {
            (r["source"], r["doc_id"])
            for r in quota_sample(
                df, 8, "source", "doc_id", "ntok", mode, n_buckets=16
            ).collect()
        }
        assert got == ref, f"mode={mode}"
    # the clamp is observable: a raw (unclamped) window sum would keep a
    # different set whenever a negative dips the running total back under
    # quota — replay the raw recurrence and require it to differ, so this
    # fixture genuinely distinguishes clamped from raw semantics
    import hashlib

    raw_kept, cum = set(), 0
    for _h, i, n in sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i, n) for _g, i, n in rows
    ):
        cum += n
        if cum > 8:
            break
        raw_kept.add(("s", i))
    assert raw_kept != ref, "fixture must separate raw from clamped sums"


def test_quota_sample_quota_exactly_at_bucket_edge(spark):
    """Tie corner (VERDICT r6 item 6): the quota lands EXACTLY on a
    bucket boundary — the running total at the end of bucket k equals
    the quota, so the boundary bucket keeps nothing except zero-size
    rows (cum == quota passes ``<=``), and cross-group duplicate
    doc_ids give byte-equal hashes in two groups at once. Both modes
    must still agree with the reference."""
    import hashlib

    from slacken_spark.functions.packing import quota_sample

    ids = list(range(40))
    by_bucket = {}
    for i in ids:
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_bucket.setdefault(int(h[0], 16), []).append(i)
    buckets = sorted(by_bucket)
    # quota = exact total of the two lowest buckets (5 tokens per doc)
    low = buckets[:2]
    quota = 5 * sum(len(by_bucket[b]) for b in low)
    boundary = buckets[2]
    # a zero-size doc landing IN the boundary bucket, hash-ordered BEFORE
    # its sized docs — cum there equals the quota exactly, and the <=
    # filter must keep it (a zero-size doc AFTER the overflow row is
    # correctly dropped — cum already exceeds quota)
    min_sized_h = min(
        hashlib.md5(str(i).encode()).hexdigest() for i in by_bucket[boundary]
    )
    zid = next(
        j
        for j in range(10_000, 50_000)
        if (h := hashlib.md5(str(j).encode()).hexdigest())[0]
        == format(boundary, "x")
        and h < min_sized_h
    )
    # same doc_ids in a second group → identical hashes across groups
    rows = (
        [("g1", i, 5) for i in ids]
        + [("g1", zid, 0)]
        + [("g2", i, 5) for i in ids]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, ntok long")
    ref = _quota_ref(rows, quota)
    for mode in ("window", "hash"):
        got = {
            (r["source"], r["doc_id"])
            for r in quota_sample(
                df, quota, "source", "doc_id", "ntok", mode, n_buckets=16
            ).collect()
        }
        assert got == ref, f"mode={mode}"
    assert ("g1", zid) in ref, "zero-size row at the exact-tie boundary kept"
    # the tie really is at the bucket edge: every low-bucket doc kept,
    # no sized doc beyond them
    assert all(("g1", i) in ref for b in low for i in by_bucket[b])
    assert not any(("g1", i) in ref for b in buckets[2:] for i in by_bucket[b])


def test_quota_sample_high_cardinality_groups(spark):
    """Group-cardinality independence (VERDICT r6 / ADVICE fix): hash
    mode's bounds computation is a window + aggregate over the
    histogram — nothing collects to the driver — so thousands of
    groups (here: doc_id-derived, the exact accidental-cardinality
    case ADVICE flagged) just work and still match window mode."""
    from pyspark.sql import functions as F

    from slacken_spark.functions.packing import quota_sample

    df = spark.range(20_000).select(
        F.concat(F.lit("g"), (F.col("id") % 5000).cast("string")).alias("source"),
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 + 1).alias("ntok"),
    )
    for mode in ("window", "hash"):
        tot = (
            quota_sample(df, 7, "source", "doc_id", "ntok", mode)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("ntok").alias("tok"))
            .first()
        )
        if mode == "window":
            expect = (tot["n"], tot["tok"])
        else:
            assert (tot["n"], tot["tok"]) == expect


def test_quota_sample_bad_mode_rejected(spark):
    from slacken_spark.functions.packing import quota_sample

    df = spark.createDataFrame([("s", 1, 1)], "source string, doc_id long, ntok long")
    with pytest.raises(ValueError):
        quota_sample(df, 10, mode="sorted")


def test_zero_size_docs_do_not_absorb_overflow(spark):
    # a zero-size doc before an over-budget doc: the recurrence opens a
    # new pack for the overflow row (an acc>0 guard would co-pack them)
    rows = [("s", 0, 0), ("s", 1, BUDGET + 1), ("s", 2, 5)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = {
        r["doc_id"]: r["pack_id"]
        for r in pack_greedy(df, BUDGET).collect()
    }
    assert out == {0: 0, 1: 1, 2: 2}


def test_pack_matches_reference_on_random_sizes_including_zeros(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=150), min_size=1, max_size=40
        )
    )
    def check(sizes):
        rows = [("g", i, int(s)) for i, s in enumerate(sizes)]
        df = spark.createDataFrame(
            rows, "source string, doc_id long, n_tokens long"
        )
        got = {
            r["doc_id"]: r["pack_id"] for r in pack_greedy(df, BUDGET).collect()
        }
        want = dict(enumerate(_ref_pack(sizes)))
        assert got == want

    check()


# ---------------------------------------------------------------------------
# epoch_shuffle: deterministic epoch layout
# ---------------------------------------------------------------------------


def _epoch_model(ids, shards, epoch):
    import hashlib

    def h(i):
        return int(
            hashlib.md5(f"ep{epoch}_{i}".encode()).hexdigest()[:15], 16
        )

    by_shard = {}
    for i in ids:
        by_shard.setdefault(h(i) % shards, []).append(i)
    out = {}
    for s, members in by_shard.items():
        for pos, i in enumerate(sorted(members, key=lambda i: (h(i), i)), 1):
            out[i] = (s, pos)
    return out


def test_epoch_shuffle_matches_model_and_is_dense(spark):
    from slacken_spark.functions.packing import epoch_shuffle

    ids = list(range(200))
    df = spark.range(200).select(F.col("id").alias("doc_id"))
    rows = epoch_shuffle(df, "doc_id", shards=8, epoch=1).collect()
    got = {r["doc_id"]: (r["shard"], r["position"]) for r in rows}
    assert got == _epoch_model(ids, 8, 1)
    # positions are dense 1..n per shard (a loader's stream addresses)
    by_shard = {}
    for s, p in got.values():
        by_shard.setdefault(s, []).append(p)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_epoch_shuffle_reshuffles_across_epochs_not_within(spark):
    from slacken_spark.functions.packing import epoch_shuffle

    df = spark.range(300).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: (r["shard"], r["position"])
         for r in epoch_shuffle(df, "doc_id", 8, epoch=1).collect()}
    b = {r["doc_id"]: (r["shard"], r["position"])
         for r in epoch_shuffle(df, "doc_id", 8, epoch=1).collect()}
    c = {r["doc_id"]: (r["shard"], r["position"])
         for r in epoch_shuffle(df, "doc_id", 8, epoch=2).collect()}
    assert a == b  # resumable: same epoch, same addresses
    assert a != c  # different epoch, different layout
    with pytest.raises(ValueError):
        epoch_shuffle(df, "doc_id", 0)


# ---------------------------------------------------------------------------
# token_blocks: concat-and-chunk plan
# ---------------------------------------------------------------------------


def _block_model(sized, L):
    """Pure-Python concat-and-chunk: sized = [(id, sz)] in id order."""
    out, start = [], 0
    for i, sz in sorted(sized):
        if sz <= 0:
            continue
        for b in range(start // L, (start + sz - 1) // L + 1):
            lo, hi = max(start, b * L), min(start + sz, (b + 1) * L)
            out.append((i, b, lo - start, lo - b * L, hi - lo))
        start += sz
    return set(out)


def _blocks_rows(df):
    return {
        (r["doc_id"], r["block_id"], r["doc_offset"], r["block_offset"],
         r["n_toks"])
        for r in df.collect()
    }


def test_token_blocks_matches_model(spark):
    from slacken_spark.functions.packing import token_blocks

    # deterministic irregular sizes incl. exact-boundary and giant docs
    sized = [(i, (i * 37) % 19 + (250 if i % 41 == 0 else 0)) for i in range(500)]
    sized[7] = (7, 128)  # exactly one block
    sized[13] = (13, 0)  # contributes nothing
    df = spark.createDataFrame(sized, "doc_id long, ntok long")
    got = _blocks_rows(token_blocks(df, 128, buckets=64))
    assert got == _block_model(sized, 128)


def test_token_blocks_invariant_under_bucketing(spark):
    """The two-level distributed prefix sum is an implementation detail:
    any bucket width must produce the identical plan."""
    from slacken_spark.functions.packing import token_blocks

    sized = [(i, (i * 13) % 31 + 1) for i in range(311)]
    df = spark.createDataFrame(sized, "doc_id long, ntok long")
    a = _blocks_rows(token_blocks(df, 64, buckets=1))
    b = _blocks_rows(token_blocks(df, 64, buckets=64))
    c = _blocks_rows(token_blocks(df, 64, buckets=1000))
    assert a == b == c == _block_model(sized, 64)


def test_token_blocks_covers_stream_exactly(spark):
    """Every block except the last is exactly full; per-doc slices
    reassemble the document with no gap or overlap."""
    from slacken_spark.functions.packing import token_blocks

    sized = [(i, (i * 7) % 23 + 1) for i in range(200)]
    df = spark.createDataFrame(sized, "doc_id long, ntok long")
    rows = token_blocks(df, 100).collect()
    total = sum(sz for _, sz in sized)
    per_block = {}
    per_doc = {}
    for r in rows:
        per_block[r["block_id"]] = per_block.get(r["block_id"], 0) + r["n_toks"]
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_offset"], r["n_toks"])
        )
    last = max(per_block)
    for b, n in per_block.items():
        assert n == (100 if b != last else total - 100 * last)
    for i, sz in sized:
        slices = sorted(per_doc[i])
        # contiguous from 0 to sz
        pos = 0
        for off, n in slices:
            assert off == pos
            pos += n
        assert pos == sz
    with pytest.raises(ValueError):
        token_blocks(df, 0)
    with pytest.raises(ValueError):
        token_blocks(df, 100, buckets=0)


def test_token_blocks_handles_hash_derived_ids(spark):
    """Content-addressed corpora have ids spread over the full signed
    int64 range — the case fixed-width id bucketing degenerates on
    (one doc per bucket → corpus-sized totals). Range partitioning by
    sampled boundaries must keep the plan exact there too."""
    import hashlib

    ids = [
        int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big",
                       signed=True)
        for i in range(300)
    ]
    sized = [(i, 5 + abs(i) % 17) for i in ids]
    df = spark.createDataFrame(sized, "doc_id long, ntok long")
    got = _blocks_rows(token_blocks_import()(df, 64, buckets=16))
    assert got == _block_model(sized, 64)


def token_blocks_import():
    from slacken_spark.functions.packing import token_blocks

    return token_blocks


def test_epoch_shuffle_rows_per_shard_derives_count(spark):
    """The count-based sizing contract: shards = ceil(n / target), so
    the expected per-shard sort is bounded whatever the corpus size —
    and a 4x-bigger corpus gets 4x the shards, not 4x-hotter tasks."""
    from slacken_spark.functions.packing import epoch_shuffle

    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    out_s = epoch_shuffle(small, rows_per_shard=40)
    out_b = epoch_shuffle(big, rows_per_shard=40)
    n_s = out_s.select("shard").distinct().count()
    n_b = out_b.select("shard").distinct().count()
    assert n_s <= 3 and n_b <= 10  # ceil(100/40)=3, ceil(400/40)=10
    # hash placement fills every derived shard on these sizes
    assert n_s == 3 and n_b == 10
    # hash balance: no shard grossly exceeds the target (soft bound —
    # the contract is expected size, tested at 3x slack)
    from pyspark.sql import functions as F

    mx = out_b.groupBy("shard").count().agg(F.max("count")).first()[0]
    assert mx <= 3 * 40
    # addresses stay deterministic for the same (epoch, id)
    a = {(r["doc_id"], r["shard"], r["position"]) for r in out_b.collect()}
    b = {
        (r["doc_id"], r["shard"], r["position"])
        for r in epoch_shuffle(big, rows_per_shard=40).collect()
    }
    assert a == b


def test_epoch_shuffle_rejects_bad_rows_per_shard(spark):
    import pytest

    from slacken_spark.functions.packing import epoch_shuffle

    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        epoch_shuffle(df, rows_per_shard=0)


# ---------------- hamilton_allocate ----------------


def _hamilton_model(weights, total):
    """{group: quota} by largest remainder, ties by group key asc."""
    W = sum(weights.values())
    base = {g: total * w // W for g, w in weights.items()}
    rem = {g: total * w % W for g, w in weights.items()}
    surplus = total - sum(base.values())
    order = sorted(weights, key=lambda g: (-rem[g], g))
    for g in order[:surplus]:
        base[g] += 1
    return base


def test_hamilton_allocate_matches_model_and_sums_exactly(spark):
    import numpy as np

    from slacken_spark.functions.packing import hamilton_allocate

    rng = np.random.default_rng(23)
    for trial in range(4):
        n = int(rng.integers(2, 30))
        weights = {
            f"s{i:02d}": int(rng.integers(0, 1000)) for i in range(n)
        }
        if sum(weights.values()) == 0:
            weights["s00"] = 7
        total = int(rng.integers(1, 100_000))
        df = spark.createDataFrame(
            list(weights.items()), "source string, w long"
        )
        got = {
            r["source"]: r["quota"]
            for r in hamilton_allocate(
                df, total, ["source"], "w", buckets=4
            ).collect()
        }
        assert got == _hamilton_model(weights, total), f"trial {trial}"
        assert sum(got.values()) == total


def test_hamilton_allocate_edges(spark):
    import pytest

    from slacken_spark.functions.packing import hamilton_allocate

    df = spark.createDataFrame(
        [("a", 3), ("b", 0), ("c", 1)], "source string, w long"
    )
    # total = 0 -> all zero; zero-weight groups present with quota 0
    got = {
        r["source"]: r["quota"]
        for r in hamilton_allocate(df, 0, ["source"], "w").collect()
    }
    assert got == {"a": 0, "b": 0, "c": 0}
    # a zero-REMAINDER group never receives a surplus unit
    got = {
        r["source"]: r["quota"]
        for r in hamilton_allocate(df, 8, ["source"], "w").collect()
    }
    assert got == {"a": 6, "b": 0, "c": 2}
    with pytest.raises(Exception, match="NULL weight"):
        bad = spark.createDataFrame(
            [("a", 3), ("b", None)], "source string, w long"
        )
        hamilton_allocate(bad, 10, ["source"], "w").collect()
    with pytest.raises(Exception, match="negative weight"):
        bad = spark.createDataFrame(
            [("a", 3), ("b", -1)], "source string, w long"
        )
        hamilton_allocate(bad, 10, ["source"], "w").collect()
    with pytest.raises(Exception, match="sum to zero"):
        zero = spark.createDataFrame(
            [("a", 0), ("b", 0)], "source string, w long"
        )
        hamilton_allocate(zero, 10, ["source"], "w").collect()
    with pytest.raises(ValueError, match="nonnegative"):
        hamilton_allocate(df, -1, ["source"], "w")


def test_hamilton_allocate_rejects_fractional_weights(spark):
    """A double weight column with fractional values used to TRUNCATE
    through cast('long') — 0.3/0.7 collapsed to a confusing 'weights
    sum to zero', 1.9 -> 1 skewed shares silently (r11 advice). The
    exact-integer contract now fails loudly; integral doubles still
    pass (the check is value-level, not type-level)."""
    import pytest

    from slacken_spark.functions.packing import hamilton_allocate

    frac = spark.createDataFrame(
        [("a", 0.3), ("b", 0.7)], "source string, w double"
    )
    with pytest.raises(Exception, match="non-integral weight"):
        hamilton_allocate(frac, 10, ["source"], "w").collect()
    mixed = spark.createDataFrame(
        [("a", 1.9), ("b", 3.0)], "source string, w double"
    )
    with pytest.raises(Exception, match="non-integral weight"):
        hamilton_allocate(mixed, 10, ["source"], "w").collect()
    nan = spark.createDataFrame(
        [("a", float("nan")), ("b", 3.0)], "source string, w double"
    )
    with pytest.raises(Exception, match="non-integral weight"):
        hamilton_allocate(nan, 10, ["source"], "w").collect()
    # integral doubles are fine and allocate exactly like their longs
    ok = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0)], "source string, w double"
    )
    got = {
        r["source"]: r["quota"]
        for r in hamilton_allocate(ok, 8, ["source"], "w").collect()
    }
    assert got == {"a": 6, "b": 2}


def test_hamilton_allocate_null_group_and_composition(spark):
    """A NULL group key is a real group (ranked NULLS FIRST on the
    tie-break, Spark's asc default — an oracle must say NULLS FIRST
    explicitly; DuckDB defaults NULLS LAST), and the output feeds
    quota_sample's per-group dict mode directly."""
    from slacken_spark.functions.packing import (
        hamilton_allocate,
        quota_sample,
    )

    df = spark.createDataFrame(
        [("a", 5), (None, 5)], "source string, w long"
    )
    got = {
        r["source"]: r["quota"]
        for r in hamilton_allocate(df, 5, ["source"], "w").collect()
    }
    assert sum(got.values()) == 5 and set(got) == {"a", None}
    # equal weights, odd total: the surplus unit goes to the NULL
    # group (NULLS FIRST tie-break)
    assert got[None] == 3 and got["a"] == 2

    rows = [(i, "a" if i % 2 else None, 10) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, ntok long")
    quotas = {
        r["source"]: r["quota"]
        for r in hamilton_allocate(
            docs.groupBy("source").agg(
                __import__("pyspark.sql.functions", fromlist=["sum"]).sum(
                    "ntok"
                ).alias("w")
            ),
            100,
            ["source"],
            "w",
        ).collect()
    }
    kept = quota_sample(docs, quotas, "source", "doc_id", "ntok", "window")
    per = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert sum(per.values()) == 10  # 100 tokens / 10 per doc
