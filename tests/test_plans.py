"""Physical-plan assertions (pushdown, pruning, broadcast) and the
classification write → read-back → report round trip."""

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.plans import load_all

REGISTRY = load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _generate_has_semi_join_on(plan: str, key: str) -> bool:
    """True if some Generate (explode) node's SUBTREE contains a
    LeftSemi join whose keys include ``key`` — i.e. the semi-join
    filter executes below the explode. Subtrees are recovered from the
    plan string's tree indentation (children indent deeper; a line at
    the same or shallower depth ends the subtree)."""
    import re

    lines = plan.splitlines()

    def depth(ln: str) -> int:
        m = re.match(r"^[\s:+-]*", ln)
        return len(m.group(0))

    for i, ln in enumerate(lines):
        if "Generate explode" not in ln:
            continue
        d = depth(ln)
        for sub in lines[i + 1 :]:
            if depth(sub) <= d and sub.strip():
                break
            if "LeftSemi" in sub and re.search(
                rf"\[{key}#\d+L?\], \[{key}#\d+L?\]", sub
            ):
                return True
    return False


def test_filter_and_projection_pushdown(spark, sf_dir):
    fn, _ = REGISTRY["scan_filter_project"]
    df = fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1][:400]
    # projection pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema")[1][:500]
    assert "l_comment" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    fn, _ = REGISTRY["star_broadcast_join"]
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4  # all four dims broadcast
    assert "SortMergeJoin" not in plan


def test_semi_anti_use_semi_join_operators(spark, sf_dir):
    fn, _ = REGISTRY["semi_anti_join"]
    plan = _plan(fn(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_classification_write_and_report(spark, tmp_path):
    from slacken_spark.analysis import read_kraken_format
    from slacken_spark.classify import Classifier, ClassifyParams, KrakenReport
    from slacken_spark.index import KeyValueIndex
    from slacken_spark.kernels.minimizers import MinimizerConfig
    from slacken_spark.kernels.taxonomy import ROOT, Taxonomy

    cfg = MinimizerConfig(k=21, m=15, spaces=2)
    rng = np.random.default_rng(5)
    tax = Taxonomy.from_edges([10, 101], [ROOT, 10])
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 2000))
    gdf = spark.createDataFrame([("g", seq)], "header string, nucleotides string")
    ldf = spark.createDataFrame([("g", 101)], "header string, taxon int")
    idx = KeyValueIndex.build(spark, gdf, ldf, tax, cfg, buckets=2)
    reads = spark.createDataFrame(
        [(f"sampleA.read{i}", seq[i * 50 : i * 50 + 150]) for i in range(8)]
        + [(f"sampleB.read{i}", seq[i * 60 : i * 60 + 150]) for i in range(5)],
        "header string, nucleotides string",
    )
    cls = Classifier(idx)
    cpar = ClassifyParams(min_hit_groups=2, sample_regex=r"^(sample[AB])\.")
    out = cls.classify(reads, cpar)
    loc = str(tmp_path / "cls_out")
    cls.write_output(out, loc, cpar)
    # per-sample partition dirs with gzip text
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(loc, "sample=*"))
    )
    assert dirs == ["sample=sampleA", "sample=sampleB"]
    assert glob.glob(os.path.join(loc, "sample=sampleA", "*.gz"))
    # read-back (S12) and per-taxon report
    back = read_kraken_format(spark, os.path.join(loc, "sample=sampleA"))
    counts = [
        (r["taxon"], r["n"])
        for r in back.groupBy("taxon").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    rep = KrakenReport(tax, counts)
    lines = rep.lines()
    assert any("\t101\t" in l for l in lines)
    # clade rollup: root clade total == classified reads of sample A
    root_line = [l for l in lines if l.split("\t")[4] == "1"][0]
    assert int(root_line.split("\t")[1]) == sum(
        c for t, c in counts if t != 0
    )


def test_asof_join_directions(spark):
    """Backward takes the latest right <= left_ts; forward the earliest
    right >= left_ts; equal timestamps match in both directions with
    deterministic tie-breaks (backward: max right tuple; forward: min)."""
    from slacken_spark.operators.relational_ext import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (2, 5, "c")], "k int, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 10, 101), (1, 20, 102), (2, 7, 103)],
        "k int, rts int, val int",
    )
    back = {
        r["tag"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rts", "val"],
        ).collect()
    }
    assert back == {"a": 101, "b": 102, "c": None}  # tie at 10 → max val
    fwd = {
        r["tag"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rts", "val"], direction="forward",
        ).collect()
    }
    assert fwd == {"a": 100, "b": None, "c": 103}  # tie at 10 → min val


def test_global_row_number_and_ntile_match_window_forms(spark):
    """global_row_number / global_ntile (two-level range-partitioned
    prefix count — the scale path) must equal the single-task window
    forms exactly, for any bucket count (output is bucketing-invariant)
    and at the n < k / n % k != 0 edges of SQL ntile semantics."""
    import numpy as np
    from pyspark.sql import Window

    from slacken_spark.operators.relational_ext import (
        global_ntile,
        global_row_number,
    )

    rng = np.random.default_rng(99)
    rows = [
        (int(i), int(v))
        for i, v in enumerate(rng.integers(0, 40, 101))  # heavy ties in v
    ]
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("v", "id")
    want_rank = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    for buckets in (1, 4, 32, 200):  # incl. more buckets than rows
        got = {
            r["id"]: r["rank"]
            for r in global_row_number(df, ["v", "id"], buckets).collect()
        }
        assert got == want_rank, f"buckets={buckets}"
    for k in (4, 7, 101, 500):  # 101 % 4 == 1; k > n degenerates
        want_tile = {
            r["id"]: r["t"]
            for r in df.withColumn("t", F.ntile(k).over(w)).collect()
        }
        got = {
            r["id"]: r["tile"]
            for r in global_ntile(df, k, ["v", "id"], buckets=8).collect()
        }
        assert got == want_tile, f"k={k}"
    # plan pin: the corpus-sized window is partitioned by the range
    # bucket; the ONLY partition-less window runs over the per-bucket
    # totals (`buckets` rows), never the input
    plan = global_row_number(df, ["v", "id"], 8)._jdf.queryExecution().optimizedPlan().toString()
    wins = [l for l in plan.splitlines() if "windowspecdefinition" in l]
    corpus = [l for l in wins if "row_number" in l]
    assert corpus and all("_bkt" in l.split("windowspecdefinition")[1][:30] for l in corpus)


def test_grouped_exact_quantiles_matches_percentile_agg(spark):
    """grouped_exact_quantiles (two-pass rank interpolation — the
    scale path) must reproduce Spark's exact `percentile` aggregate
    bitwise: grouped data with ties, group sizes 1..N, boundary
    percentiles, nulls ignored, any bucket count."""
    import numpy as np

    from slacken_spark.operators.relational_ext import (
        grouped_exact_quantiles,
    )

    rng = np.random.default_rng(7)
    rows = []
    for g, size in (("a", 1), ("b", 2), ("c", 97), ("d", 400)):
        for v in rng.integers(0, 50, size):
            rows.append((g, float(v) / 3.0))
    rows += [("const", 7.5)] * 60  # every rank ties — q == 7.5 at all p
    rows.append(("c", None))  # ignored by both forms
    df = spark.createDataFrame(rows, "g string, v double")
    ps = [0.0, 0.5, 0.9, 0.99, 1.0]
    want = {
        r["g"]: [r[f"q{i}"] for i in range(len(ps))]
        for r in df.groupBy("g")
        .agg(
            *[
                F.percentile("v", F.lit(p)).alias(f"q{i}")
                for i, p in enumerate(ps)
            ]
        )
        .collect()
    }
    rows.append(("allnull", None))  # group with ONLY nulls must survive
    df = spark.createDataFrame(rows, "g string, v double")
    for buckets in (1, 8, 64):
        got = {}
        for r in grouped_exact_quantiles(df, ["g"], "v", ps, buckets).collect():
            got.setdefault(r["g"], {})[r["p"]] = (r["q"], r["n"])
        for g, qs in want.items():
            for i, p in enumerate(ps):
                assert got[g][p][0] == qs[i], (g, p, buckets)
        assert got["c"][0.5][1] == 97  # null excluded from n
        # all-null group: present at every percentile, q null, n 0 —
        # same shape the percentile aggregate emits
        assert set(got["allnull"]) == set(ps)
        assert all(v == (None, 0) for v in got["allnull"].values())
    import pytest

    with pytest.raises(ValueError, match=r"percentiles"):
        grouped_exact_quantiles(df, ["g"], "v", [1.5])
    with pytest.raises(ValueError, match=r"reserved"):
        grouped_exact_quantiles(df.withColumn("p", F.lit(1)), ["g"], "v", [0.5])


def test_two_level_rank_branches_share_one_checkpointed_exchange(
    spark, sf_dir
):
    """LOAD-BEARING: global_row_number's two branches (local window and
    per-bucket totals) must agree on bucket membership — `_bkt` is
    spark_partition_id() of the range exchange. Through r10 this
    leaned on runtime exchange/stage reuse; r11's scale probes showed
    that reuse SILENTLY fails in composed plans (one extra broadcast
    branch over the same lineage sufficed), letting the branches
    sample range boundaries independently — nondeterministically wrong
    ranks. The ranged rows are now pinned by a lazy localCheckpoint:
    the executed plan must show ZERO live rangepartitioning exchanges
    (the one exchange is frozen inside the checkpointed RDD both
    branches scan)."""
    from slacken_spark.operators.relational_ext import (
        grouped_exact_quantiles,
    )
    from slacken_spark.plans.catalog import t

    df = t(spark, sf_dir, "events").select("event_type", "value")
    r = grouped_exact_quantiles(df, ["event_type"], "value", [0.5, 0.9])
    r.collect()
    plan = r._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert "Exchange rangepartitioning" not in final, final
    assert "ExistingRDD" in final or "Scan ExistingRDD" in plan, final


def test_global_row_number_exact_under_any_exchange_reuse_setting(spark):
    """With the checkpoint pin, correctness no longer depends on
    spark.sql.exchange.reuse (the r10 guard rejected reuse=false; the
    r11 fix makes the setting irrelevant) — ranks must be exact under
    both values."""
    from slacken_spark.operators.relational_ext import global_row_number

    df = spark.range(2000).select(
        F.col("id"), F.pmod(F.hash("id"), 50).alias("v")
    )
    want = {
        r["id"]: i + 1
        for i, r in enumerate(
            sorted(df.collect(), key=lambda r: (r["v"], r["id"]))
        )
    }
    key = "spark.sql.exchange.reuse"
    prev = spark.conf.get(key, "true")
    try:
        for setting in ("true", "false"):
            spark.conf.set(key, setting)
            got = {
                r["id"]: r["rank"]
                for r in global_row_number(df, ["v", "id"], 8).collect()
            }
            assert got == want, f"reuse={setting}"
    finally:
        spark.conf.set(key, prev)


def test_hamilton_composition_regression_100k(spark):
    """The r11 finding's reproducer: hamilton_allocate attaches a
    broadcast surplus branch over the same lineage as the rank input —
    the exact composition where runtime exchange reuse silently failed
    and the quota sum drifted nondeterministically (observed +1751 /
    −248 / +379 at 100k-1M groups). With the checkpointed exchange the
    sum is EXACT at 100k groups, every run."""
    from slacken_spark.functions.packing import hamilton_allocate

    n, total = 100_000, 777_777_777
    w = spark.range(n).select(
        F.concat(F.lit("g"), F.col("id")).alias("g"),
        (
            F.pmod(F.hash("id"), 1000)
            + (F.col("id") % 7 == 0).cast("long") * 50_000
        ).alias("w"),
    )
    out = hamilton_allocate(w, total, ["g"], "w", buckets=64)
    row = out.agg(
        F.sum("quota").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert row["n"] == n
    assert row["s"] == total, f"quota sum {row['s']} != {total}"


def test_grouped_topk_matches_window_form(spark):
    """grouped_topk (salted two-level top-k — the scale path for few
    huge groups) must equal the plain partitioned window + rank<=k
    filter exactly: heavy value ties, groups smaller than k, k=1, any
    salt bucket count."""
    import numpy as np

    from slacken_spark.operators.relational_ext import grouped_topk
    from pyspark.sql import Window

    rng = np.random.default_rng(11)
    rows = [
        (f"g{int(i) % 3}", int(i), float(v))
        for i, v in enumerate(rng.integers(0, 8, 500))  # dense ties
    ]
    rows += [("tiny", 9001, 5.0)]  # group smaller than k
    df = spark.createDataFrame(rows, "g string, id long, v double")
    for k in (1, 3, 10):
        w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
        want = sorted(
            (r["g"], r["id"], r["rnk"])
            for r in df.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= k)
            .collect()
        )
        for salt in (1, 4, 64):
            got = sorted(
                (r["g"], r["id"], r["rank"])
                for r in grouped_topk(
                    df, ["g"], [("v", False), ("id", True)], k, salt
                ).collect()
            )
            assert got == want, (k, salt)


def test_connected_components_chain_and_singleton(spark):
    """Min-label propagation: a 5-node chain (worst case for label
    hopping — pointer jumping must collapse it), a triangle, and an
    isolated pair all resolve to min-id components within max_iter."""
    from slacken_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),  # chain
         (10, 11), (11, 12), (10, 12),    # triangle
         (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # longer chain, tight iteration budget: pointer jumping gives
    # O(log n) rounds, so 64 nodes must converge well under 10 rounds
    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "id_a long, id_b long"
    )
    got2 = {
        r["node"]: r["component"]
        for r in connected_components(long_chain, max_iter=10).collect()
    }
    assert set(got2.values()) == {1}


def test_connected_components_random_graphs_match_union_find(spark):
    """Randomized differential: the distributed label propagation must
    equal a naive union-find on arbitrary graphs (not just the cliquish
    LSH shape)."""
    import numpy as np

    rng = np.random.default_rng(4242)
    from slacken_spark.functions.dedup import connected_components

    for trial in range(3):
        n = 60
        m = int(rng.integers(20, 80))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        nodes = {x for e in edges for x in e}
        for x in nodes:
            expected[x] = find(x)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["node"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert got == expected, f"trial {trial} mismatch"


def test_round4_map_only_queries_have_no_exchange(spark, sf_dir):
    """doc_pii_redact and doc_chunks are map-only by design (codegen'd
    regex / explode+slice): any Exchange in their plans is a
    regression; both scans must prune to (doc_id, text)."""
    import re as _re

    for name in ("doc_pii_redact", "doc_chunks"):
        fn, _ = REGISTRY[name]
        plan = _plan(fn(spark, sf_dir))
        assert not _re.search(r"Exchange hashpartitioning", plan), name
        read_schema = plan.split("ReadSchema")[1][:300]
        assert "text" in read_schema and "lang" not in read_schema, name


def test_round4_single_shuffle_queries(spark, sf_dir):
    """vocab/pack/split shuffle exactly once (term agg / group packing /
    stratum agg) — partial aggregation handles the rest map-side."""
    import re as _re

    for name, max_ex in (
        # exact count_distinct(doc_id) is inherently two-phase:
        # dedup-shuffle on (term, doc_id), then count-shuffle on term
        ("doc_vocab_top50", 2),
        ("pack_sequences", 1),
        ("dataset_split_counts", 1),
    ):
        fn, _ = REGISTRY[name]
        plan = _plan(fn(spark, sf_dir))
        n = len(_re.findall(r"Exchange hashpartitioning", plan))
        assert n <= max_ex, f"{name}: {n} exchanges"


def test_connected_components_large_graph_log_rounds(spark):
    """Scale stress: a 100k-node chain (diameter 10^5) plus
    exponentially-skewed star components must reach fixpoint within
    ~2·log2(n) rounds — pointer jumping collapses the chain
    logarithmically, where plain min-label propagation would need 10^5
    rounds (the max_iter=24 budget is the proof: no fixpoint warning may
    fire)."""
    import warnings

    from pyspark.sql import functions as F

    from slacken_spark.functions.dedup import connected_components

    n = 100_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # star j has 2^j spokes (heavy-tailed component sizes); hub ids sit
    # below their spokes so the expected label is the hub
    stars = spark.range(16_000).select(
        (F.lit(200_000) + F.floor(F.log2(F.col("id") + 2))).alias("id_a"),
        (F.lit(300_000) + F.col("id")).alias("id_b"),
    )
    pairs = chain.unionByName(stars)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        comp = connected_components(
            pairs, max_iter=24, loop_partitions=8
        ).persist()
        n_rows = comp.count()
    assert not [w for w in caught if "no fixpoint" in str(w.message)], (
        "chain did not collapse within the O(log d) round budget"
    )
    assert n_rows == n + 16_000 + 13  # chain + spokes + hubs (log2 ∈ 1..13)
    # every chain node labels to 0
    assert comp.where((F.col("node") < n) & (F.col("component") != 0)).count() == 0
    # every spoke labels to its hub
    bad = comp.where(
        (F.col("node") >= 300_000)
        & (F.col("component")
           != F.lit(200_000) + F.floor(F.log2(F.col("node") - 300_000 + 2)))
    ).count()
    assert bad == 0
    comp.unpersist()


def test_round5_plan_shapes(spark, sf_dir):
    """Round-5 shuffle budgets: sharded packing shuffles once for the
    ntile window and once for the (source, shard) pack groups; nprobe=2
    IVF keeps the corpus side shuffle-free (broadcast query fan-out +
    one window shuffle for the per-query top-k)."""
    import re as _re

    fn, _ = REGISTRY["pack_sequences_sharded"]
    plan = _plan(fn(spark, sf_dir))
    n = len(_re.findall(r"Exchange hashpartitioning", plan))
    assert n <= 2, f"pack_sequences_sharded: {n} exchanges"

    fn, _ = REGISTRY["embedding_ivf_topk_nprobe2"]
    plan = _plan(fn(spark, sf_dir))
    n = len(_re.findall(r"Exchange hashpartitioning", plan))
    assert n <= 1, f"embedding_ivf_topk_nprobe2: {n} corpus-side exchanges"
    assert "BroadcastExchange" in plan, "query fan-out must broadcast"


def test_round5_new_query_plan_shapes(spark, sf_dir):
    """Round-5 additions: random projection is pure map (zero
    exchanges); rolling stats is ONE user_id exchange + one Window node
    (all three window functions share the (partition, order) spec);
    bloom probe joins are broadcast (the bitmap is constant-size)."""
    import re as _re

    fn, _ = REGISTRY["embedding_random_projection"]
    plan = _plan(fn(spark, sf_dir))
    assert not _re.search(r"Exchange hashpartitioning", plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["events_rolling_stats"]
    plan = _plan(fn(spark, sf_dir))
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(_re.findall(r"\bWindow\b", plan)) == 1

    fn, _ = REGISTRY["doc_bloom_decontaminate"]
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, "bloom probes must broadcast"


def test_late_round5_query_plan_shapes(spark, sf_dir):
    """Late round-5 additions: the shard manifest is map-only assignment
    + ONE aggregation shuffle; tfidf broadcasts the vocabulary-sized df
    side back onto tf (no third key-shuffle for the join); BPE pair
    counting is explode + partial-agg (no Python in the oracle-backed
    pair path)."""
    import re as _re

    fn, _ = REGISTRY["dataset_shard_manifest"]
    plan = _plan(fn(spark, sf_dir))
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["tfidf_top_terms"]
    plan = _plan(fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "df side must broadcast onto tf"
    assert "SortMergeJoin" not in plan

    fn, _ = REGISTRY["bpe_top_pairs"]
    plan = _plan(fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_layout_and_upsert_plan_shapes(spark, sf_dir):
    """events_zorder_layout: codegen'd integer interleave + ONE rollup
    shuffle; corpus_upsert_latest: union + ONE doc_id window shuffle;
    inverted_index_digest: distinct + term agg (≤2 shuffles), no Python
    anywhere."""
    import re as _re

    fn, _ = REGISTRY["events_zorder_layout"]
    plan = _plan(fn(spark, sf_dir))
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["corpus_upsert_latest"]
    plan = _plan(fn(spark, sf_dir))
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Union" in plan

    fn, _ = REGISTRY["inverted_index_digest"]
    plan = _plan(fn(spark, sf_dir))
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sessionize_subsecond_gap_boundary(spark):
    """Gap semantics at microsecond precision: a true gap of
    1800.000001 s splits, 1800.000000 s and 1799.999999 s merge — a
    whole-second truncation would merge all three (the engine/oracle
    divergence caught in the round-5 review)."""
    import datetime as dt

    from slacken_spark.operators.relational_ext import sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0, 500000)
    rows = [
        (1, base), (1, base + dt.timedelta(microseconds=1_800_000_001)),
        (2, base), (2, base + dt.timedelta(microseconds=1_800_000_000)),
        (3, base), (3, base + dt.timedelta(microseconds=1_799_999_999)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = (
        sessionize(df, "user_id", "ts", 1800)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("last_sess"))
        .collect()
    )
    got = {r["user_id"]: r["last_sess"] for r in out}
    assert got == {1: 1, 2: 0, 3: 0}


def test_quota_hash_mode_bulk_branch_has_no_sort(spark, sf_dir):
    """The hash-threshold quota path: the bulk branch (whole buckets
    below the boundary) must reach the output through a broadcast join
    with NO Sort/Window — only the boundary-bucket branch (~1/4096 of a
    source) may window. The per-source histogram boundary arrives
    broadcast."""
    import re as _re

    fn, _ = REGISTRY["source_quota_sample_hash"]
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, "bounds must broadcast to both branches"
    assert "SortMergeJoin" not in plan
    # exactly TWO Sorts, distinguished by their keys — NEITHER touches
    # raw corpus rows in bulk: the histogram prefix-sum sorts by bucket
    # (n_groups × n_buckets AGGREGATED rows, corpus-size independent)
    # and the boundary window sorts by hash (~1/n_buckets of a group).
    # The whole-bucket branch reaches the output with no Sort at all.
    sorts = _re.findall(r"\bSort \[([^\]]*)\]", plan)
    assert sum("_h#" in s for s in sorts) == 1, "one boundary-bucket window sort"
    # every other Sort is the histogram prefix-sum, keyed on the bucket —
    # it sorts n_groups × n_buckets AGGREGATED rows, corpus-size
    # independent (the subtree prints once per consuming branch in the
    # pre-AQE string; runtime reuses the broadcast exchange)
    assert all("_h#" in s or "_bkt" in s for s in sorts), sorts
    assert len(sorts) <= 3
    assert "< _boundary" in plan, "bulk branch must filter _bkt < _boundary"
    # Catalyst folds the edge branch's _bkt = _boundary equality into the
    # broadcast join's keys — assert _boundary participates as a join key
    assert _re.search(r"BroadcastHashJoin \[[^\]]*_bkt[^\]]*\], \[[^\]]*_boundary", plan)


def test_late_round6_query_plan_shapes(spark, sf_dir):
    """Late round-6 additions: the delta index rebuild must join the
    affected-pair set BEFORE aggregating (no full-index reduction, no
    cartesian, no Python eval); temperature mixing reuses the quota
    hash path (exactly one Window — the boundary bucket — and
    broadcast bounds)."""
    import re as _re

    fn, _ = REGISTRY["inverted_index_delta"]
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the rebuild aggregation's input is the affected-pair join; the
    # changed-doc swap is an anti-join on update ids, and tombstones
    # come from ONE left outer join of the affected pairs onto the
    # aggregation (a union + anti-join would evaluate the pruned-corpus
    # subplan twice)
    assert plan.count("Join") >= 2
    assert "LeftAnti" in plan, "changed docs swap out via an anti-join"
    assert "LeftOuter" in plan, "tombstones come from one left join"
    # THE incremental claim (VERDICT r6 item 1): the corpus branch must
    # prune to affected segments BELOW the tokenize/explode — some
    # Generate(explode) node has a LeftSemi join ON SEGMENT in its
    # subtree, so untouched segments' rows are never tokenized
    assert _generate_has_semi_join_on(plan, "segment"), (
        "corpus explode must sit above a broadcast segment semi-join"
    )

    fn, _ = REGISTRY["source_temperature_mix"]
    plan = _plan(fn(spark, sf_dir))
    sorts = _re.findall(r"\bSort \[([^\]]*)\]", plan)
    assert sum("_h#" in s for s in sorts) == 1, "one boundary-bucket window sort"
    assert all("_h#" in s or "_bkt" in s for s in sorts), sorts
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_lsh_delta_prunes_shuffle_to_affected_buckets(spark, sf_dir):
    """embedding_lsh_delta: the per-bucket collect_list aggregation must
    sit ABOVE a broadcast LeftSemi join on bucket (only affected
    buckets' rows shuffle), tombstones come from one LeftOuter join,
    and nothing sort-merges."""
    fn, _ = REGISTRY["embedding_lsh_delta"]
    plan = _plan(fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "LeftSemi" in plan, "affected-bucket semi-join must prune the shuffle"
    assert "LeftOuter" in plan, "tombstones come from one left join"
    assert "CartesianProduct" not in plan


def test_ann_retrieve_docs_broadcasts_hits(spark, sf_dir):
    """Candidate hydration must broadcast the (queries × k) hit list
    onto the documents scan — a SortMergeJoin here would shuffle the
    whole corpus to fetch 30 rows of metadata."""
    fn, _ = REGISTRY["ann_retrieve_docs"]
    plan = _plan(fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_json_extract_tolerates_malformed_props(spark):
    """from_json turns malformed/missing JSON into NULLs that the
    filter drops — a bad row must never fail the job."""
    rows = [
        (1, "a", '{"k": 5}'),
        (2, "a", "not json"),
        (3, "a", "{}"),
        (4, "b", '{"k": 7}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    parsed = df.select(
        "event_type", F.from_json("props", "k long").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    got = {
        r["event_type"]: r["n"]
        for r in parsed.where(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {"a": 1, "b": 1}


def test_approx_distinct_bounds_and_determinism(spark, sf_dir):
    """HLL++ sketch counts stay within a tight error of exact (tighter
    than the catalog's loose within_bound flag), and repeat runs produce
    identical rows (deterministic sketch)."""
    fn, _ = REGISTRY["events_approx_distinct"]
    rows = {r["event_type"]: r.asDict() for r in fn(spark, sf_dir).collect()}
    assert rows, "no groups returned"
    for et, r in rows.items():
        assert r["within_bound"], f"{et}: sketch outside the loose bound"
    # tight 3σ-grade check on the raw sketch values (not part of the
    # oracle-hashed output shape)
    from slacken_spark.plans.catalog import t as _t

    raw = {
        r["event_type"]: r.asDict()
        for r in _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .collect()
    }
    for et, r in raw.items():
        rel = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel <= 0.05, f"{et}: {r['approx_users']} vs {r['exact_users']}"
    again = {r["event_type"]: r.asDict() for r in fn(spark, sf_dir).collect()}
    assert rows == again


def test_late_round7_query_plan_shapes(spark, sf_dir):
    """Late round-7 additions. Compaction's scale claim is what its
    plan NEVER contains: applied to a stored index it must not explode
    posting lists (they move whole) and must pay exactly one shuffle.
    The block plan's prefix sum must be two windows — the per-bucket
    one partitioned (parallel over the corpus) and only the
    bucket-TOTALS one global — with the offsets broadcast back. The
    epoch shuffle is one exchange on the shard key."""
    import re as _re

    from slacken_spark.functions.inverted import compact_segments

    # compact_segments over an already-stored index (no corpus lineage)
    idx = spark.createDataFrame(
        [("t", s, 2, [s * 10, s * 10 + 1]) for s in range(8)],
        "term string, segment long, df_segment long, postings array<long>",
    )
    plan = _plan(compact_segments(idx, 4))
    assert "Generate" not in plan, "posting lists must move whole, not explode"
    assert plan.count("Exchange") == 1, "one key-shuffle on (term, coarse segment)"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["token_block_plan"]
    plan = _plan(fn(spark, sf_dir))
    windows = [ln for ln in plan.splitlines() if _re.search(r"\bWindow\b", ln)]
    assert len(windows) == 2, windows
    # Window [exprs], [partitionSpec], [orderSpec] — the per-row window
    # partitions by the bucket; the totals window has no partition spec
    partitioned = [w for w in windows if _re.search(r"\], \[_bkt#\d+L?\], \[", w)]
    assert len(partitioned) == 1, "per-row cumsum window must partition by bucket"
    assert plan.count("BroadcastHashJoin") >= 1, "bucket offsets broadcast back"
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["epoch_shuffle_plan"]
    plan = _plan(fn(spark, sf_dir))
    assert len(_re.findall(r"Exchange hashpartitioning\(shard#", plan)) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["dedup_keep_longest"]
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["doc_heavy_hitters_cms"]
    df = fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, "grid probes are map-side"
    assert "SortMergeJoin" not in plan
    # CMS is two-pass, not depth+1-pass: the lazily-checkpointed grid
    # replaces the sketch subplan with one shared RDD at CONSTRUCTION
    # time, so even the pre-action plan carries exactly one corpus
    # tokenize/shingle (the probe side) — the three broadcast sides are
    # grid-sized ExistingRDD scans
    assert plan.count("hashpartitioning(doc_id") == 1, (
        "grid must be shared across broadcast sides, not re-derived"
    )

    fn, _ = REGISTRY["source_stats_maintain"]
    plan = _plan(fn(spark, sf_dir))
    assert "LeftSemi" in plan, "old rows fetch by a semi-join on changed ids"
    assert "FullOuter" in plan, "view merges the batch delta via one full-outer"
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_session7c_query_plan_shapes(spark, sf_dir):
    """Continuation-session additions: funnel is ONE conditional-agg
    shuffle (no joins, no windows); the LM count table broadcasts its
    vocabulary-sized continuation side; PageRank shares the
    checkpointed edge list across rounds instead of re-deriving the
    shingle lineage per reference."""
    fn, _ = REGISTRY["funnel_conversion"]
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("Exchange") == 1, "funnel is a single user_id shuffle"
    assert "Join" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["ngram_lm_counts"]
    df = fn(spark, sf_dir)
    # size-based broadcast, never a forced hint: the continuation
    # table is vocabulary-sized and grows with an open-vocabulary
    # corpus (r11 advice — an unconditional hint OOMs where the
    # unhinted join degrades to a shuffle)
    assert "ResolvedHint" not in df._jdf.queryExecution().analyzed().toString()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, "continuation counts broadcast back"
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["dedup_graph_pagerank"]
    plan = _plan(fn(spark, sf_dir))
    # lazy localCheckpoint truncation: the unrolled 3-round plan reads
    # the edge/degree tables as shared ExistingRDD scans — the corpus
    # shingle lineage (posexplode Generate) must appear in ZERO branches
    # of the returned plan, and rank joins on node-sized sides broadcast
    assert "Generate" not in plan, "edge list must be checkpointed, not re-derived"
    assert "ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_tie_and_null_semantics(spark):
    """Ties do NOT convert (strictly-greater at µs precision) and a
    missing later step caps `reached` through NULL comparison rules."""
    from pyspark.sql import functions as F

    rows = [
        # user 1: view then click at the SAME µs → tie, no step 2
        (1, "view", "2024-01-01 00:00:00.000001"),
        (1, "click", "2024-01-01 00:00:00.000001"),
        # user 2: +1 µs click, purchase BEFORE the click → reached 2
        (2, "view", "2024-01-01 00:00:00.000001"),
        (2, "click", "2024-01-01 00:00:00.000002"),
        (2, "purchase", "2024-01-01 00:00:00.000001"),
        # user 3: full ordered funnel one µs apart → reached 3
        (3, "view", "2024-01-01 00:00:00.000001"),
        (3, "click", "2024-01-01 00:00:00.000002"),
        (3, "purchase", "2024-01-01 00:00:00.000003"),
        # user 4: no view at all → not in the funnel
        (4, "click", "2024-01-01 00:00:00.000001"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
    f = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("tv"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("tc"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    out = f.where(F.col("tv").isNotNull()).select(
        "user_id",
        F.when((F.col("tc") > F.col("tv")) & (F.col("tp") > F.col("tc")), 3)
        .when(F.col("tc") > F.col("tv"), 2)
        .otherwise(1)
        .cast("long")
        .alias("reached"),
    )
    got = {r["user_id"]: r["reached"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_quantile_sketch_and_retention_plan_shapes(spark, sf_dir):
    """The histogram sketch charges the corpus exactly ONE exchange
    (the (grp, bin) partial-agg shuffle); the cumulative/total windows
    and the read-off touch only sketch-sized rows (grp-keyed second
    exchange). Retention is user-keyed throughout — no cartesian, no
    Python, and the rollup shuffles only already-distinct activity
    rows."""
    import re as _re

    fn, _ = REGISTRY["value_quantile_sketch"]
    plan = _plan(fn(spark, sf_dir))
    assert plan.count("Exchange") == 2, "corpus pays one shuffle; sketch one more"
    assert "hashpartitioning(grp, bin" in plan.replace("#6", "").replace(
        "#9L", ""
    ) or _re.search(r"hashpartitioning\(grp#\d+, bin#\d+L", plan)
    assert len(_re.findall(r"\bWindow\b", plan)) == 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    fn, _ = REGISTRY["retention_cohorts"]
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert _re.search(r"hashpartitioning\(user_id#\d+L, day#\d+L", plan), (
        "activity distinct is (user, day)-keyed"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_retention_day_index_is_session_tz_free(spark):
    """Review catch: an LTZ-cast epoch literal is interpreted in the
    caller's session timezone, shifting every day boundary. The fixed
    expressions must give the UTC day index under ANY session tz, for
    both timestamp encodings."""
    from pyspark.sql import functions as F

    prev = spark.conf.get("spark.sql.session.timeZone", None)
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # 1970-01-02 03:00 UTC = epoch 97200 s → UTC day 1 (a -5h zone
        # read of an epoch literal would call it day 0)
        us = 97_200 * 1_000_000
        ltz = spark.createDataFrame([(us,)], "u long").select(
            F.timestamp_micros(F.col("u")).alias("ts")
        )
        assert dict(ltz.dtypes)["ts"] == "timestamp"
        [r] = ltz.select(
            F.expr("unix_micros(ts) div 86400000000").alias("d")
        ).collect()
        assert r["d"] == 1
        ntz = spark.createDataFrame(
            [("1970-01-02 03:00:00",)], "s string"
        ).select(F.col("s").cast("timestamp_ntz").alias("ts"))
        [r] = ntz.select(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " CAST('1970-01-01 00:00:00' AS timestamp_ntz), ts)"
                " div 86400000000"
            ).alias("d")
        ).collect()
        assert r["d"] == 1
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.session.timeZone")
        else:
            spark.conf.set("spark.sql.session.timeZone", prev)


def test_round8_query_plan_shapes(spark, sf_dir):
    """Round-8 additions: the RANKED delta must carry the boolean
    delta's incremental plan shape verbatim (segment semi-join BELOW
    the corpus explode, anti-join doc swap, one left-outer tombstone
    join, no Python eval); the component drop path must broadcast the
    affected-component set and keep the passthrough an anti-join."""
    # the catalog entry returns the APPLIED patch (the delta sits
    # checkpointed behind a Scan ExistingRDD there), so the raw delta's
    # shape is asserted on the function itself, over the same fixture
    from slacken_spark.functions.inverted import delta_scored_index
    from slacken_spark.plans.catalog import tp
    from slacken_spark.plans.catalog_docs_pipeline import _cdc_upd

    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    delta = delta_scored_index(
        docs, _cdc_upd(docs), F.split(F.col("text"), " "), "doc_id", 10
    )
    plan = _plan(delta)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "LeftAnti" in plan, "changed docs swap out via an anti-join"
    assert "LeftOuter" in plan, "tombstones come from one left join"
    assert _generate_has_semi_join_on(plan, "segment"), (
        "corpus explode must sit above a broadcast segment semi-join"
    )

    fn, _ = REGISTRY["dedup_components_drop"]
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # unaffected components pass through via an anti-join against the
    # BROADCAST affected set; the recomputed branch reads the loop's
    # checkpointed labels (ExistingRDD), never re-deriving the corpus
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "Scan ExistingRDD" in plan


def test_contract_round_budget_is_partition_span_not_diameter(spark):
    """The contraction propagation's round budget is driven by how the
    edges are PARTITIONED, not by the graph's diameter: a diameter-2000
    chain collapses in ONE round when its edges sit in one partition
    (max_iter=1, the no-fixpoint warning is the detector), and within a
    4-round budget when genuinely scattered over 16 partitions (the
    stall-triggered pointer-doubling closure; min-label propagation
    would need ~d rounds). AQE partition coalescing is disabled for the
    scattered cases — the internal ``.distinct()`` discards the
    caller's partitioning, and with coalescing on every case collapses
    to the single-partition 1-round path (the r8 review's vacuity
    finding); the max_iter=1 warning assertion pins that the 16-way
    scatter really does leave cross-partition work after one round."""
    import warnings

    from pyspark.sql import functions as F

    from slacken_spark.functions.dedup import connected_components_contract

    n = 2_000
    # NOT spark.range: range-derived columns carry provable distinct
    # keys, so Catalyst ELIMINATES the contraction's internal
    # .distinct() — no shuffle, loop_partitions never applies, and the
    # "scatter" silently keeps the range's contiguous partitions.
    # createDataFrame has no distinct-key metadata, so the distinct
    # genuinely hash-shuffles to loop_partitions partitions.
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )

    def run(loop_parts, budget):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            comp = connected_components_contract(
                chain, max_iter=budget, loop_partitions=loop_parts
            ).persist()
            rows = comp.count()
        warned = bool(
            [w for w in caught if "no fixpoint" in str(w.message)]
        )
        assert rows == n
        off = comp.where(F.col("component") != 0).count()
        comp.unpersist()
        return warned, off

    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        # scattered + 1-round budget: cross-partition work MUST remain
        # (labels are then an upper-bound partition — off-label nodes
        # exist), proving the scatter is real, not coalesced away
        warned, off = run(16, 1)
        assert warned and off > 0, (
            "16-way scatter converged in one round — the scatter is"
            " not reaching the loop (vacuous test)"
        )
        # scattered + closure: full convergence within 4 rounds
        warned, off = run(16, 4)
        assert not warned and off == 0, (
            "scattered chain blew the 4-round budget"
        )
    finally:
        spark.conf.set(coalesce_key, prev)
    # one partition: ONE round regardless of the 2000 diameter
    warned, off = run(1, 1)
    assert not warned and off == 0, (
        "single-partition chain should collapse in one round"
    )


def test_oracle_surgery_raises_on_no_op_replace():
    """The drop-components oracle is built by textual surgery on the
    shared closure CTE; a whitespace drift there must fail at import
    time, not silently revert the oracle to the pre-drop closure
    (r8 advice)."""
    import pytest

    from slacken_spark.plans.catalog_docs_dedup import (
        _COMPONENTS_DROP_SQL,
        _must_replace,
    )

    with pytest.raises(ValueError, match="matched 0 sites"):
        _must_replace("SELECT 1", "no such text", "x")
    # a MULTI-site match must raise too — it would surger places the
    # author never saw (r9 review)
    with pytest.raises(ValueError, match="matched 2 sites"):
        _must_replace("a b a", "a", "x")
    # the real surgery DID engage: both edits are present
    assert "surv AS" in _COMPONENTS_DROP_SQL
    assert "FROM surv" in _COMPONENTS_DROP_SQL


def test_no_catalog_entry_uses_row_at_a_time_python(spark, sf_dir):
    """Catalog-WIDE structural guard (r9): no entry's optimized plan
    may contain a row-at-a-time Python stage (BatchEvalPython) — the
    only sanctioned Python boundaries are Arrow-batched
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas), the
    repo-wide hot-path rule the per-entry plan tests spot-check.
    Building each entry's plan at sf0.001 also smoke-checks that
    every registered query constructs against the gate tables."""
    from slacken_spark.plans import catalog

    offenders = []
    for name, (fn, _sql) in catalog.QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python stages in: {offenders}"


def test_global_prefix_sum_matches_window_form(spark):
    """global_prefix_sum (the scan primitive on the two-level rank
    machinery) must equal the single-task window cumsum exactly, for
    any bucket count, grouped and ungrouped, with zero weights and
    heavy order-key ties (total order restored by id)."""
    import numpy as np
    from pyspark.sql import Window

    from slacken_spark.operators.relational_ext import global_prefix_sum

    rng = np.random.default_rng(41)
    rows = [
        (int(i), int(i % 3), int(v), int(w))
        for i, (v, w) in enumerate(
            zip(rng.integers(0, 20, 151), rng.integers(0, 9, 151))
        )
    ]
    df = spark.createDataFrame(rows, "id long, g long, v long, w long")
    w_all = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("w").over(w_all)).collect()
    }
    for buckets in (1, 7, 64):
        got = {
            r["id"]: r["cum"]
            for r in global_prefix_sum(df, ["v", "id"], "w", buckets).collect()
        }
        assert got == want, f"buckets={buckets}"
    w_g = Window.partitionBy("g").orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want_g = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("w").over(w_g)).collect()
    }
    got_g = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(
            df, ["v", "id"], "w", 8, partition_cols=["g"]
        ).collect()
    }
    assert got_g == want_g


def test_pps_systematic_sample_properties(spark):
    """Systematic PPS over integer weights: the kept set equals the
    closed-form model (every row whose cumulative interval crosses a
    stride mark), heavy rows (w >= stride) are always kept with their
    multiplicity, zero-weight rows never, sample mass ~ total/stride,
    and a negative weight fails the plan loudly."""
    import numpy as np
    import pytest

    from slacken_spark.operators.relational_ext import pps_systematic_sample

    rng = np.random.default_rng(17)
    rows = [(int(i), int(w)) for i, w in enumerate(rng.integers(0, 40, 300))]
    rows[5] = (5, 0)          # zero weight
    rows[7] = (7, 500)        # heavier than the stride
    df = spark.createDataFrame(rows, "id long, w long")
    stride = 100
    got = {
        r["id"]: r["n_hits"]
        for r in pps_systematic_sample(df, "w", stride, ["id"]).collect()
    }
    cum, want = 0, {}
    for i, w in rows:
        prev, cum = cum, cum + w
        hits = cum // stride - prev // stride
        if hits > 0:
            want[i] = hits
    assert got == want
    assert 5 not in got
    assert got[7] == 5  # w=500 crosses five 100-marks
    assert sum(got.values()) == cum // stride
    with pytest.raises(Exception, match="negative weight"):
        bad = spark.createDataFrame([(1, -3)], "id long, w long")
        pps_systematic_sample(bad, "w", 10, ["id"]).collect()


def test_two_level_operators_keep_null_groups(spark):
    """The r10 high-review's confirmed bug class: groupBy keeps NULL as
    a real group, so the offsets/targets joins must be NULL-SAFE — a
    plain equi-join silently DROPPED every NULL-group row from
    global_row_number / global_prefix_sum / grouped_exact_quantiles.
    Pinned against the window / percentile-aggregate forms, which have
    always kept NULL groups."""
    from pyspark.sql import Window

    from slacken_spark.operators.relational_ext import (
        global_prefix_sum,
        global_row_number,
        grouped_exact_quantiles,
        pps_systematic_sample,
    )

    rows = [
        (1, None, 5.0, 5), (2, None, 7.0, 7), (3, "a", 3.0, 3),
        (4, None, 1.0, 1), (5, "a", 9.0, 9),
    ]
    df = spark.createDataFrame(rows, "id long, g string, v double, w long")
    w = Window.partitionBy("g").orderBy("v", "id")
    want_rank = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    got_rank = {
        r["id"]: r["rank"]
        for r in global_row_number(
            df, ["v", "id"], 4, partition_cols=["g"]
        ).collect()
    }
    assert got_rank == want_rank  # 5 rows, NULL group ranked 1..3

    want_cum = {
        r["id"]: r["c"]
        for r in df.withColumn(
            "c",
            F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        ).collect()
    }
    got_cum = {
        r["id"]: r["cum"]
        for r in global_prefix_sum(
            df, ["v", "id"], "w", 4, partition_cols=["g"]
        ).collect()
    }
    assert got_cum == want_cum

    want_q = {
        r["g"]: r["q"]
        for r in df.groupBy("g").agg(
            F.percentile("v", F.lit(0.5)).alias("q")
        ).collect()
    }
    got_q = {
        r["g"]: r["q"]
        for r in grouped_exact_quantiles(df, ["g"], "v", [0.5], 4).collect()
    }
    assert got_q == want_q and None in got_q and got_q[None] == 5.0

    # PPS with a NULL partition group keeps its rows too
    got_pps = {
        r["id"]
        for r in pps_systematic_sample(
            df.select("id", "g", "w"), "w", 5, ["id"], partition_cols=["g"]
        ).collect()
    }
    assert any(
        i in got_pps for i in (1, 2, 4)
    ), "NULL-group rows must be sampleable"


def test_pps_null_weight_fails_with_its_own_message(spark):
    """`w >= 0` on a NULL weight is NULL (not true), so without an
    explicit isNull branch a NULL weight fell through to the
    negative-weight raise whose concat-with-NULL message rendered as
    NULL — loud but mislabeled (r10 advice). It must fail with ITS OWN
    literal message."""
    import pytest

    from slacken_spark.operators.relational_ext import pps_systematic_sample

    df = spark.createDataFrame([(1, 3), (2, None)], "id long, w long")
    with pytest.raises(Exception, match="NULL weight"):
        pps_systematic_sample(df, "w", 10, ["id"]).collect()


def test_nullsafe_equi_join_reserves_right_side_names(spark):
    """The __r_<key> rename is applied to the RIGHT frame, so a right
    frame already carrying __r_<key> must fail with the clear _reserve
    message, not a downstream ambiguous-reference error (r10
    advice)."""
    import pytest

    from slacken_spark.operators.relational_ext import nullsafe_equi_join

    left = spark.createDataFrame([(1, "x")], "k long, a string")
    right = spark.createDataFrame(
        [(1, 9, "boom")], "k long, b long, __r_k string"
    )
    with pytest.raises(ValueError, match="reserved names"):
        nullsafe_equi_join(left, right, ["k"])


def test_salted_ops_accept_salt_cols(spark):
    """salt_cols (r10 advice): a hot key whose NON-key payload is
    constant gets zero spread from the whole-row hash — pointing the
    salt at a high-cardinality column restores it; results are
    identical either way (any deterministic salt is semantically
    valid). Also the escape hatch for MapType payloads, which the
    whole-row hash rejects at plan time."""
    from slacken_spark.operators.relational_ext import (
        _hash_salt,
        salted_agg,
        salted_join,
    )

    # hot key, CONSTANT payload: whole-row salt collapses to 1 bucket,
    # salt_cols=["id"] spreads
    left = spark.range(400).selectExpr(
        "id", "'hot' AS k", "'same' AS payload"
    )
    nspread = (
        left.select(_hash_salt(["id"], 16).alias("s"))
        .distinct()
        .count()
    )
    ncollapse = (
        left.select(_hash_salt(["k", "payload"], 16).alias("s"))
        .distinct()
        .count()
    )
    assert ncollapse == 1 and nspread > 8

    right = spark.createDataFrame([("hot", 1.5)], "k string, rate double")
    base = salted_join(left, right, "k").collect()
    with_cols = salted_join(left, right, "k", salt_cols=["id"]).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, with_cols))
    assert len(with_cols) == 400

    want = {r["k"]: r["n"] for r in left.groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = {
        r["k"]: r["n"]
        for r in salted_agg(
            left, "k", {"n": "count:id"}, salt_cols=["id"]
        ).collect()
    }
    assert got == want

    # MapType payload: whole-row hash fails at plan time; salt_cols works
    mleft = spark.range(10).selectExpr(
        "id", "'hot' AS k", "map('a', id) AS m"
    )
    rows = salted_agg(mleft, "k", {"n": "count:id"}, salt_cols=["id"]).collect()
    assert rows[0]["n"] == 10
