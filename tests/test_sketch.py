"""functions.sketch: Count-Min Sketch heavy hitters — model-based
parity with a pure-Python sketch, the no-undercount guarantee, and the
no-missed-heavy-hitter property the pre-shuffle filter relies on."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

D, W = 3, 64  # small width so collisions actually happen in-test


def _h(row: int, term: str) -> int:
    return int(hashlib.md5(f"cms{row}_{term}".encode()).hexdigest()[:15], 16) % W


def _model(occurrences, threshold):
    """Pure-Python CMS over the same hashes: grid, est = min over rows,
    report terms with est >= threshold alongside exact counts."""
    exact = Counter(occurrences)
    grid = [Counter() for _ in range(D)]
    for term, n in exact.items():
        for r in range(D):
            grid[r][_h(r, term)] += n
    out = {}
    for term, n in exact.items():
        est = min(grid[r][_h(r, term)] for r in range(D))
        if est >= threshold:
            out[term] = (est, n)
    return out


def _occurrences():
    # skewed stream: a few heavy terms, a long tail of near-singletons
    occ = []
    for i in range(6):
        occ += [f"heavy{i}"] * (40 + i)
    for i in range(300):
        occ += [f"tail{i}"] * (1 + i % 3)
    return occ


def test_cms_matches_pure_python_model(spark):
    from slacken_spark.functions.sketch import cms_heavy_hitters

    occ = _occurrences()
    df = spark.createDataFrame([(t,) for t in occ], "term string")
    got = {
        r["term"]: (r["cms_est"], r["n_exact"])
        for r in cms_heavy_hitters(df, 30, depth=D, width=W).collect()
    }
    assert got == _model(occ, 30)


def test_cms_never_undercounts_and_never_misses_a_heavy_hitter(spark):
    from slacken_spark.functions.sketch import cms_heavy_hitters

    occ = _occurrences()
    exact = Counter(occ)
    df = spark.createDataFrame([(t,) for t in occ], "term string")
    rows = cms_heavy_hitters(df, 30, depth=D, width=W).collect()
    got = {r["term"]: r for r in rows}
    for r in rows:  # est >= true count, exact counts are exact
        assert r["cms_est"] >= r["n_exact"] == exact[r["term"]]
    for term, n in exact.items():  # no false negatives
        if n >= 30:
            assert term in got, f"true heavy hitter {term} missed"


def test_cms_sketch_is_grid_sized(spark):
    from slacken_spark.functions.sketch import cms_sketch

    df = spark.createDataFrame([(t,) for t in _occurrences()], "term string")
    sk = cms_sketch(df, depth=D, width=W).collect()
    assert len(sk) <= D * W
    assert {r["row"] for r in sk} == set(range(D))
    assert all(0 <= r["pos"] < W for r in sk)
    # every occurrence lands in every row: row totals == stream length
    totals = Counter()
    for r in sk:
        totals[r["row"]] += r["c"]
    assert set(totals.values()) == {len(_occurrences())}


def test_cms_probe_joins_are_broadcast(spark):
    """The grid must come back as broadcast joins (map-side probes) —
    a shuffled join on the probe columns would shuffle the full
    occurrence stream three times."""
    from slacken_spark.functions.sketch import cms_heavy_hitters

    df = spark.createDataFrame([(t,) for t in _occurrences()], "term string")
    plan = cms_heavy_hitters(df, 30, depth=D, width=W)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= D
    assert "SortMergeJoin" not in plan


def test_cms_merge_of_partial_grids_equals_whole_grid(spark):
    """Mergeability — the property that lets the sketch build
    per-partition / per-micro-batch: grid(A ∪ B) == merge(grid(A),
    grid(B)), cell for cell."""
    from slacken_spark.functions.sketch import cms_merge, cms_sketch

    occ = _occurrences()
    half_a = spark.createDataFrame([(t,) for t in occ[::2]], "term string")
    half_b = spark.createDataFrame([(t,) for t in occ[1::2]], "term string")
    whole = spark.createDataFrame([(t,) for t in occ], "term string")
    merged = cms_merge(
        cms_sketch(half_a, depth=D, width=W).unionByName(
            cms_sketch(half_b, depth=D, width=W)
        )
    )
    as_rows = lambda df: {(r["row"], r["pos"]): r["c"] for r in df.collect()}
    assert as_rows(merged) == as_rows(cms_sketch(whole, depth=D, width=W))


def test_streaming_sketch_two_batches_merge_to_batch_grid(spark, tmp_path):
    """cms_sketch_stream over a two-file stream (maxFilesPerTrigger=1 →
    two genuine micro-batches): the accumulated cells cms_merge to the
    EXACT grid of one batch pass over the union, and heavy hitters off
    the streamed grid equal the batch operator's."""
    from slacken_spark.functions.sketch import (
        cms_heavy_hitters,
        cms_merge,
        cms_sketch,
    )
    from slacken_spark.streaming import ops

    occ = _occurrences()
    rows = [(i, t) for i, t in enumerate(occ)]
    a = spark.createDataFrame(rows[::2], "rid long, term string")
    b = spark.createDataFrame(rows[1::2], "rid long, term string")
    a.coalesce(1).write.parquet(str(tmp_path / "src" / "a.parquet"))
    b.coalesce(1).write.parquet(str(tmp_path / "src" / "b.parquet"))
    stream = (
        spark.readStream.schema("rid long, term string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(tmp_path / "src") + "/*/")
    )
    cells, epochs = [], []

    def sink(grid_df, epoch):
        epochs.append(epoch)
        cells.extend(grid_df.collect())

    ops.run_foreach_to_completion(
        ops.cms_sketch_stream(
            stream, lambda batch: batch.select("term"), sink, depth=D, width=W
        )
    )
    assert len(set(epochs)) >= 2, "expected two micro-batches"
    streamed = cms_merge(
        spark.createDataFrame(cells, "row int, pos bigint, c bigint")
    )
    whole = spark.createDataFrame([(t,) for t in occ], "term string")
    as_rows = lambda df: {(r["row"], r["pos"]): r["c"] for r in df.collect()}
    assert as_rows(streamed) == as_rows(cms_sketch(whole, depth=D, width=W))
    via_stream = {
        r["term"]: (r["cms_est"], r["n_exact"])
        for r in cms_heavy_hitters(
            whole, 30, depth=D, width=W, sketch=streamed
        ).collect()
    }
    assert via_stream == _model(occ, 30)


def test_cms_maintain_equals_rebuild_under_replacement(spark):
    """Grid linearity: replacing documents' occurrence streams via
    grid − grid(old) + grid(new) must equal the from-scratch grid of
    the merged stream, zero cells dropped — including when a term's
    whole contribution disappears."""
    from slacken_spark.functions.sketch import cms_maintain, cms_sketch

    occ = _occurrences()
    # replace: drop all of heavy0 (its cells shrink, some may zero) and
    # introduce a brand-new term
    old_part = [t for t in occ if t == "heavy0"] + ["tail1"] * 2
    new_part = ["fresh_term"] * 9
    kept = [t for t in occ if t != "heavy0"]
    kept.remove("tail1"); kept.remove("tail1")
    df = lambda ts: spark.createDataFrame([(t,) for t in ts], "term string")
    grid = cms_sketch(df(occ), depth=D, width=W)
    maintained = cms_maintain(grid, df(old_part), df(new_part), depth=D, width=W)
    rebuilt = cms_sketch(df(kept + new_part), depth=D, width=W)
    as_rows = lambda d: {(r["row"], r["pos"]): r["c"] for r in d.collect()}
    assert as_rows(maintained) == as_rows(rebuilt)


def _hq_model(values_cents, width, percents):
    """Pure-python replay of the histogram-quantile read-off."""
    bins = Counter(c // width for c in values_cents)
    n = len(values_cents)
    out = {"n": n}
    cum = 0
    thr = {p: -(-n * p // 100) for p in percents}  # ceil
    got = {}
    for b in sorted(bins):
        cum += bins[b]
        for p in percents:
            if p not in got and cum >= thr[p]:
                got[p] = (b + 1) * width
    out.update({f"q{p}_ub_cents": got[p] for p in percents})
    return out


def test_histogram_quantiles_match_model_and_bound(spark):
    from slacken_spark.functions.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    cents = [3, 7, 12, 12, 25, 38, 41, 77, 103, 250]
    df = spark.createDataFrame(
        [("a", c / 100.0) for c in cents], "grp string, value double"
    )
    hist = histogram_sketch(df, "grp", F.round(F.col("value") * 100), 10)
    [row] = histogram_quantiles(hist, 10, [50, 95]).collect()
    want = _hq_model(cents, 10, [50, 95])
    assert row["n"] == want["n"]
    assert row["q50_ub_cents"] == want["q50_ub_cents"]
    assert row["q95_ub_cents"] == want["q95_ub_cents"]
    # sketch contract: the reported upper bound brackets the true
    # quantile within one bin width
    import math

    for p in (50, 95):
        true_q = sorted(cents)[math.ceil(len(cents) * p / 100) - 1]
        ub = row[f"q{p}_ub_cents"]
        assert true_q < ub <= true_q + 10


def test_histogram_sketch_is_mergeable(spark):
    from slacken_spark.functions.sketch import histogram_sketch

    rows = [("a", float(i % 13)) for i in range(200)] + [
        ("b", float(i % 7)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    whole = histogram_sketch(df, "grp", F.round(F.col("value") * 100), 250)
    h1 = histogram_sketch(
        df.limit(137), "grp", F.round(F.col("value") * 100), 250
    )
    h2 = histogram_sketch(
        df.exceptAll(df.limit(137)), "grp", F.round(F.col("value") * 100), 250
    )
    from slacken_spark.functions.sketch import histogram_merge

    merged = histogram_merge(h1.unionByName(h2))
    key = lambda r: (r["grp"], r["bin"], r["n"])
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, whole.collect())
    )


def test_histogram_sketch_rejects_bad_args(spark):
    from slacken_spark.functions.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.createDataFrame([("a", 1.0)], "grp string, value double")
    with pytest.raises(ValueError):
        histogram_sketch(df, "grp", F.round(F.col("value") * 100), 0)
    hist = histogram_sketch(df, "grp", F.round(F.col("value") * 100), 10)
    with pytest.raises(ValueError):
        histogram_quantiles(hist, 10, [])
    with pytest.raises(ValueError):
        histogram_quantiles(hist, 10, [0])


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_histogram_quantiles_match_model_randomized(spark, seed):
    import random

    from slacken_spark.functions.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )

    rng = random.Random(seed)
    groups = ["a", "b", "c"][: rng.randint(1, 3)]
    rows, want = [], {}
    for g in groups:
        cents = [rng.randint(0, 5000) for _ in range(rng.randint(1, 120))]
        rows += [(g, c / 100.0) for c in cents]
        want[g] = _hq_model(cents, 250, [50, 95])
    df = spark.createDataFrame(rows, "grp string, value double")
    hist = histogram_sketch(df, "grp", F.round(F.col("value") * 100), 250)
    got = {
        r["grp"]: {
            "n": r["n"],
            "q50_ub_cents": r["q50_ub_cents"],
            "q95_ub_cents": r["q95_ub_cents"],
        }
        for r in histogram_quantiles(hist, 250, [50, 95]).collect()
    }
    assert got == want


def test_histogram_maintain_equals_rebuild(spark):
    """Histogram linearity: hist − hist(old) + hist(new) ≡ from-scratch
    histogram of the merged rows, including bins emptied to zero (must
    DROP) and brand-new bins."""
    from slacken_spark.functions.sketch import (
        histogram_maintain,
        histogram_sketch,
    )

    base_rows = [("a", float(v)) for v in (1, 2, 2, 9, 9, 30)] + [
        ("b", float(v)) for v in (5, 5)
    ]
    # replace: both 9s move to 500 (bin of 9-cents empties → drops;
    # new far bin appears); one b row changes within its bin
    old = [("a", 9.0), ("a", 9.0), ("b", 5.0)]
    new = [("a", 500.0), ("a", 500.0), ("b", 5.5)]
    df = lambda rows: spark.createDataFrame(rows, "grp string, value double")
    cents = F.round(F.col("value") * 100)
    hist = histogram_sketch(df(base_rows), "grp", cents, 250)
    maintained = histogram_maintain(hist, df(old), df(new), "grp", cents, 250)
    merged = [r for r in base_rows]
    for o in old:
        merged.remove(o)
    merged += new
    rebuilt = histogram_sketch(df(merged), "grp", cents, 250)
    as_rows = lambda d: {(r["grp"], r["bin"]): r["n"] for r in d.collect()}
    got, want = as_rows(maintained), as_rows(rebuilt)
    assert got == want
    assert ("a", 0) in got  # 1,2,2 stay
    assert all(n > 0 for n in got.values())  # zeroed bins dropped


def test_streaming_histogram_two_batches_merge_to_batch_sketch(
    spark, tmp_path
):
    """histogram_stream over a two-file stream (maxFilesPerTrigger=1 →
    two genuine micro-batches): the accumulated bins sum to the EXACT
    histogram of one batch pass over the union, so the stream's
    quantile read-off equals the batch sketch's."""
    from slacken_spark.functions.sketch import histogram_sketch
    from slacken_spark.streaming import ops

    rows = [("a", float(i % 37)) for i in range(160)] + [
        ("b", float(i % 11)) for i in range(80)
    ]
    a = spark.createDataFrame(rows[::2], "grp string, value double")
    b = spark.createDataFrame(rows[1::2], "grp string, value double")
    a.coalesce(1).write.parquet(str(tmp_path / "src" / "a.parquet"))
    b.coalesce(1).write.parquet(str(tmp_path / "src" / "b.parquet"))
    stream = (
        spark.readStream.schema("grp string, value double")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(tmp_path / "src") + "/*/")
    )
    cells, epochs = [], []

    def sink(hist_df, epoch):
        epochs.append(epoch)
        cells.extend(hist_df.collect())

    ops.run_foreach_to_completion(
        ops.histogram_stream(
            stream, sink, "grp", F.round(F.col("value") * 100), 250
        )
    )
    assert len(set(epochs)) >= 2, "expected two micro-batches"
    from slacken_spark.functions.sketch import histogram_merge

    merged = histogram_merge(
        spark.createDataFrame(cells, "grp string, bin bigint, n bigint")
    )
    whole = histogram_sketch(
        spark.createDataFrame(rows, "grp string, value double"),
        "grp",
        F.round(F.col("value") * 100),
        250,
    )
    as_rows = lambda d: {(r["grp"], r["bin"]): r["n"] for r in d.collect()}
    assert as_rows(merged) == as_rows(whole)


# ---------------------------------------------------------------------------
# HyperLogLog register table
# ---------------------------------------------------------------------------

HLL_P = 9
HLL_M = 1 << HLL_P


def _hll_h(v) -> int:
    return int(hashlib.md5(f"hll_{v}".encode()).hexdigest()[:15], 16)


def _hll_model(values, p=HLL_P):
    """Pure-Python register table over the same md5-derived hashes."""
    m = 1 << p
    regs: dict[int, int] = {}
    for v in values:
        h = _hll_h(v)
        reg, w = h % m, h // m
        rho = 60 + 1 - p - (w.bit_length())
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_pure_python_model(spark):
    """Register-for-register parity with the model: the table is the
    hash-exact artifact (estimates are derived, tolerance-free gates
    belong here). Groups with wildly different cardinalities, string
    AND int values (the cast-to-string hash input)."""
    from slacken_spark.functions.sketch import hll_registers

    rows = []
    for g, n in (("a", 3), ("b", 450), ("c", 2000)):
        for i in range(n):
            rows.append((g, f"u{i % (n // 2 + 1)}"))  # dups: distinct < n
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r["g"], r["reg"]): r["rho"]
        for r in hll_registers(df, ["g"], "v", HLL_P).collect()
    }
    want = {}
    for g, n in (("a", 3), ("b", 450), ("c", 2000)):
        vals = {f"u{i % (n // 2 + 1)}" for i in range(n)}
        for reg, rho in _hll_model(vals).items():
            want[(g, reg)] = rho
    assert got == want


def test_hll_merge_and_maintain_equal_rebuild(spark):
    """Mergeability (the shard/stream property) and append-CDC
    maintenance, both row-exact: regs(A ∪ B) == merge(regs(A),
    regs(B)) == maintain(regs(A), B)."""
    from slacken_spark.functions.sketch import (
        hll_maintain,
        hll_merge,
        hll_registers,
    )

    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(800)], "g string, v string"
    )
    b = spark.createDataFrame(
        [("g", f"x{i}") for i in range(600, 1400)]  # overlap with a
        + [("h", f"y{i}") for i in range(200)],     # new group
        "g string, v string",
    )
    whole = {
        (r["g"], r["reg"]): r["rho"]
        for r in hll_registers(a.unionByName(b), ["g"], "v", HLL_P).collect()
    }
    ra = hll_registers(a, ["g"], "v", HLL_P)
    rb = hll_registers(b, ["g"], "v", HLL_P)
    merged = {
        (r["g"], r["reg"]): r["rho"]
        for r in hll_merge(ra.unionByName(rb), ["g"]).collect()
    }
    maintained = {
        (r["g"], r["reg"]): r["rho"]
        for r in hll_maintain(ra, b, ["g"], "v", HLL_P).collect()
    }
    assert merged == whole
    assert maintained == whole


@pytest.mark.parametrize("n", [40, 400, 4000])
def test_hll_estimate_tracks_true_cardinality(spark, n):
    """The derived estimate lands within 12% of truth at p=9 across
    three orders of magnitude (linear counting below 2.5m, raw HLL
    above) — loose enough for hash luck, tight enough that a broken
    rho or zero-register count fails."""
    from slacken_spark.functions.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(n)], "g string, v string"
    )
    regs = hll_registers(df, ["g"], "v", HLL_P)
    [row] = hll_estimate(regs, ["g"], HLL_P).collect()
    assert abs(row["est"] - n) <= 0.12 * n, row["est"]


def test_hll_registers_ignore_nulls(spark):
    """NULL values must not register — count_distinct semantics; a
    phantom null register would also poison the merge with a null
    reg key."""
    from slacken_spark.functions.sketch import hll_registers

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b"), ("h", None)],
        "g string, v string",
    )
    rows = hll_registers(df, ["g"], "v", HLL_P).collect()
    assert all(r["reg"] is not None and r["rho"] is not None for r in rows)
    assert {r["g"] for r in rows} == {"g"}  # all-null group: no rows
    want = _hll_model({"a", "b"})
    got = {r["reg"]: r["rho"] for r in rows}
    assert got == want


def test_hll_registers_reject_bad_p(spark):
    from slacken_spark.functions.sketch import hll_registers

    df = spark.createDataFrame([("g", "v")], "g string, v string")
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(df, ["g"], "v", 1)


def test_hll_register_table_is_bounded_and_integer(spark):
    """At most 2^p rows per group whatever the input size, int types
    throughout (the 100 TB contract: the artifact is tiny and exact)."""
    from slacken_spark.functions.sketch import hll_registers

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(20000)], "g string, v string"
    )
    out = hll_registers(df, ["g"], "v", 5)
    rows = out.collect()
    assert len(rows) <= 32
    assert out.schema["reg"].dataType.simpleString() == "int"
    assert out.schema["rho"].dataType.simpleString() == "int"
    assert all(1 <= r["rho"] <= 60 + 1 - 5 for r in rows)


def test_streaming_hll_two_batches_equal_batch_registers(spark, tmp_path):
    """hll_stream over a two-file stream (maxFilesPerTrigger=1 → two
    genuine micro-batches) starting from a NON-EMPTY base table: the
    final maintained registers equal one batch pass over base ∪ both
    batches, row for row, and every epoch's table is a valid
    intermediate (registers only ever grow)."""
    from slacken_spark.functions.sketch import hll_registers
    from slacken_spark.streaming import ops

    base_rows = [("g", f"seed{i}") for i in range(100)]
    a = [(i, "g", f"x{i}") for i in range(0, 400)]
    b = [(i, "g", f"x{i}") for i in range(300, 700)] + [
        (i, "h", f"y{i}") for i in range(50)
    ]
    spark.createDataFrame(a, "rid long, g string, v string").coalesce(
        1
    ).write.parquet(str(tmp_path / "src" / "a.parquet"))
    spark.createDataFrame(b, "rid long, g string, v string").coalesce(
        1
    ).write.parquet(str(tmp_path / "src" / "b.parquet"))
    stream = (
        spark.readStream.schema("rid long, g string, v string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(tmp_path / "src") + "/*/")
    )
    base = hll_registers(
        spark.createDataFrame(base_rows, "g string, v string"),
        ["g"], "v", HLL_P,
    )
    seen = []

    def sink(regs_df, epoch):
        seen.append({(r["g"], r["reg"]): r["rho"] for r in regs_df.collect()})

    ops.run_foreach_to_completion(
        ops.hll_stream(base, stream, ["g"], "v", sink, HLL_P)
    )
    assert len(seen) >= 2, "expected two micro-batches"
    whole = spark.createDataFrame(
        base_rows + [(g, v) for _, g, v in a + b], "g string, v string"
    )
    want = {
        (r["g"], r["reg"]): r["rho"]
        for r in hll_registers(whole, ["g"], "v", HLL_P).collect()
    }
    assert seen[-1] == want
    # monotone growth: every epoch's registers dominate the previous
    for prev, cur in zip(seen, seen[1:]):
        assert set(prev) <= set(cur)
        assert all(cur[k] >= v for k, v in prev.items())


def test_hll_registers_plan_is_one_partial_agg_shuffle(spark):
    """Scale pin: the register build must be ONE hash-aggregate pair
    (partial max map-side, final max after a single register-keyed
    exchange) with no Python stage — map tasks collapse to register
    size before the only shuffle, the property that keeps the build
    flat as input grows (measured: 1x->10x events wall 0.78->0.67 s)."""
    from slacken_spark.functions.sketch import hll_registers

    df = spark.range(1000).selectExpr("'g' AS g", "concat('v', id) AS v")
    plan = (
        hll_registers(df, ["g"], "v", 9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("Initial Plan")[0]
    assert final.count("Exchange hashpartitioning") == 1, final
    assert "BatchEvalPython" not in final
    assert "partial_max" in final or "HashAggregate" in final, final


def test_hll_intersection_estimate_tracks_true_overlap(spark):
    """Inclusion–exclusion over two register tables: overlap estimates
    land within 15% of truth for large overlaps, disjoint sets report
    ~0 (clamped at 0, never negative), and one-sided groups survive
    with est 0 on the missing side."""
    from slacken_spark.functions.sketch import (
        hll_intersection_estimate,
        hll_registers,
    )

    a_rows = [("g", f"x{i}") for i in range(2000)] + [
        ("d", f"a{i}") for i in range(500)
    ] + [("only_a", f"q{i}") for i in range(300)]
    b_rows = [("g", f"x{i}") for i in range(1200, 3200)] + [
        ("d", f"b{i}") for i in range(500)
    ]
    ra = hll_registers(
        spark.createDataFrame(a_rows, "g string, v string"), ["g"], "v", HLL_P
    )
    rb = hll_registers(
        spark.createDataFrame(b_rows, "g string, v string"), ["g"], "v", HLL_P
    )
    got = {
        r["g"]: r
        for r in hll_intersection_estimate(ra, rb, ["g"], HLL_P).collect()
    }
    # g: |A|=2000, |B|=2000, overlap 800
    assert abs(got["g"]["est_intersection"] - 800) <= 0.15 * 2000
    # d: disjoint — near zero, never negative
    assert 0 <= got["d"]["est_intersection"] <= 0.1 * 1000
    # only_a: present with empty B side
    assert got["only_a"]["est_b"] == 0.0
    assert got["only_a"]["est_union"] > 250


def test_hll_estimate_rejects_mismatched_p(spark):
    """A register table built with a LARGER p must fail loudly, not
    return a plausible float: it leaves reg >= m / nz > m, which the
    estimator detects before the zero-register count goes negative
    (r10 high-review)."""
    from slacken_spark.functions.sketch import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(3000)], "g string, v string"
    )
    big = hll_registers(df, ["g"], "v", 12)
    with pytest.raises(Exception, match="inconsistent with p=9"):
        hll_estimate(big, ["g"], 9).collect()
    # (a SMALLER build-p is structurally indistinguishable from sparse
    # data — the guard is best-effort; the docstring says to carry p
    # with the table)
    # matched p still estimates
    assert hll_estimate(big, ["g"], 12).count() == 1


def test_hll_intersection_keeps_null_group(spark):
    """NULL group keys are real groups to groupBy; the estimate joins
    must be null-safe or the overlap silently clamps to 0 (r10
    high-review, runtime-confirmed)."""
    from slacken_spark.functions.sketch import (
        hll_intersection_estimate,
        hll_registers,
    )

    rows = [(None, f"x{i}") for i in range(50)]
    ra = hll_registers(
        spark.createDataFrame(rows, "g string, v string"), ["g"], "v", HLL_P
    )
    rb = hll_registers(
        spark.createDataFrame(rows, "g string, v string"), ["g"], "v", HLL_P
    )
    [r] = hll_intersection_estimate(ra, rb, ["g"], HLL_P).collect()
    assert r["g"] is None
    assert abs(r["est_a"] - 50) <= 10 and abs(r["est_b"] - 50) <= 10
    assert abs(r["est_intersection"] - 50) <= 12, r["est_intersection"]


def test_hll_estimate_merges_unmerged_partials(spark):
    """An UNMERGED union of register partials (duplicate (group, reg)
    rows) passed the p-mismatch guard whenever nz <= m and silently
    inflated the nonzero count and harmonic sum (r10 advice) —
    hll_estimate now merges internally (idempotent on merged input),
    so the unmerged union estimates EXACTLY like the merged table."""
    from slacken_spark.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(200)], "g string, v string"
    )
    a = hll_registers(df.where("substr(v, 2) % 2 = 0"), ["g"], "v", 9)
    # b overlaps a (shares the < 50 values) so the union has duplicate
    # (group, reg) rows with differing partial maxima
    b = hll_registers(
        df.where("substr(v, 2) % 2 = 1 OR substr(v, 2) < 50"),
        ["g"], "v", 9,
    )
    unmerged = a.unionByName(b)
    assert unmerged.count() > hll_merge(unmerged, ["g"]).count()
    est_unmerged = hll_estimate(unmerged, ["g"], 9).collect()[0]["est"]
    est_merged = hll_estimate(
        hll_merge(unmerged, ["g"]), ["g"], 9
    ).collect()[0]["est"]
    assert est_unmerged == est_merged
    # and it still tracks the truth (200 distinct values)
    assert abs(est_merged - 200) / 200 < 0.15
