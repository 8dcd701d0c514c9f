"""functions.inverted: flat vs range-sharded posting lists, and the
hot-term skew bound the sharded form exists for."""

import pytest
from pyspark.sql import functions as F


def _corpus(spark, n_docs):
    # every doc contains the stopword-grade term 'hot' plus a spread
    # term that recurs every 97 docs (and a repeat of 'hot' to prove
    # per-doc de-duplication)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("hot w"), (F.col("id") % 97).cast("string"), F.lit(" hot")
        ).alias("text"),
    )


def test_hot_term_segments_stay_bounded_at_50k_docs(spark):
    """One term in EVERY doc at 50k docs: the sharded build must never
    give one task more than segment_rows postings for it — the bound
    that makes the operator safe where the flat build serializes."""
    from slacken_spark.functions.inverted import inverted_index

    n, seg_rows = 50_000, 100
    docs = _corpus(spark, n)
    sharded = inverted_index(
        docs, F.split(F.col("text"), " "), segment_rows=seg_rows
    )
    hot = sharded.where(F.col("term") == "hot")
    stats = hot.agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("df_segment").alias("max_df"),
        F.sum("df_segment").alias("total"),
        F.max(F.size("postings")).alias("max_list"),
    ).first()
    assert stats["n_segments"] == n // seg_rows
    assert stats["max_df"] <= seg_rows and stats["max_list"] <= seg_rows
    assert stats["total"] == n  # de-duplicated per doc, present in all


def test_sharded_segments_concatenate_to_the_flat_list(spark):
    """Segments are disjoint sorted ranges: concatenating them in
    segment order must reproduce the flat posting list exactly."""
    from slacken_spark.functions.inverted import inverted_index

    docs = _corpus(spark, 1_000)
    flat = {
        r["term"]: r["postings"]
        for r in inverted_index(docs, F.split(F.col("text"), " ")).collect()
    }
    merged: dict = {}
    sharded = inverted_index(
        docs, F.split(F.col("text"), " "), segment_rows=64
    ).orderBy("term", "segment")
    for r in sharded.collect():
        merged.setdefault(r["term"], []).extend(r["postings"])
    assert merged == flat
    assert flat["hot"] == list(range(1_000))


def _delta_reference(base_rows, upd_rows, seg_rows):
    """Pure-Python replay of delta semantics: full rebuild of the merged
    corpus restricted to affected (term, segment) pairs + tombstones."""
    upd = dict(upd_rows)
    merged = {i: upd.get(i, t) for i, t in base_rows}
    base = dict(base_rows)

    def seg(i):
        return i // seg_rows

    aff = set()
    for i, new_text in upd_rows:
        for term in set(base[i].split()) | set(new_text.split()):
            aff.add((term, seg(i)))
    lists: dict = {}
    for i, text in merged.items():
        for term in set(text.split()):
            if (term, seg(i)) in aff:
                lists.setdefault((term, seg(i)), []).append(i)
    out = {}
    for pair in aff:
        ids = sorted(lists.get(pair, []))
        out[pair] = (len(ids), ids)
    return out


def test_delta_index_matches_reference_on_clustered_updates(spark):
    """Clustered update batch (VERDICT r6 item 1's fixture): all changes
    land in doc_id < 40 — 4 segments out of 20 affected, so the segment
    pruning is OBSERVABLE (the r6 gate fixture touched every segment and
    could not see a full-corpus scan). Results must equal the
    pure-Python full-rebuild-restricted reference, tombstones included,
    and the pruned corpus row count must be exactly the affected
    segments' rows."""
    from slacken_spark.functions.inverted import delta_index, segment_expr

    n, seg_rows = 200, 10
    base = _corpus(spark, n)
    base_rows = [(r["doc_id"], r["text"]) for r in base.collect()]
    # updates: docs 0,7,13,...,39 → segments 0-3 only; text swaps the
    # spread term and DROPS 'hot' for doc 0 (tombstone candidate: 'w0'
    # in segment 0 may lose its sole holder)
    upd_rows = [
        (i, f"changed u{i} unique{i}") for i in [0, 7, 13, 21, 28, 39]
    ]
    upd = spark.createDataFrame(upd_rows, "doc_id long, text string")
    out = delta_index(
        base, upd, F.split(F.col("text"), " "), "doc_id", seg_rows
    )
    got = {
        (r["term"], r["segment"]): (r["df_segment"], list(r["postings"]))
        for r in out.collect()
    }
    ref = _delta_reference(base_rows, upd_rows, seg_rows)
    assert got == ref
    # tombstones really occur (df=0, empty postings)
    assert any(df == 0 and ids == [] for df, ids in got.values())
    # every emitted segment is an affected one
    aff_segs = {i // seg_rows for i, _ in upd_rows}
    assert {s for _, s in got} <= aff_segs
    # pruning is observable: the corpus semi-joined to affected segments
    # holds exactly those segments' rows — 40 of 200 here
    seg = segment_expr("doc_id", seg_rows)
    pruned_n = (
        base.withColumn("segment", seg)
        .join(
            F.broadcast(upd.select(seg.alias("segment")).distinct()),
            "segment",
            "left_semi",
        )
        .count()
    )
    assert pruned_n == len(aff_segs) * seg_rows == 40


def test_delta_index_rows_match_full_sharded_rebuild(spark):
    """On the affected pairs, delta output must be byte-equal to rows of
    a FULL sharded rebuild of the merged corpus — the patch really
    patches the index it claims to maintain."""
    from slacken_spark.functions.inverted import delta_index, inverted_index

    base = _corpus(spark, 300)
    upd = spark.createDataFrame(
        [(i, f"v2 w{i % 97} extra") for i in range(0, 300, 60)],
        "doc_id long, text string",
    )
    merged = (
        base.join(upd.select("doc_id"), "doc_id", "left_anti")
        .unionByName(upd)
    )
    full = inverted_index(merged, F.split(F.col("text"), " "), segment_rows=30)
    full_rows = {
        (r["term"], r["segment"]): (r["df_segment"], list(r["postings"]))
        for r in full.collect()
    }
    delta = delta_index(base, upd, F.split(F.col("text"), " "), "doc_id", 30)
    for r in delta.collect():
        key = (r["term"], r["segment"])
        if r["df_segment"] == 0:
            assert key not in full_rows, f"tombstone {key} still in full rebuild"
        else:
            assert full_rows[key] == (r["df_segment"], list(r["postings"])), key


def test_bad_segment_rows_rejected(spark):
    from slacken_spark.functions.inverted import inverted_index

    docs = _corpus(spark, 10)
    with pytest.raises(ValueError):
        inverted_index(docs, F.split(F.col("text"), " "), segment_rows=0)


def test_apply_delta_patch_equals_full_rebuild(spark):
    """The maintenance loop invariant: patching the original index with
    the delta must be row-identical to rebuilding the sharded index
    from scratch on the merged corpus — including pairs that vanish
    (tombstones really delete) and brand-new pairs."""
    from slacken_spark.functions.inverted import (
        apply_delta,
        delta_index,
        inverted_index,
    )

    base = _corpus(spark, 200)
    upd = spark.createDataFrame(
        [(i, f"changed u{i} unique{i}") for i in [0, 7, 13, 21, 28, 39]],
        "doc_id long, text string",
    )
    toks = F.split(F.col("text"), " ")
    index = inverted_index(base, toks, segment_rows=10)
    delta = delta_index(base, upd, toks, "doc_id", 10)
    patched = {
        (r["term"], r["segment"]): (r["df_segment"], list(r["postings"]))
        for r in apply_delta(index, delta).collect()
    }
    merged = base.join(upd.select("doc_id"), "doc_id", "left_anti").unionByName(upd)
    rebuilt = {
        (r["term"], r["segment"]): (r["df_segment"], list(r["postings"]))
        for r in inverted_index(merged, toks, segment_rows=10).collect()
    }
    assert patched == rebuilt
    # and the fixture exercises both interesting branches
    dropped = [r for r in delta.collect() if r["df_segment"] == 0]
    assert dropped, "fixture must include at least one tombstone"


# ---------------------------------------------------------------------------
# compact_segments: LSM compaction == from-scratch coarse build
# ---------------------------------------------------------------------------


def _rows(df):
    return {
        (r["term"], r["segment"], r["df_segment"], tuple(r["postings"]))
        for r in df.collect()
    }


def test_compact_equals_from_scratch_coarse_build(spark):
    """The compaction invariant: merging factor adjacent fine segments
    must be indistinguishable from having built coarse in the first
    place — rows, counts, and posting ORDER included."""
    from slacken_spark.functions.inverted import compact_segments, inverted_index

    docs = _corpus(spark, 1000)
    toks = F.split(F.col("text"), " ")
    fine = inverted_index(docs, toks, segment_rows=10)
    compacted = compact_segments(fine, 10)
    scratch = inverted_index(docs, toks, segment_rows=100)
    assert _rows(compacted) == _rows(scratch)


def test_compact_handles_negative_ids_with_floor_semantics(spark):
    """Hash-derived doc ids are signed; fine segment ids inherit the
    sign, and the coarse key must keep FLOOR (not truncation)
    semantics or negative segments collapse into the wrong groups."""
    from slacken_spark.functions.inverted import compact_segments, inverted_index

    docs = spark.range(-25, 25).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hot w"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    toks = F.split(F.col("text"), " ")
    fine = inverted_index(docs, toks, segment_rows=5)
    assert _rows(compact_segments(fine, 4)) == _rows(
        inverted_index(docs, toks, segment_rows=20)
    )


def test_compact_merges_lists_in_segment_order(spark):
    """Postings of a compacted segment must be globally sorted — the
    concatenation-in-fine-segment-order contract readers depend on."""
    from slacken_spark.functions.inverted import compact_segments, inverted_index

    docs = _corpus(spark, 500)
    fine = inverted_index(docs, F.split(F.col("text"), " "), segment_rows=10)
    for r in compact_segments(fine, 5).collect():
        assert list(r["postings"]) == sorted(r["postings"])
        assert r["df_segment"] == len(r["postings"])


def test_compact_rejects_bad_factor(spark):
    from slacken_spark.functions.inverted import compact_segments, inverted_index

    fine = inverted_index(
        _corpus(spark, 10), F.split(F.col("text"), " "), segment_rows=5
    )
    for bad in (0, -3):
        with pytest.raises(ValueError):
            compact_segments(fine, bad)


# ---------------------------------------------------------------------------
# query_index: the read path
# ---------------------------------------------------------------------------


def test_query_index_matches_scan_semantics(spark):
    """Serving from the index must answer exactly what a corpus scan
    would: per-doc distinct-query-term counts, top-k by (count desc,
    doc_id), dense ranks."""
    from slacken_spark.functions.inverted import inverted_index, query_index

    docs = _corpus(spark, 400)
    toks = F.split(F.col("text"), " ")
    idx = inverted_index(docs, toks, segment_rows=25)
    terms = ["hot", "w3", "w11"]
    got = [
        (r["doc_id"], r["n_matched"], r["rank"])
        for r in query_index(idx, terms, 15).orderBy("rank").collect()
    ]
    # model: every doc has 'hot'; w<i> iff id % 97 == i
    model = []
    for i in range(400):
        n = 1 + (1 if i % 97 == 3 else 0) + (1 if i % 97 == 11 else 0)
        model.append((i, n))
    model.sort(key=lambda t: (-t[1], t[0]))
    expect = [(d, n, rk + 1) for rk, (d, n) in enumerate(model[:15])]
    assert got == expect
    # duplicate query terms must not double-count
    got_dup = [
        (r["doc_id"], r["n_matched"], r["rank"])
        for r in query_index(idx, terms + ["hot", "hot"], 15)
        .orderBy("rank")
        .collect()
    ]
    assert got_dup == expect
    for bad_k, bad_terms in ((0, terms), (5, [])):
        with pytest.raises(ValueError):
            query_index(idx, bad_terms, bad_k)


def test_query_index_uses_distributed_takeordered(spark):
    """The global top-k must be TakeOrdered (per-partition heaps), not
    a corpus-wide window sort; the query terms must reach the index as
    a broadcast semi-join."""
    from slacken_spark.functions.inverted import inverted_index, query_index

    idx = inverted_index(
        _corpus(spark, 500), F.split(F.col("text"), " "), segment_rows=50
    )
    plan = query_index(idx, ["hot", "w1"], 10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def _tf_corpus(spark, n=120):
    """Corpus with REPEATED terms per doc so tf > 1 actually occurs
    (the boolean fixtures are tf-vacuous: every word unique per doc)."""
    rows = []
    for i in range(n):
        words = [f"w{(i * 3 + j) % 13}" for j in range(5)]
        words += [f"w{i % 13}"] * (i % 3 + 1)  # repeats → tf 2..4
        if i % 4 == 0:
            words += ["hot", "hot"]
        rows.append((i, " ".join([f"u{i}"] + words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_delta_scored_index_patch_equals_full_rebuild(spark):
    """Ranked-index maintenance invariant: scored build → scored delta
    → apply_delta must equal a from-scratch sharded scored_index of
    the merged corpus, row for row, tf structs included — and the
    fixture must actually exercise tf > 1 and tombstones."""
    from slacken_spark.functions.inverted import (
        apply_delta,
        delta_scored_index,
        scored_index,
    )

    toks = F.split(F.col("text"), " ")
    base = _tf_corpus(spark)
    upd = spark.createDataFrame(
        [(i, f"changed only{i} only{i}") for i in (0, 7, 24, 36)],
        "doc_id long, text string",
    )
    idx = scored_index(base, toks, segment_rows=10)
    delta = delta_scored_index(base, upd, toks, "doc_id", 10)
    patched = apply_delta(idx, delta)
    merged = (
        base.join(upd.select("doc_id"), "doc_id", "left_anti").unionByName(upd)
    )
    fresh = scored_index(merged, toks, segment_rows=10)

    def rows(df):
        return {
            (r["term"], r["segment"]): (
                r["df_segment"],
                [(p["doc_id"], p["tf"]) for p in r["postings"]],
            )
            for r in df.collect()
        }

    got, want = rows(patched), rows(fresh)
    assert got == want
    assert any(
        tf > 1 for _, ps in want.values() for _, tf in ps
    ), "fixture is tf-vacuous"
    # tombstones really fired: some (term, segment) of the base index
    # is absent from the patched one (u0 lost its sole holder)
    base_keys = set(rows(idx))
    assert base_keys - set(got), "no pair was tombstoned"
    # delta emitted only affected segments
    aff = {0, 2, 3}
    assert {r["segment"] for r in delta.collect()} <= aff


def test_flatten_scored_segments_matches_flat_build(spark):
    """Flattening the sharded scored index must reproduce the flat
    build exactly (df summed, segment lists concatenated in order),
    and ranked serving through it must be answer-identical."""
    from slacken_spark.functions.inverted import (
        flatten_scored_segments,
        query_index_ranked,
        scored_index,
    )

    toks = F.split(F.col("text"), " ")
    docs = _tf_corpus(spark)
    flat = scored_index(docs, toks)
    flattened = flatten_scored_segments(scored_index(docs, toks, segment_rows=10))

    def rows(df):
        return {
            r["term"]: (r["df"], [(p["doc_id"], p["tf"]) for p in r["postings"]])
            for r in df.collect()
        }

    assert rows(flattened) == rows(flat)
    n = docs.count()
    serve = lambda idx: [
        (r["doc_id"], r["score"], r["rank"])
        for r in query_index_ranked(idx, ["hot", "w3"], 10, n).collect()
    ]
    assert serve(flattened) == serve(flat)


def test_compact_segments_works_on_scored_index(spark):
    """compact_segments is postings-type-generic: merging a SHARDED
    SCORED index's fine segments must equal the from-scratch coarse
    scored build, tf structs included — the ranked index gets LSM
    compaction for free."""
    from slacken_spark.functions.inverted import compact_segments, scored_index

    toks = F.split(F.col("text"), " ")
    docs = _tf_corpus(spark)
    fine = scored_index(docs, toks, segment_rows=10)
    coarse = scored_index(docs, toks, segment_rows=30)

    def rows(df):
        return {
            (r["term"], r["segment"]): (
                r["df_segment"],
                [(p["doc_id"], p["tf"]) for p in r["postings"]],
            )
            for r in df.collect()
        }

    assert rows(compact_segments(fine, 3)) == rows(coarse)
