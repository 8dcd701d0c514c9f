"""Composition e2e: the full user-story chain — ingest → dedup →
index build → CDC delta → patch → compact → SERVE — run end to end
through the library functions exactly as a deployment would chain
them, with the serving answer pinned against a from-scratch pipeline
over the merged corpus. The per-operator invariants are each pinned
in their own test files; this test pins that the pieces COMPOSE."""

from pyspark.sql import functions as F

from slacken_spark.functions.dedup import exact_dedup
from slacken_spark.functions.inverted import (
    apply_delta,
    compact_segments,
    delta_index,
    inverted_index,
    query_index,
)


def _corpus(spark):
    rows = []
    for i in range(60):
        # u{i} keeps every base doc textually unique so the ONLY exact
        # duplicates are the two planted below
        words = [f"u{i}"] + [f"w{(i * 3 + j) % 17}" for j in range(6)]
        if i % 4 == 0:
            words.append("hot")
        rows.append((i, " ".join(words)))
    # exact duplicates of docs 0 and 1 under new ids — dedup must drop
    rows.append((100, rows[0][1]))
    rows.append((101, rows[1][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pipeline_to_serving_composes(spark):
    docs = _corpus(spark)
    toks = F.split(F.col("text"), " ")

    # 1. dedup: keep the lowest-id copy of each distinct text
    keep = exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    clean = docs.join(keep, "doc_id", "left_semi")
    assert clean.count() == 60, "the two planted duplicates must drop"

    # 2. build the sharded index over the deduped corpus
    idx = inverted_index(clean, toks, segment_rows=10)

    # 3. CDC batch: every 12th doc re-written; 'hot' vanishes from the
    #    rewritten docs that had it, a brand-new term appears
    upd = clean.where(F.col("doc_id") % 12 == 0).select(
        "doc_id", F.lit("fresh term only").alias("text")
    )
    delta = delta_index(clean, upd, toks, segment_rows=10)
    patched = apply_delta(idx, delta)

    # 4. compact the patched index into coarser segments
    compacted = compact_segments(patched, 3)

    # 5. serve through every stage and pin against a from-scratch
    #    pipeline over the merged corpus
    merged = clean.join(upd.select("doc_id"), "doc_id", "left_anti").unionByName(
        upd
    )
    fresh = inverted_index(merged, toks, segment_rows=10)
    want = {
        (r["doc_id"], r["n_matched"], r["rank"])
        for r in query_index(fresh, ["hot", "fresh"], 8).collect()
    }
    for stage, served in (("patched", patched), ("compacted", compacted)):
        got = {
            (r["doc_id"], r["n_matched"], r["rank"])
            for r in query_index(served, ["hot", "fresh"], 8).collect()
        }
        assert got == want, f"serving through the {stage} index diverged"
    # the rewritten docs must rank for 'fresh' and no longer for 'hot'
    hit_docs = {d for d, _, _ in want}
    assert 0 in hit_docs and 12 in hit_docs
    hot_only = {
        r["doc_id"]
        for r in query_index(compacted, ["hot"], 20).collect()
    }
    assert not hot_only & {0, 12, 24, 36, 48}, "rewritten docs kept 'hot'"


def test_ranked_pipeline_to_serving_composes(spark):
    """The RANKED twin of the lifecycle: scored build → scored delta →
    apply_delta → flatten → TF-IDF serving, pinned against a
    from-scratch flat scored_index over the merged corpus. Pins that
    the tf-carrying family composes end to end exactly like the
    boolean one."""
    from slacken_spark.functions.inverted import (
        delta_scored_index,
        flatten_scored_segments,
        query_index_ranked,
        scored_index,
    )

    docs = _corpus(spark)
    toks = F.split(F.col("text"), " ")
    keep = exact_dedup(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    clean = docs.join(keep, "doc_id", "left_semi")

    idx = scored_index(clean, toks, segment_rows=10)
    upd = clean.where(F.col("doc_id") % 12 == 0).select(
        "doc_id", F.lit("fresh fresh term only").alias("text")
    )
    delta = delta_scored_index(clean, upd, toks, segment_rows=10)
    patched = apply_delta(idx, delta)

    merged = clean.join(upd.select("doc_id"), "doc_id", "left_anti").unionByName(
        upd
    )
    n = merged.count()
    fresh = scored_index(merged, toks)
    want = [
        (r["doc_id"], r["score"], r["rank"])
        for r in query_index_ranked(fresh, ["hot", "fresh"], 8, n).collect()
    ]
    got = [
        (r["doc_id"], r["score"], r["rank"])
        for r in query_index_ranked(
            flatten_scored_segments(patched), ["hot", "fresh"], 8, n
        ).collect()
    ]
    assert got == want
    # tf matters: 'fresh' appears twice in each rewritten doc, so the
    # rewritten docs outscore any single-occurrence match
    assert {d for d, _, _ in want[:5]} >= {0, 12, 24, 36, 48}
