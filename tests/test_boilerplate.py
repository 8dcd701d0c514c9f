"""boilerplate_scrub: hand-checkable fixtures for span coverage,
reassembly order, the untouched path, and the fully-scrubbed path."""

from pyspark.sql import functions as F

from slacken_spark.functions.text import boilerplate_scrub


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_frequent_span_removed_and_order_preserved(spark):
    # "buy now" appears in 3/4 docs → frequent at min_df=3 (frac 0.75).
    rows = [
        (1, "alpha buy now beta"),
        (2, "buy now gamma"),
        (3, "delta epsilon buy now"),
        (4, "zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(boilerplate_scrub(df, "text", "doc_id", n=2, min_df_frac=0.75))
    assert out[1]["clean_text"] == "alpha beta"
    assert out[1]["n_kept"] == 2 and out[1]["n_removed"] == 2
    assert out[2]["clean_text"] == "gamma"
    assert out[3]["clean_text"] == "delta epsilon"
    # doc 4 shares no frequent gram → byte-identical text
    assert out[4]["clean_text"] == "zeta eta theta"
    assert out[4]["n_removed"] == 0


def test_overlapping_frequent_grams_cover_union_of_positions(spark):
    # "a b" and "b c" both frequent: doc "x a b c y" loses a, b, c once
    # each (covered-position DISTINCT — no double counting).
    rows = [
        (1, "x a b c y"),
        (2, "a b c"),
        (3, "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(boilerplate_scrub(df, "text", "doc_id", n=2, min_df_frac=1.0))
    assert out[1]["clean_text"] == "x y"
    assert out[1]["n_kept"] == 2 and out[1]["n_removed"] == 3
    # docs 2/3 are entirely boilerplate → empty but present
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
    assert out[2]["n_removed"] == 3


def test_no_gram_reaches_threshold_is_identity(spark):
    rows = [(i, f"unique{i} words{i} only{i}") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(boilerplate_scrub(df, "text", "doc_id", n=2, min_df_frac=0.5))
    for i, text in ((r[0], r[1]) for r in rows):
        assert out[i]["clean_text"] == text
        assert out[i]["n_removed"] == 0


def test_explicit_n_docs_matches_counted(spark):
    rows = [
        (1, "spam spam ham"),
        (2, "spam spam eggs"),
        (3, "other words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counted = _rows(boilerplate_scrub(df, "text", "doc_id", n=2, min_df_frac=0.6))
    explicit = _rows(
        boilerplate_scrub(df, "text", "doc_id", n=2, min_df_frac=0.6, n_docs=3)
    )
    assert counted == explicit
    # "spam spam" df=2 ≥ ceil(0.6*3)=2 → scrubbed from both docs
    assert counted[1]["clean_text"] == "ham"
    assert counted[3]["n_removed"] == 0


def test_tiny_corpus_does_not_scrub_everything(spark):
    # min_df floors at 2: on a 3-doc corpus with min_df_frac=0.04 a
    # floor of 1 would mark EVERY gram frequent and delete all text
    rows = [(1, "aa bb cc"), (2, "dd ee ff"), (3, "gg hh ii")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           boilerplate_scrub(df, "text", "doc_id", n=2, min_df_frac=0.04).collect()}
    # no gram is shared by >= 2 docs -> nothing removed
    assert all(v["n_removed"] == 0 for v in out.values())
    assert out[1]["clean_text"] == "aa bb cc"


def test_unigram_boilerplate_n1(spark):
    # n=1 must degenerate to single-token scrubbing, not crash
    rows = [(1, "spam alpha"), (2, "spam beta"), (3, "spam gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           boilerplate_scrub(df, "text", "doc_id", n=1, min_df_frac=1.0).collect()}
    assert out[1]["clean_text"] == "alpha"
    assert out[2]["clean_text"] == "beta"
    assert all(v["n_removed"] == 1 for v in out.values())
