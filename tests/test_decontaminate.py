"""contamination_overlap at realistic n-gram sizes (the catalog entry
runs n=3 because gate docs are short; real decontamination uses ~8)."""

from pyspark.sql import functions as F

from slacken_spark.functions.dedup import contamination_overlap


def test_eight_gram_overlap_and_clean_docs(spark):
    bench = "the quick brown fox jumps over the lazy dog tonight"
    train_rows = [
        # contains the benchmark's full 8-gram span → flagged
        (1, "intro text " + bench + " closing words"),
        # shares only a 7-gram prefix (8th word differs) → clean at n=8
        (2, "the quick brown fox jumps over the sleepy cat"),
        # disjoint → clean
        (3, "completely different content with no shared spans at all"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame([(100, bench)], "doc_id long, text string")

    flagged = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_overlap(train, ev, "text", "doc_id", n=8).collect()
    }
    assert set(flagged) == {1}
    # bench has 10 tokens → 3 distinct 8-grams, all present inside doc 1
    assert flagged[1] == 3

    # broadcast off must give identical results (plan-only difference)
    flagged2 = {
        r["doc_id"]: r["n_shared"]
        for r in contamination_overlap(
            train, ev, "text", "doc_id", n=8, broadcast_eval=False
        ).collect()
    }
    assert flagged2 == flagged

    # at n=3 the near-miss doc shares leading 3-grams and gets flagged
    at3 = {
        r["doc_id"]
        for r in contamination_overlap(train, ev, "text", "doc_id", n=3).collect()
    }
    assert at3 == {1, 2}
