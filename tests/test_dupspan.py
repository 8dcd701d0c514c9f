"""dupspan_scrub: ownership semantics (lowest-id doc keeps the span),
coverage of overlapping duplicated grams, and the untouched path."""

from slacken_spark.functions.text import dupspan_scrub


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_owner_keeps_span_others_lose_it(spark):
    # the 3-gram "x y z" appears in docs 1 and 2 → doc 1 owns it
    rows = [
        (1, "a x y z b"),
        (2, "x y z c d"),
        (3, "unrelated words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(dupspan_scrub(df, "text", "doc_id", n=3))
    assert out[1]["clean_text"] == "a x y z b"
    assert out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "c d"
    assert out[2]["n_kept"] == 2 and out[2]["n_removed"] == 3
    assert out[3]["clean_text"] == "unrelated words only here"


def test_overlapping_dup_grams_cover_position_union(spark):
    # doc 2 repeats doc 1's whole text: every gram duplicated, and the
    # covered positions union to the full document (not double-counted)
    rows = [
        (1, "p q r s t"),
        (2, "p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(dupspan_scrub(df, "text", "doc_id", n=3))
    assert out[1]["clean_text"] == "p q r s t"
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 5


def test_within_doc_repetition_alone_is_not_duplication(spark):
    # the gram repeats INSIDE doc 1 only → df=1 → untouched
    rows = [
        (1, "m n o m n o"),
        (2, "different content entirely friend"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(dupspan_scrub(df, "text", "doc_id", n=3))
    assert out[1]["clean_text"] == "m n o m n o"
    assert out[1]["n_removed"] == 0


def test_owner_loses_other_grams_it_does_not_own(spark):
    # doc 2 owns nothing it shares with doc 1, but owns "k l m" vs doc 3
    rows = [
        (1, "a b c d"),
        (2, "a b c k l m"),
        (3, "k l m z z2 z3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = _rows(dupspan_scrub(df, "text", "doc_id", n=3))
    # doc 2 loses "a b c" (owned by doc 1) but keeps "k l m" (it owns)
    assert out[2]["clean_text"] == "k l m"
    # doc 3 loses "k l m" (owned by doc 2)
    assert out[3]["clean_text"] == "z z2 z3"


def test_random_corpora_match_python_model(spark):
    """Model-based check: dupspan_scrub ≡ a direct python reference on
    random small corpora with heavy cross-doc overlap."""
    import random

    def model(texts, n):
        toks = {i: t.split() for i, t in enumerate(texts)}
        owners = {}
        docs_of = {}
        for i, ts in toks.items():
            for p in range(len(ts) - n + 1):
                g = " ".join(ts[p : p + n])
                owners.setdefault(g, i)
                docs_of.setdefault(g, set()).add(i)
        out = {}
        for i, ts in toks.items():
            cov = set()
            for p in range(len(ts) - n + 1):
                g = " ".join(ts[p : p + n])
                if len(docs_of[g]) >= 2 and owners[g] != i:
                    cov.update(range(p, p + n))
            kept = [t for p, t in enumerate(ts) if p not in cov]
            out[i] = (" ".join(kept), len(kept), len(ts) - len(kept))
        return out

    rng = random.Random(7)
    vocab = [f"w{k}" for k in range(12)]
    for trial in range(5):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25)))
            for _ in range(8)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
            for r in dupspan_scrub(df, "text", "doc_id", n=3).collect()
        }
        assert got == model(texts, 3), f"trial {trial}"
