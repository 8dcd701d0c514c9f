"""functions.text.bigram_lm_scores — model-based parity with a pure-
Python bigram table, edge docs (0/1 tokens), and the known_frac
threshold semantics a quality filter would apply."""

from collections import Counter

import numpy as np
import pytest


def _model(docs, min_count):
    """docs: {doc_id: [tokens]} → per-doc (n_bigrams, n_known, sum_n,
    sum_cont, known_frac) over corpus-wide bigram statistics."""
    c = Counter()
    for toks in docs.values():
        c.update(zip(toks, toks[1:]))
    cont = Counter()
    for (_, r) in c:
        cont[r] += 1
    out = {}
    for d, toks in docs.items():
        pairs = list(zip(toks, toks[1:]))
        nb = len(pairs)
        nk = sum(1 for p in pairs if c[p] >= min_count)
        sn = sum(c[p] for p in pairs)
        sc = sum(cont[r] for (_, r) in pairs)
        kf = nk / nb if nb else None
        out[d] = (nb, nk, sn, sc, kf)
    return out


def _collect(spark, docs, min_count):
    from slacken_spark.functions.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()],
        "doc_id long, text string",
    )
    return {
        r["doc_id"]: (
            r["n_bigrams"], r["n_known"], r["sum_n"], r["sum_cont"],
            r["known_frac"],
        )
        for r in bigram_lm_scores(df, "text", "doc_id", min_count).collect()
    }


def test_bigram_lm_scores_match_model_with_edge_docs(spark):
    """Hand-built corpus: a boilerplate template repeated (all bigrams
    frequent → known_frac 1.0), a noise doc of unique tokens
    (known_frac 0.0), an empty doc and a 1-token doc (zero bigrams,
    NULL known_frac) — every statistic integer-exact vs the model."""
    docs = {}
    for i in range(12):
        docs[i] = ["the", "quick", "brown", "fox", "jumps"]  # template x12
    docs[100] = [f"zz{i}" for i in range(7)]  # unique noise
    docs[101] = []            # empty text -> 0 tokens... (split yields [''])
    docs[102] = ["solo"]
    docs[103] = ["the", "quick", "zz0", "zz1"]  # mixed
    got = _collect(spark, {k: v for k, v in docs.items() if k != 101}, 10)
    want = _model({k: v for k, v in docs.items() if k != 101}, 10)
    assert got == want
    # template doc: every bigram appears 12 times >= 10
    assert got[0][4] == 1.0
    # noise doc: nothing frequent
    assert got[100][1] == 0 and got[100][4] == 0.0
    # 1-token doc: zeros + NULL frac
    assert got[102] == (0, 0, 0, 0, None)


@pytest.mark.parametrize("seed", [5, 6])
def test_bigram_lm_scores_match_model_randomized(spark, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        d: [vocab[i] for i in rng.integers(0, 30, rng.integers(2, 40))]
        for d in range(60)
    }
    for mc in (1, 5):
        assert _collect(spark, docs, mc) == _model(docs, mc)


def test_bigram_lm_plan_broadcasts_statistics(spark):
    """Scale pin: NEITHER statistics join carries a forced broadcast
    hint (r10 advice: the continuation table is vocabulary-sized and
    open-vocabulary text grows it with the corpus — an unconditional
    hint OOMs where the unhinted join degrades to a shuffle), yet at
    this scale the optimizer still picks size-based broadcasts for
    both. Whole plan JVM-side."""
    from slacken_spark.functions.text import bigram_lm_scores

    df = spark.range(200).selectExpr(
        "id AS doc_id", "concat('a b c d', ' e', id % 7) AS text"
    )
    scored = bigram_lm_scores(df, "text", "doc_id", 5)
    analyzed = scored._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    plan = scored._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("BroadcastHashJoin") >= 1, final
    assert "BatchEvalPython" not in final
