"""The SQL-unrolled BPE oracle vs the pure-Python reference trainer —
DuckDB-only (no Spark), targeting the subtle part: greedy left-to-right
merging of EQUAL-symbol runs ('aaaa' with pair (a,a) merges positions
1-2 and 3-4, never 2-3), which the SQL expresses as odd-rank-in-run
selection."""

import duckdb
import pytest

from slacken_spark.functions.bpe import bpe_train_reference
from slacken_spark.plans.catalog_docs import _bpe_apply_counts_sql, _bpe_merges_sql


def _merges_via_sql(texts, n_rounds):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    return con.execute(
        _bpe_merges_sql(n_rounds) + " ORDER BY merge_rank"
    ).fetchall()


@pytest.mark.parametrize(
    "texts",
    [
        # equal-pair runs: the greedy alternation case
        ["aaaa aaa aa a", "aaaaa"],
        # runs interacting with learned multi-char symbols
        ["abababab abab ab", "aabb aabb"],
        # mixed words, digits, punctuation (BPE_PATTERN segmentation)
        ["the cat sat on the mat", "the bat 123 cat! cat?"],
        # single chars and empty-ish docs
        ["a", "", "zz zz zz z"],
    ],
)
def test_sql_unrolled_merges_match_reference_trainer(texts):
    for n_rounds in (1, 3, 6):
        ref = bpe_train_reference(texts, n_rounds)
        got = [
            (lf, rt, int(cnt))
            for _rank, lf, rt, cnt in _merges_via_sql(texts, n_rounds)
        ]
        assert got == ref[: len(got)] and len(got) == len(ref[:n_rounds])


def test_sql_apply_counts_match_reference_apply():
    from slacken_spark.functions.bpe import bpe_apply_reference

    texts = ["aaaa abab the cat", "aaa", "", "the the the"]
    n_rounds = 4
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = dict(
        con.execute(
            _bpe_apply_counts_sql(n_rounds) + " ORDER BY doc_id"
        ).fetchall()
    )
    merges = bpe_train_reference(texts, n_rounds)
    expect = {
        i: bpe_apply_reference(t, merges) for i, t in enumerate(texts)
    }
    assert got == expect
