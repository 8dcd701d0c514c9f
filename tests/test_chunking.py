"""functions.chunking — content-defined chunking: model parity with a
pure-Python rolling-hash reference, the shift-invariance property that
is CDC's whole point, JVM-side hashing, and plan shape."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from slacken_spark.functions.chunking import (
    CDC_BASE,
    CDC_MOD,
    cdc_chunk_hashes,
    cdc_chunk_spans,
    cdc_dedup_stats,
    cdc_weights,
)


def _model_spans(text, window, divisor):
    """Pure-Python reference: h(i) = Σ_j code(i−j)·base^j mod 2^31,
    boundary after i iff h % divisor == 0 and the cut is interior."""
    n = len(text)
    if n == 0:
        return []
    starts = [0]
    for i in range(window - 1, n):
        h = (
            sum(
                ord(text[i - j]) * pow(CDC_BASE, j, CDC_MOD)
                for j in range(window)
            )
            % CDC_MOD
        )
        if h % divisor == 0 and i + 1 < n:
            starts.append(i + 1)
    return [
        (k, s, (starts[k + 1] if k + 1 < len(starts) else n) - s)
        for k, s in enumerate(starts)
    ]


def _rand_text(rng, n):
    # mixed-case words + punctuation + a couple of non-ASCII code
    # points (the kernel hashes CODE POINTS so substr-char indexing
    # agrees across engines)
    alphabet = list("abcdefgh XYZ.,!\n") + ["é", "Ж"]
    return "".join(alphabet[i] for i in rng.integers(0, len(alphabet), n))


def test_cdc_spans_match_model(spark):
    rng = np.random.default_rng(7)
    docs = {i: _rand_text(rng, int(rng.integers(0, 400))) for i in range(40)}
    docs[100] = ""          # empty: no rows
    docs[101] = "short"     # shorter than the window: one chunk
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {}
    for r in cdc_chunk_spans(df, "text", "doc_id", 16, 64).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_ord"], r["start"], r["length"])
        )
    for did, txt in docs.items():
        want = _model_spans(txt, 16, 64)
        assert sorted(got.get(did, [])) == want, f"doc {did}"
    assert 100 not in got
    assert got[101] == [(0, 0, 5)]
    # chunks partition each text
    for did, spans in got.items():
        spans = sorted(spans)
        assert spans[0][1] == 0
        for (o1, s1, l1), (o2, s2, _) in zip(spans, spans[1:]):
            assert s1 + l1 == s2 and o2 == o1 + 1
        assert spans[-1][1] + spans[-1][2] == len(docs[did])


def test_cdc_shift_invariance(spark):
    """THE selling point vs fixed windows: an insertion near the front
    perturbs only the chunks overlapping it — the tail re-aligns and
    re-shares its chunk hashes. Fixed windows would share ~none."""
    rng = np.random.default_rng(11)
    base = _rand_text(rng, 4000)
    edited = base[:97] + "INSERTED BYTES " + base[97:]
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunk_hashes(df, "text", "doc_id", 16, 64).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.7, f"only {shared:.0%} of chunks re-aligned"
    # and the fixed-window strawman really does lose the tail: chunks
    # at fixed 64-char offsets share nothing after the insertion point
    fixed1 = {base[i : i + 64] for i in range(0, len(base), 64)}
    fixed2 = {edited[i : i + 64] for i in range(0, len(edited), 64)}
    assert len(fixed1 & fixed2) / len(fixed1) < 0.1


def test_cdc_hashes_are_portable_md5(spark):
    rng = np.random.default_rng(13)
    txt = _rand_text(rng, 500)
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    for r in cdc_chunk_hashes(df, "text", "doc_id", 16, 64).collect():
        piece = txt[r["start"] : r["start"] + r["length"]]
        assert r["chunk_hash"] == hashlib.md5(piece.encode()).hexdigest()


def test_cdc_dedup_stats_count_surplus_copies(spark):
    """Three identical docs + one unique: every chunk of the two
    surplus copies is a duplicate, and dup_chars counts their
    characters exactly."""
    rng = np.random.default_rng(17)
    a, b = _rand_text(rng, 3000), _rand_text(rng, 1000)
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, a), (4, b)], "doc_id long, text string"
    )
    row = cdc_dedup_stats(df, "text", "doc_id", 16, 64).collect()[0]
    spans = cdc_chunk_spans(
        spark.createDataFrame([(1, a)], "doc_id long, text string"),
        "text", "doc_id", 16, 64,
    ).collect()
    n_a = len(spans)
    assert row["dup_chunks"] == 2 * n_a
    assert row["dup_chars"] == 2 * len(a)
    assert row["n_chunks"] == row["n_distinct"] + row["dup_chunks"]


def test_cdc_dedup_stats_first_length_invariant(spark):
    """cdc_dedup_stats takes ``F.first("length")`` per chunk_hash group
    — sound ONLY because equal md5 ⇒ equal chunk text ⇒ equal length
    (the r12 nondeterminism sweep's checklist). This pins the data
    invariant executable: across a corpus with heavy cross-document
    chunk sharing, every chunk_hash group is length-constant. A future
    edit that weakens the hash or adds a length-varying column to the
    group breaks HERE, not as a silent nondeterministic stat."""
    rng = np.random.default_rng(23)
    shared = _rand_text(rng, 800)
    docs = [
        (i, _rand_text(rng, 200) + shared + _rand_text(rng, 200))
        for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    per_hash = (
        cdc_chunk_hashes(df, "text", "doc_id", 16, 64)
        .groupBy("chunk_hash")
        .agg(F.countDistinct("length").alias("nl"), F.count(F.lit(1)).alias("n"))
    )
    assert per_hash.where("nl != 1").count() == 0
    # the fixture must actually exercise sharing (groups with n > 1)
    assert per_hash.where("n > 1").count() > 0


def test_cdc_all_empty_partition_yields_no_frame(spark):
    """A partition holding ONLY empty/NULL texts must yield nothing
    from the kernel (an all-object-dtype empty pandas frame fails the
    Arrow cast to the declared schema) — r11 self-review edge."""
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "")], "doc_id long, text string"
    ).repartition(3)
    assert cdc_chunk_spans(df, "text", "doc_id").count() == 0


def test_cdc_validation_and_plan(spark, sf_dir):
    with pytest.raises(ValueError, match="window"):
        cdc_chunk_spans(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "text", "doc_id", window=0,
        )
    with pytest.raises(ValueError, match="divisor"):
        cdc_chunk_spans(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "text", "doc_id", divisor=0,
        )
    # int64 convolution headroom: window > 2048 would WRAP in numpy and
    # silently diverge from the oracle — loud error instead (r11 advice)
    with pytest.raises(ValueError, match="2048"):
        cdc_chunk_spans(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            "text", "doc_id", window=2049,
        )
    # reserved output names: an id/text column named chunk_ord / start /
    # length / chunk_hash would produce a duplicate-name schema — the
    # repo-standard _reserve error fires instead (r11 advice)
    clash = spark.createDataFrame([(1, "x")], "start long, text string")
    with pytest.raises(ValueError, match="reserved"):
        cdc_chunk_spans(clash, "text", "start")
    clash2 = spark.createDataFrame(
        [(1, "x")], "doc_id long, chunk_hash string"
    )
    with pytest.raises(ValueError, match="reserved"):
        cdc_chunk_hashes(clash2, "chunk_hash", "doc_id")
    from slacken_spark.plans.catalog import t

    docs = t(spark, sf_dir, "documents")
    spans = cdc_chunk_spans(docs, "text", "doc_id")
    plan = spans._jdf.queryExecution().executedPlan().toString()
    # the boundary scan is map-only Arrow (no shuffle, no per-row python)
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan
    stats = cdc_dedup_stats(docs, "text", "doc_id")
    splan = stats._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in splan
    r = stats.collect()[0]
    assert r["n_chunks"] > 0 and r["n_distinct"] <= r["n_chunks"]


def test_cdc_kernel_is_arrow_batch_shape_invariant(spark):
    """The r12 batched kernel concatenates a whole Arrow batch before
    ONE convolution, so windows straddle document boundaries and must
    be masked out — the output can depend on HOW pandas batches the
    rows only if that mask is wrong. Adversarial arrangement
    (straddle-prone neighbors: long/empty/1-char/window-length/short
    docs interleaved, plus string ids) compared across
    maxRecordsPerBatch settings and against the pure-Python model."""
    rng = np.random.default_rng(31)
    docs = [
        ("a", _rand_text(rng, 900)),
        ("b", ""),
        ("c", "x"),
        ("d", _rand_text(rng, 16)),   # exactly the window
        ("e", _rand_text(rng, 700)),
        ("f", "ab"),
        ("g", _rand_text(rng, 15)),   # one short of the window
        ("h", _rand_text(rng, 300)),
        ("i", None),
        ("j", _rand_text(rng, 17)),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf, None)
    try:
        results = []
        for batch_rows in ("2", "3", "10000"):
            spark.conf.set(conf, batch_rows)
            rows = sorted(
                (r["doc_id"], r["chunk_ord"], r["start"], r["length"])
                for r in cdc_chunk_spans(
                    df.coalesce(1), "text", "doc_id", 16, 64
                ).collect()
            )
            results.append(rows)
        assert results[0] == results[1] == results[2]
    finally:
        if old is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, old)
    want = sorted(
        (did, k, s, ln)
        for did, txt in docs
        if txt
        for k, s, ln in _model_spans(txt, 16, 64)
    )
    assert results[0] == want
    # the memory-bounding sub-slice path (slice_chars caps the chars
    # per encode+convolve; a doc longer than the cap processes whole):
    # forcing ~2-doc slices must not change a single span
    sliced = sorted(
        (r["doc_id"], r["chunk_ord"], r["start"], r["length"])
        for r in cdc_chunk_spans(
            df, "text", "doc_id", 16, 64, slice_chars=40
        ).collect()
    )
    assert sliced == want


def test_cdc_batch_spans_hypothesis_fuzz():
    """Property fuzz of the batched span assembly (_batch_spans —
    module-level exactly so this can run WITHOUT a Spark job per
    example): arbitrary unicode documents (astral planes included),
    arbitrary small windows/divisors, output must equal the pure-Python
    per-document model — the straddle mask, searchsorted attribution,
    and repeat/cumsum assembly have no failure mode the model
    wouldn't expose."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from slacken_spark.functions.chunking import _batch_spans, cdc_weights

    text_st = st.text(
        alphabet=st.characters(
            min_codepoint=1, max_codepoint=0x10FFFF,
            exclude_categories=("Cs",),  # no lone surrogates
        ),
        min_size=1,
        max_size=120,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        texts=st.lists(text_st, min_size=1, max_size=6),
        window=st.integers(min_value=1, max_value=24),
        divisor=st.integers(min_value=1, max_value=16),
    )
    def check(texts, window, divisor):
        dids = list(range(len(texts)))
        weights = np.array(cdc_weights(window), dtype=np.int64)
        pdf = _batch_spans(dids, texts, "doc_id", window, divisor, weights)
        got = sorted(
            zip(pdf["doc_id"], pdf["chunk_ord"], pdf["start"], pdf["length"])
        )
        want = sorted(
            (did, k, s, ln)
            for did, txt in zip(dids, texts)
            for k, s, ln in _model_spans(txt, window, divisor)
        )
        assert got == want

    check()


def test_cdc_handles_astral_codepoints_and_diff_identity(spark):
    """Non-BMP characters (surrogate pairs in UTF-16, single code
    points in Python/utf-32/DuckDB) must hash and SLICE by code point
    so engine spans agree — and a snapshot diffed against itself must
    be 100% shared (the identity the storage accounting hinges on)."""
    from slacken_spark.functions.chunking import cdc_snapshot_diff

    rng = np.random.default_rng(37)
    base = _rand_text(rng, 600)
    # sprinkle astral-plane chars (musical G-clef, emoji, CJK ext B)
    astral = list("𝄞🎵😀𪚥")
    chars = list(base)
    for k, pos in enumerate(rng.integers(0, len(chars), 40)):
        chars[pos] = astral[k % len(astral)]
    txt = "".join(chars)
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    got = sorted(
        (r["chunk_ord"], r["start"], r["length"])
        for r in cdc_chunk_spans(df, "text", "doc_id", 16, 64).collect()
    )
    assert got == _model_spans(txt, 16, 64)
    # hashes slice by code point: md5 of the python slice must match
    for r in cdc_chunk_hashes(df, "text", "doc_id", 16, 64).collect():
        piece = txt[r["start"] : r["start"] + r["length"]]
        assert r["chunk_hash"] == hashlib.md5(piece.encode()).hexdigest()
    # diff identity: a snapshot vs itself stores nothing new
    row = cdc_snapshot_diff(df, df, "text", "doc_id", 16, 64).collect()[0]
    assert row["new_chunks"] == 0 and row["new_distinct"] == 0
    assert row["new_chars"] == 0 and row["shared_chunks"] == len(got)


def test_cdc_snapshot_diff_matches_model_and_beats_doc_diff(spark):
    """Cross-snapshot chunk diff: exact counts vs the pure-Python model,
    and the CDC advantage itself — an edited doc contributes only the
    chunks overlapping the edit as new bytes, not its whole length."""
    from slacken_spark.functions.chunking import cdc_snapshot_diff

    rng = np.random.default_rng(29)
    base_docs = {i: _rand_text(rng, 2500) for i in range(8)}
    new_docs = dict(base_docs)
    # edit two docs (front insertion), add one brand-new doc
    new_docs[0] = "EDIT " + base_docs[0]
    new_docs[3] = base_docs[3][:50] + "XX" + base_docs[3][50:]
    new_docs[99] = _rand_text(rng, 2500)

    def hashes(docs):
        out = []
        for txt in docs.values():
            for _, s, ln in _model_spans(txt, 16, 64):
                out.append(
                    (hashlib.md5(txt[s : s + ln].encode()).hexdigest(), ln)
                )
        return out

    base_set = {h for h, _ in hashes(base_docs)}
    new_occ = hashes(new_docs)
    want_new_chunks = sum(1 for h, _ in new_occ if h not in base_set)
    want_shared = len(new_occ) - want_new_chunks
    new_distinct = {}
    for h, ln in new_occ:
        if h not in base_set:
            new_distinct.setdefault(h, ln)
    bdf = spark.createDataFrame(
        list(base_docs.items()), "doc_id long, text string"
    )
    ndf = spark.createDataFrame(
        list(new_docs.items()), "doc_id long, text string"
    )
    row = cdc_snapshot_diff(bdf, ndf, "text", "doc_id", 16, 64).collect()[0]
    assert row["new_chunks"] == want_new_chunks
    assert row["shared_chunks"] == want_shared
    assert row["new_distinct"] == len(new_distinct)
    assert row["new_chars"] == sum(new_distinct.values())
    # CDC advantage: the two EDITED docs cost far less than their full
    # length (a doc-level diff would charge all ~5000 chars + the new
    # doc); only the new doc + edit-adjacent chunks are new bytes
    assert row["new_chars"] < 2500 + 1200
