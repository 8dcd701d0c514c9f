"""Content-defined chunking (CDC) — the storage-level dedup primitive.

Fixed-window chunking (``doc_chunks``) moves every boundary after an
insertion, so two crawl snapshots of the same page share almost no
chunk hashes once one byte shifts. Content-DEFINED chunking cuts where
a rolling hash of the trailing ``window`` characters hits a divisor
residue (Rabin/LBFS lineage; FastCDC is the same idea with a gear
table), so boundaries are a function of LOCAL content: an edit only
perturbs the chunks that overlap it and the rest of the document
re-aligns — the property that makes chunk-hash dedup across snapshots
work, and the reason backup/dedup systems (and crawl-snapshot
pipelines) use CDC instead of fixed blocks.

Everything here is INTEGER arithmetic on code points (polynomial hash
mod 2^31, boundary iff ``h % divisor == 0``), so any engine reproduces
the exact boundary set — the DuckDB oracle replays it position by
position. Expected chunk length ≈ ``divisor`` characters.

Scale shape: the boundary scan is embarrassingly parallel — ONE
Arrow-batched ``mapInPandas`` pass over the documents (numpy
convolution per doc, no shuffle, the genomic ``batch_span_arrays``
convention), emitting only (id, ord, start, length) integers; chunk
TEXT never crosses the Python boundary — hashes are computed JVM-side
(``md5(substring(...))``) after a join back to the corpus, and the
dedup statistics reduce on one chunk-hash-keyed partial-agg shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CDC_BASE = 257
CDC_MOD = 1 << 31
# transient kernel memory is ~16 bytes/char (utf-32 codes + the int64
# convolution), so each processed slice is capped in CHARS — an Arrow
# batch of pathologically long documents degrades to several slices
# instead of one multi-GB allocation
CDC_SLICE_CHARS = 1 << 23  # ~128 MiB of transient int64 per slice

CHUNK_SCHEMA = "chunk_ord long, start long, length long"


def cdc_weights(window: int, base: int = CDC_BASE, mod: int = CDC_MOD):
    """``[base^j mod m for j in 0..window-1]`` — the polynomial weights,
    exported so the oracle SQL inlines the identical constants."""
    return [pow(base, j, mod) for j in range(window)]


def _batch_spans(dids: list, texts: list, id_col: str, window: int,
                 divisor: int, weights):
    """Span rows for one bounded slice of non-empty documents: ONE
    encode + ONE convolution over the concatenated codes (r11 verdict
    item 7) — windows STRADDLING a document boundary compute garbage
    that the per-doc validity mask (local position ≥ window−1 inside
    its own doc) filters out, and the span assembly is numpy
    repeat/cumsum arithmetic, no per-document Python loop. Module-level
    (not a kernel closure) so the hypothesis fuzz in test_chunking can
    drive it against the pure-Python model without a Spark job per
    example."""
    import numpy as np
    import pandas as pd

    codes = np.frombuffer(
        "".join(texts).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    lens = np.fromiter(
        (len(t) for t in texts), dtype=np.int64, count=len(texts)
    )
    offs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lens)])
    n_total = len(codes)
    if n_total >= window:
        conv = np.convolve(codes, weights)
        h = conv[window - 1 : n_total] % CDC_MOD
        # global end positions i of windows with h % divisor == 0
        hit = np.nonzero(h % divisor == 0)[0] + window - 1
    else:
        hit = np.empty(0, dtype=np.int64)
    d_idx = np.searchsorted(offs, hit, side="right") - 1
    local_i = hit - offs[d_idx]
    # window fully inside its doc AND the cut is interior
    ok = (local_i >= window - 1) & (local_i + 1 < lens[d_idx])
    hit_doc = d_idx[ok]
    cut_local = local_i[ok] + 1
    # hits are globally sorted, so hit_doc is nondecreasing and
    # cuts are in (doc, position) order already
    n_cuts = np.bincount(hit_doc, minlength=len(dids))
    chunk_counts = n_cuts + 1  # the implicit start-0 chunk
    total = int(chunk_counts.sum())
    first_pos = np.concatenate(
        [np.zeros(1, dtype=np.int64), np.cumsum(chunk_counts)[:-1]]
    )
    starts_all = np.zeros(total, dtype=np.int64)
    nonfirst = np.ones(total, dtype=bool)
    nonfirst[first_pos] = False
    starts_all[nonfirst] = cut_local
    ends_all = np.empty(total, dtype=np.int64)
    ends_all[:-1] = starts_all[1:]
    ends_all[first_pos + n_cuts] = lens
    ords_all = np.arange(total, dtype=np.int64) - np.repeat(
        first_pos, chunk_counts
    )
    ids_all = np.repeat(np.asarray(dids, dtype=object), chunk_counts)
    return pd.DataFrame(
        {
            id_col: pd.Series(ids_all),
            "chunk_ord": pd.Series(ords_all, dtype="int64"),
            "start": pd.Series(starts_all, dtype="int64"),
            "length": pd.Series(ends_all - starts_all, dtype="int64"),
        }
    )


def cdc_chunk_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 16,
    divisor: int = 64,
    slice_chars: int = CDC_SLICE_CHARS,
) -> DataFrame:
    """→ ``(id_col, chunk_ord, start, length)`` content-defined chunk
    spans per document (0-based ``start``, chunks partition the text).

    The rolling hash over the window ENDING at 0-based position ``i``
    is ``h(i) = (Σ_{j<window} code(i−j)·base^j) mod 2^31`` (code = the
    Unicode code point, so character indexing agrees with SQL
    ``substr`` on both engines); a boundary falls AFTER position ``i``
    iff ``h(i) % divisor == 0`` and the cut is interior (no empty
    trailing chunk). Documents shorter than ``window`` (or with no
    qualifying position) are one chunk; NULL/empty text emits no rows.

    Why a kernel and not SQL: the scan is per-CHARACTER — the honest
    cost of CDC — and Spark's array higher-order functions run
    interpreted per element (NOTES "Environment gotchas"), so the
    vectorized numpy convolution over Arrow batches is the hot path;
    it emits 4 integers per chunk and nothing else. No shuffle: chunk
    spans are computed where the documents already live.
    """
    import numpy as np

    from slacken_spark.operators.relational_ext import _reserve

    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    # int64 convolution headroom (see the weights comment below):
    # window·2^21·2^31 must stay under 2^63, so window above 2^11 would
    # WRAP in numpy and silently diverge from the pure-Python/SQL
    # oracle — fail loudly instead (r11 advice).
    if window > 2048:
        raise ValueError(
            f"window must be <= 2048 (int64 rolling-hash headroom): {window}"
        )
    if divisor < 1:
        raise ValueError(f"divisor must be >= 1: {divisor}")
    # the output schema appends chunk_ord/start/length next to id_col —
    # an id or text column NAMED one of those would emit a
    # duplicate-name schema instead of the repo's standard loud error
    _reserve(df.select(id_col, text_col), "chunk_ord", "start", "length")
    id_type = dict(df.dtypes)[id_col]
    # np.convolve(a, v)[i] = Σ_k a[k]·v[i−k]; with v[lag] = base^lag
    # that is exactly Σ_j codes[i−j]·base^j — the window ending at i.
    # int64 headroom: window·max_codepoint·mod ≈ 2^4·2^21·2^31 < 2^57.
    weights = np.array(cdc_weights(window), dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            dids, texts = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None or len(txt) == 0:
                    continue
                dids.append(did)
                texts.append(txt)
            if not dids:
                # a batch of only empty/NULL texts would build an
                # all-object-dtype empty frame that Arrow can't cast to
                # the declared schema — yield nothing instead
                continue
            # a single doc longer than the cap still processes whole
            # (its transient cost is its own)
            cap = slice_chars
            lo = 0
            while lo < len(dids):
                hi, tot = lo, 0
                while hi < len(dids) and (
                    hi == lo or tot + len(texts[hi]) <= cap
                ):
                    tot += len(texts[hi])
                    hi += 1
                yield _batch_spans(
                    dids[lo:hi], texts[lo:hi], id_col, window, divisor,
                    weights,
                )
                lo = hi

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, {CHUNK_SCHEMA}"
    )


def cdc_chunk_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 16,
    divisor: int = 64,
) -> DataFrame:
    """→ ``(id_col, chunk_ord, start, length, chunk_hash)`` — the spans
    plus the portable md5 hex of each chunk's text, computed JVM-SIDE
    (``md5(substring(...))`` over a join back to the corpus on
    ``id_col``) so chunk text never crosses the Python boundary and
    the hash is engine-portable (the doc_fingerprints convention)."""
    from slacken_spark.operators.relational_ext import _reserve

    _reserve(df.select(id_col, text_col), "chunk_hash")
    spans = cdc_chunk_spans(df, text_col, id_col, window, divisor)
    return spans.join(df.select(id_col, text_col), id_col).select(
        id_col,
        "chunk_ord",
        "start",
        "length",
        F.md5(
            F.expr(f"substring({text_col}, start + 1, length)")
        ).alias("chunk_hash"),
    )


def cdc_dedup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 16,
    divisor: int = 64,
) -> DataFrame:
    """Corpus chunk-level dedup statistics → one row
    ``(n_chunks, n_distinct, dup_chunks, dup_chars)``: how much of the
    corpus is REDUNDANT at sub-document granularity — the
    crawl-snapshot storage question exact-doc dedup can't answer
    (a boilerplate header shared by every page dedups here, not
    there). ``dup_chars`` counts characters in surplus copies
    (occurrences beyond each hash's first). One chunk-hash-keyed
    partial-agg shuffle over chunk-sized rows; the corpus itself is
    scanned once by the span kernel and once by the hash projection."""
    hashed = cdc_chunk_hashes(df, text_col, id_col, window, divisor)
    per_hash = hashed.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("length").alias("length"),
    )
    return per_hash.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("dup_chunks"),
        F.sum((F.col("n") - 1) * F.col("length"))
        .cast("long")
        .alias("dup_chars"),
    )


def cdc_snapshot_diff(
    base: DataFrame,
    new: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 16,
    divisor: int = 64,
) -> DataFrame:
    """Cross-snapshot storage cost at chunk granularity → one row
    ``(new_chunks, shared_chunks, new_distinct, new_chars,
    shared_chars)``: of the NEW snapshot's chunks, how many (and how
    many characters) already exist in the base snapshot's chunk store
    vs must be stored anew — THE question CDC chunking exists to
    answer ("this crawl re-fetched 50M pages; how much is actually new
    bytes?"), which doc-level ``corpus_diff`` overstates whenever
    documents are edited rather than replaced wholesale (an edited doc
    is 100% new to a doc-level diff; here only the chunks overlapping
    the edit are).

    Counting is by DISTINCT chunk hash on the new side (a chunk store
    keeps one copy): ``new_distinct``/``new_chars`` are the distinct
    new-side hashes absent from base and their one-copy character
    cost; ``new_chunks``/``shared_chunks`` count new-side chunk
    OCCURRENCES by membership, and ``shared_chars`` the re-used
    occurrence characters. Scale shape: two span-kernel passes (one
    per snapshot, each shuffle-free), chunk hashes reduce per side on
    a chunk-hash-keyed partial agg, and the membership check is ONE
    left join of the new side's distinct hashes against the base
    side's (both already hash-distinct — chunk-store-sized, not
    corpus-sized)."""
    b = (
        cdc_chunk_hashes(base, text_col, id_col, window, divisor)
        .select("chunk_hash")
        .distinct()
        .withColumn("_in_base", F.lit(1))
    )
    n = cdc_chunk_hashes(new, text_col, id_col, window, divisor).groupBy(
        "chunk_hash"
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("length").alias("_len"),
    )
    joined = n.join(b, "chunk_hash", "left")
    is_new = F.col("_in_base").isNull()
    return joined.agg(
        F.sum(F.when(is_new, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("new_chunks"),
        F.sum(F.when(is_new, 0).otherwise(F.col("_n")))
        .cast("long")
        .alias("shared_chunks"),
        F.sum(is_new.cast("long")).cast("long").alias("new_distinct"),
        F.sum(F.when(is_new, F.col("_len")).otherwise(0))
        .cast("long")
        .alias("new_chars"),
        F.sum(F.when(is_new, 0).otherwise(F.col("_n") * F.col("_len")))
        .cast("long")
        .alias("shared_chars"),
    )
