"""Query catalog, part 2g: CONTENT-DEFINED CHUNKING — the
storage-level dedup primitive (functions.chunking) and its
cross-snapshot diff. Registers into the same QUERIES registry as the
other catalog modules.

The oracle SQL replays the rolling-hash boundary scan position by
position (everything is integer arithmetic on code points, so DuckDB
reproduces the EXACT boundary set); the polynomial weights are inlined
from the one ``cdc_weights`` definition the kernel itself uses — the
engine and the oracle cannot drift. Per the one-gating-member-per-
family capacity rule (NOTES r11), ``doc_cdc_chunks`` hash-gates every
chunk of the family and ``corpus_cdc_snapshot_diff`` gates the
cross-snapshot claim; ``cdc_dedup_stats`` stays pytest-grade (its
stats are one aggregate over the rows doc_cdc_chunks gates exactly —
the hll_estimate precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.functions import chunking as CH
from slacken_spark.plans.catalog import register, tp

# the polynomial weights, inlined as a DuckDB list literal from the
# kernel's own definition (base 257 mod 2^31, window 16). NOTE the
# BIGINT cast on ord() in the CTE below — DuckDB multiplies INT32
# literals in INT32 and would overflow.
_W16 = ", ".join(str(w) for w in CH.cdc_weights(16))


def _cdc_cte(p: str, src: str) -> str:
    """CTE chain replaying the CDC scan over relation ``src`` with
    every CTE name prefixed by ``p`` (so two snapshots can be chunked
    in ONE statement): h(i) = Σ_j code(i−j)·257^j mod 2^31 over the
    window ending at 0-based position i, a cut after i iff
    h % 64 == 0 and the cut is interior. Produces ``{p}hashed``
    (doc_id, chunk_ord, start, length, chunk_hash).

    Cross-engine character semantics verified (r12): DuckDB's
    length/substr/ord count CODE POINTS exactly like Python and the
    utf-32 kernel — length('e'+combining acute)=2, substr slices the
    combining mark alone, ord of an astral char returns the code
    point — so parity holds on non-BMP and combining-mark text, not
    just the fixture's alphabet (test_cdc_handles_astral_codepoints
    pins the engine side against the Python model)."""
    return f"""
    {p}d AS MATERIALIZED (
        SELECT doc_id, text, length(text) AS n FROM {src}
        WHERE text IS NOT NULL AND length(text) > 0),
    {p}hpos AS (
        SELECT doc_id, n, i,
               list_sum(list_transform(range(0, 16),
                   j -> CAST(ord(substr(text, CAST(i - j + 1 AS INT), 1))
                             AS BIGINT)
                        * ([{_W16}][CAST(j + 1 AS INT)]))) % 2147483648
                 AS h
        FROM (SELECT doc_id, text, n,
                     CAST(unnest(range(15, n)) AS INT) AS i FROM {p}d)),
    {p}cuts AS (SELECT doc_id, i + 1 AS cut FROM {p}hpos
                WHERE h % 64 = 0 AND i + 1 < n),
    {p}starts AS (SELECT doc_id, 0 AS s FROM {p}d
                  UNION ALL SELECT doc_id, cut FROM {p}cuts),
    {p}chunks AS (
        SELECT st.doc_id,
               row_number() OVER (PARTITION BY st.doc_id ORDER BY st.s)
                 - 1 AS chunk_ord,
               st.s AS start,
               coalesce(lead(st.s) OVER (PARTITION BY st.doc_id
                                         ORDER BY st.s),
                        d.n) - st.s AS length
        FROM {p}starts st JOIN {p}d d USING (doc_id)),
    {p}hashed AS (
        SELECT c.doc_id, c.chunk_ord, c.start, c.length,
               md5(substr(d.text, CAST(c.start + 1 AS INT),
                          CAST(c.length AS INT))) AS chunk_hash
        FROM {p}chunks c JOIN {p}d d USING (doc_id))"""


@register(
    "doc_cdc_chunks",
    f"""
    WITH {_cdc_cte('', 'documents')}
    SELECT doc_id, CAST(chunk_ord AS BIGINT) AS chunk_ord,
           CAST(start AS BIGINT) AS start,
           CAST(length AS BIGINT) AS length,
           chunk_hash
    FROM hashed
    """,
)
def doc_cdc_chunks(spark, sf_dir):
    """Content-defined chunk spans + portable chunk hashes per document
    (functions.chunking.cdc_chunk_hashes, window 16 / divisor 64):
    boundaries where the rolling polynomial hash of the trailing 16
    code points hits ``h % 64 == 0``, so an edit only perturbs the
    chunks overlapping it and the rest of the document re-aligns — the
    shift-invariance fixed windows (doc_chunks) cannot provide
    (test-pinned: ≥70% of chunk hashes survive a front insertion where
    fixed 64-char windows share <10%). This entry hash-gates EVERY
    chunk of the family; cdc_dedup_stats is one aggregate over these
    rows and stays pytest-grade by the capacity rule.

    Scale shape: the boundary scan is ONE Arrow-batched mapInPandas
    numpy-convolution pass where the documents already live
    (plan-pinned: zero Exchange, no per-row Python); chunk text never
    crosses the Python boundary — hashes are JVM-side md5(substring)
    after an id join. Per-character work is the honest cost of CDC
    (10× docs = 4.5× wall, kernel-bound, no shuffle growth)."""
    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    return CH.cdc_chunk_hashes(docs, "text", "doc_id", 16, 64)


@register(
    "corpus_cdc_snapshot_diff",
    f"""
    WITH merged AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN doc_id % 50 = 0
                    THEN 'v2update ' || substr(text, 1, 40) || ' ' || text
                    ELSE text END AS text
        FROM documents),
    {_cdc_cte('b', 'documents')},
    {_cdc_cte('m', 'merged')},
    bset AS (SELECT DISTINCT chunk_hash, 1 AS in_base FROM bhashed),
    mocc AS (SELECT chunk_hash, CAST(count(*) AS BIGINT) AS nn,
                    CAST(min(length) AS BIGINT) AS len
             FROM mhashed GROUP BY chunk_hash),
    j AS (SELECT mocc.nn, mocc.len, bset.in_base
          FROM mocc LEFT JOIN bset USING (chunk_hash))
    SELECT CAST(sum(CASE WHEN in_base IS NULL THEN nn ELSE 0 END)
                AS BIGINT) AS new_chunks,
           CAST(sum(CASE WHEN in_base IS NULL THEN 0 ELSE nn END)
                AS BIGINT) AS shared_chunks,
           CAST(sum(CASE WHEN in_base IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS new_distinct,
           CAST(sum(CASE WHEN in_base IS NULL THEN len ELSE 0 END)
                AS BIGINT) AS new_chars,
           CAST(sum(CASE WHEN in_base IS NULL THEN 0 ELSE nn * len END)
                AS BIGINT) AS shared_chars
    FROM j
    """,
)
def corpus_cdc_snapshot_diff(spark, sf_dir):
    """Cross-snapshot storage cost at CHUNK granularity
    (functions.chunking.cdc_snapshot_diff): of the new crawl's chunks,
    how many occurrences / distinct hashes / characters already exist
    in the base snapshot's chunk store vs must be stored anew — the
    question doc-level corpus_diff OVERSTATES whenever documents are
    EDITED rather than replaced (an edited doc is 100% new to a doc
    diff; here only edit-adjacent chunks are — the sf0.01 row itself
    is the demo: editing every 50th doc by a front insertion costs a
    handful of new distinct chunks against ~150k shared characters).
    Fixture: every 50th doc gets a 'v2update <head> ' PREFIX with the
    full text retained (the doc_heavy_hitters_delta convention, but
    non-destructive so the tail re-aligns — the CDC advantage).

    Scale shape: two shuffle-free span-kernel passes (one per
    snapshot), each side reduces on a chunk-hash-keyed partial agg,
    and the membership check is ONE left join of already-distinct
    hash sets (chunk-store-sized, not corpus-sized)."""
    docs = tp(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(
                F.lit("v2update "),
                F.substring("text", 1, 40),
                F.lit(" "),
                F.col("text"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return CH.cdc_snapshot_diff(docs, new, "text", "doc_id", 16, 64)
