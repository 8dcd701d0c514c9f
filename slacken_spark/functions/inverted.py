"""Inverted-index construction (retrieval-side posting lists).

One operator, two physical shapes controlled by ``segment_rows``:

- ``segment_rows=None`` (flat): one posting list per term, built by a
  single term-shuffle. Correct and minimal-shuffle, but a
  stopword-grade term's whole list reduces in ONE task — the classic
  hot-term skew at corpus scale.
- ``segment_rows=N`` (sharded): posting lists build per
  (term, doc-id-range segment of N rows), so a term that appears in
  EVERY document reduces across |docs|/N bounded tasks and no task
  ever holds more than N postings for one term. Readers merge
  segments in segment order — the ranges are disjoint and each
  segment's list is sorted, so concatenation IS the merged list.

Segments use exact integer floor division (``(id - pmod(id, N)) div
N``), not double division: floor semantics match engine-portable
``//`` and stay exact past 2^53 for hash-derived ids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segment_expr(id_col: str, segment_rows: int) -> Column:
    """Exact integer FLOOR-division range-segment key (matches
    engine-portable ``//``; stays exact past 2^53 for hash-derived
    ids) — THE segment scheme of the sharded index; delta maintenance
    must use the same one or its rebuilt lists patch the wrong rows."""
    return F.expr(
        f"({id_col} - pmod({id_col}, {segment_rows}L)) div {segment_rows}L"
    )


def inverted_index(
    docs: DataFrame,
    tokens: Column,
    id_col: str = "doc_id",
    segment_rows: int | None = None,
) -> DataFrame:
    """→ ``(term, df, postings)`` flat, or
    ``(term, segment, df_segment, postings)`` when ``segment_rows`` is
    set. ``tokens`` is the tokenization expression (array<string>)
    evaluated against ``docs``; postings are sorted doc-id arrays,
    de-duplicated per document."""
    e = docs.select(F.col(id_col), F.explode(tokens).alias("term")).distinct()
    if segment_rows is None:
        return e.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
    if segment_rows <= 0:
        raise ValueError(f"segment_rows must be positive: {segment_rows}")
    return (
        e.withColumn("segment", segment_expr(id_col, segment_rows))
        .groupBy("term", "segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_segment"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
    )


def postings_digest(postings: Column) -> Column:
    """md5 over the comma-joined sorted ids — the hash-gate shape for a
    posting list (engine-portable: DuckDB predicts it with string_agg
    ORDER BY)."""
    return F.md5(
        F.concat_ws(",", F.transform(postings, lambda d: d.cast("string")))
    )
