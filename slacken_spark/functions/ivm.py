"""Incremental view maintenance (IVM) for grouped SUM/COUNT views.

The aggregate twin of the index-maintenance family: a materialized
per-group statistics view (counts, token sums — the dataset cards a
pipeline publishes) stays current under a CDC replacement batch
WITHOUT re-aggregating the corpus. SUM and COUNT are self-maintainable
(Gupta & Mumick, "Maintenance of Materialized Views", 1995): the
update's effect is (new contributions) − (old contributions), both
batch-sized, merged into the group-cardinality-sized view with one
full-outer join.

Cost at 100 TB: the batch aggregates map-side; the old rows fetch by a
BROADCAST semi-style join on the changed ids (with parquet/bucketed
storage that id predicate pushes into the scan); the view merge
touches |groups| rows. The corpus is never re-scanned for aggregation
— re-running the groupBy is exactly what this module exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def maintain_grouped_sums(
    view: DataFrame,
    base: DataFrame,
    upd: DataFrame,
    group_col: str,
    size: Column,
    id_col: str = "doc_id",
    count_col: str = "n_docs",
    sum_col: str = "n_tokens",
) -> DataFrame:
    """→ the maintained view ``(group_col, count_col, sum_col)`` after
    replacing ``upd``'s rows (keyed by ``id_col``) in ``base``;
    ``view`` is the pre-update materialization of
    ``base.groupBy(group_col).agg(count, sum(size))``. ``size`` is the
    summed expression, evaluated against a row of ``base``/``upd``.

    Handles group MOVES (an update that changes a row's group
    subtracts from the old group and adds to the new one — including
    groups the view has never seen) and group disappearance (a group
    whose count reaches zero leaves the view, matching a from-scratch
    rebuild). The ``source_stats_maintain`` catalog oracle pins
    maintained ≡ recomputed on a batch that does both.

    Invariant: ``upd``'s ids are replacements of EXISTING ``base``
    rows or inserts; each id appears at most once in ``upd``.
    """
    upd_ids = F.broadcast(upd.select(id_col).distinct())
    old = base.join(upd_ids, id_col, "left_semi")
    gk = F.col(group_col)
    neg = old.select(
        gk.alias("_g"), F.lit(-1).alias("_dn"), (-size).alias("_ds")
    )
    pos = upd.select(
        gk.alias("_g"), F.lit(1).alias("_dn"), size.alias("_ds")
    )
    delta = (
        neg.unionByName(pos)
        .groupBy("_g")
        .agg(
            F.sum("_dn").cast("long").alias("_dn"),
            F.sum("_ds").cast("long").alias("_ds"),
        )
    )
    merged = view.join(
        delta, view[group_col].eqNullSafe(delta["_g"]), "full_outer"
    ).select(
        F.coalesce(view[group_col], delta["_g"]).alias(group_col),
        (
            F.coalesce(view[count_col], F.lit(0))
            + F.coalesce(delta["_dn"], F.lit(0))
        ).cast("long").alias(count_col),
        (
            F.coalesce(view[sum_col], F.lit(0))
            + F.coalesce(delta["_ds"], F.lit(0))
        ).cast("long").alias(sum_col),
    )
    return merged.where(F.col(count_col) > 0)
