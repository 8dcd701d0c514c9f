"""Zone-map data skipping — per-shard min/max statistics and the
scan-pruning read path they enable.

This is the file-skipping index every warehouse table format carries
(parquet row-group stats, Delta/Iceberg file stats): the WRITE side
records ``(shard, n_rows, min, max)`` per layout shard in one
shard-keyed aggregation; the READ side consults those stats (a
shard-count-sized plan-time step, exactly like a format's driver-side
file pruning) and rewrites a range predicate into a SCAN-PUSHABLE
predicate over the layout column, so non-surviving shards' bytes are
never read.

Zone maps only prune when the LAYOUT correlates with the predicate —
stats over a hash-sharded table are vacuous (every shard spans the full
range). The catalog therefore builds them over a RANGE layout
(``layout_shard`` — exact floor division of the layout column, the
same integer-exact scheme as ``inverted.segment_expr``), the
clustering a real pipeline gets from range-partitioned writes or
Z-ordering (``events_zorder_layout`` is the multi-column analog).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def layout_shard(col: str, shard_width: int) -> Column:
    """Range-layout shard id: exact integer floor division of the
    layout column (matches engine-portable ``//``; exact past 2^53)."""
    return F.expr(f"({col} - pmod({col}, {shard_width}L)) div {shard_width}L")


def zone_maps(
    df: DataFrame, shard: Column, stat_cols: list[str]
) -> DataFrame:
    """Per-shard skipping stats → ``(shard, n_rows, min_<c>, max_<c>
    ...)``. ONE aggregation keyed on the shard id — shard-count-sized
    output (the stats table a format stores in its metadata layer);
    map-side partials collapse each task to shard cardinality before
    the single tiny shuffle."""
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(c).cast("long").alias(f"min_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"max_{c}"))
    return df.groupBy(shard.alias("shard")).agg(*aggs)


def surviving_shards(
    zmaps: DataFrame, stat_col: str, lo: int, hi: int
) -> list[int]:
    """Shard ids whose ``[min, max]`` envelope intersects ``[lo, hi]``
    — the shards a scan for ``stat_col BETWEEN lo AND hi`` must read.
    Collects the (shard-count-sized, corpus-size-independent) stats
    table to the driver: this is PLAN-TIME metadata pruning, the same
    driver-side step as a table format consulting its file-stats
    manifest before task planning."""
    rows = (
        zmaps.where(
            (F.col(f"min_{stat_col}") <= hi) & (F.col(f"max_{stat_col}") >= lo)
        )
        .select("shard")
        .collect()
    )
    return sorted(r["shard"] for r in rows)


def maintain_zone_maps(
    old_zm: DataFrame,
    base: DataFrame,
    batch: DataFrame,
    id_col: str,
    layout_col: str,
    shard_width: int,
    stat_cols: list[str],
) -> DataFrame:
    """Incrementally maintain a zone-map stats table under a CDC
    update batch — the stats-side twin of ``ivm.maintain_grouped_sums``
    for stats that are NOT self-inverting (a min/max cannot absorb a
    delete, so affected shards recompute instead of merge).

    ``old_zm`` is the stored stats table (``zone_maps`` output over
    ``base``); ``batch`` carries full replacement rows. Updated rows
    may CHANGE their layout value and therefore move shards, so the
    affected-shard set is the union of the changed rows' OLD shards
    (a broadcast semi-join of ``base`` on the batch ids — at scale the
    old layout values usually ride in the CDC record itself, making
    this lookup free) and their NEW shards (batch-sized). Stats for
    affected shards recompute from the merged corpus restricted by
    ``pruned_scan_predicate`` — the recompute SCAN is itself pruned by
    the ranges being maintained, so a batch touching k of n shards
    reads ~k/n of the table; untouched shards' rows pass through from
    ``old_zm`` without any scan. Shards emptied by the batch (all rows
    moved out) simply produce no recomputed row, exactly like a
    rebuild. The affected-shard set collects to the driver
    (shard-count-bounded plan-time metadata, same contract as
    ``surviving_shards``).

    The layout column must be NON-NULL on every changed row: a NULL
    layout has no shard, cannot be range-pruned, and would silently
    vanish from the passthrough filter — so it raises instead.
    """
    ids = batch.select(id_col)
    old_shards = (
        base.join(F.broadcast(ids), id_col, "left_semi")
        .select(layout_shard(layout_col, shard_width).alias("shard"))
        .distinct()
    )
    new_shards = batch.select(
        layout_shard(layout_col, shard_width).alias("shard")
    ).distinct()
    affected_raw = [
        r["shard"]
        for r in old_shards.unionByName(new_shards).distinct().collect()
    ]
    if any(s is None for s in affected_raw):
        raise ValueError(
            "maintain_zone_maps: NULL layout value in a changed row — "
            f"'{layout_col}' must be non-null (no shard, not prunable)"
        )
    affected = sorted(affected_raw)
    if not affected:  # empty batch: the stored stats are already exact
        return old_zm
    merged = base.join(F.broadcast(ids), id_col, "left_anti").unionByName(
        batch.select(*base.columns)
    )
    recomputed = zone_maps(
        merged.where(pruned_scan_predicate(affected, layout_col, shard_width)),
        layout_shard(layout_col, shard_width),
        stat_cols,
    )
    # null-safe NOT-IN: a NULL-layout row in the BASE yields a NULL
    # shard stats row that can never be affected (changed rows with a
    # NULL layout raise above) — plain ~isin() evaluates to NULL on it
    # and would silently drop it from the passthrough, breaking the
    # maintenance ≡ rebuild contract for bases with NULL layouts
    passthrough = old_zm.where(
        ~F.coalesce(F.col("shard").isin(affected), F.lit(False))
    )
    return passthrough.unionByName(recomputed)


def pruned_scan_predicate(
    shards: list[int], layout_col: str, shard_width: int
) -> Column:
    """Rewrite a surviving-shard set into a predicate on the LAYOUT
    COLUMN — plain range disjunctions on a stored column, which Spark
    pushes into the parquet scan (PushedFilters), so pruned shards'
    row groups are skipped by their own parquet stats. Adjacent shard
    ids merge into one range, keeping the predicate small even when
    most shards survive."""
    if not shards:
        return F.lit(False)
    runs: list[list[int]] = [[shards[0], shards[0]]]
    for s in shards[1:]:
        if s == runs[-1][1] + 1:
            runs[-1][1] = s
        else:
            runs.append([s, s])
    col = F.col(layout_col)
    pred = None
    for lo_s, hi_s in runs:
        r = (col >= lo_s * shard_width) & (col < (hi_s + 1) * shard_width)
        pred = r if pred is None else (pred | r)
    return pred
