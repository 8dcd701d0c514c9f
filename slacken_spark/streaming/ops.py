"""Structured Streaming operators.

The reference engine is batch-only (SURVEY §1.3), but a 100 TB
training-data platform ingests continuously; this module provides the
streaming half of the engine as thin, testable compositions of
Structured Streaming primitives:

  - tumbling/sliding windowed aggregation with watermarked late-data
    handling (``F.window`` + ``withWatermark``);
  - gap-based session windows (``F.session_window`` — the streaming
    equivalent of operators/relational_ext.sessionize);
  - a custom stateful per-key operator via ``applyInPandasWithState``
    (running per-user counters), the pattern any bespoke streaming
    kernel (e.g. an online minimizer sketch) would follow;
  - a deterministic run-to-completion helper (``availableNow`` trigger +
    memory sink) so streaming plans are testable and oracle-comparable
    batch-for-batch.

Scale notes: watermarks bound state; session/window aggs shuffle once on
(key, window); state-store size is per-key-bounded, so the same plan
runs continuously on a 1000-executor cluster.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from slacken_spark.session import pin_eager as _pin_eager


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) window counts per key.

    Late rows beyond ``watermark`` are dropped; output schema:
    (window_start, window_end, key, n, value_sum).
    """
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "value_sum",
        )
    )


def session_windows(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation (streaming sessionize)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
            "value_sum",
        )
    )


def running_user_totals(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator: per-key running totals maintained in the
    state store across micro-batches via applyInPandasWithState.

    Emits one row per key per micro-batch in which the key appears:
    (key, n_events_total, value_total). This is the template for any
    bespoke streaming kernel the SQL surface can't express.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, n_events_total long, value_total double"
    state_schema = "n long, v double"

    def update(key, pdfs, state):
        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, v))
        import pandas as pd

        yield pd.DataFrame(
            {key_col: [key[0]], "n_events_total": [n], "value_total": [v]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_to_completion(
    result: DataFrame,
    output_mode: str = "complete",
    name: str | None = None,
    shuffle_partitions: int | None = None,
    state_store_provider: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame with the availableNow trigger into a
    memory sink and return the final table — deterministic, so streaming
    plans are testable against batch oracles.

    ``shuffle_partitions`` sizes the state store for THIS query (the
    partition count is frozen into the checkpoint at first start):
    stateful task count should track key cardinality and cluster size,
    not the session-wide batch setting — a handful for a small keyed
    stream, hundreds on a real cluster. Restored after the run.

    ``state_store_provider`` overrides the state-store backend for this
    run (e.g. :data:`ROCKSDB_PROVIDER`): at real state sizes RocksDB +
    changelog checkpointing is the scale answer (state spills off-heap,
    commits ship deltas). On this repo's gate data the state is tiny and
    the measured difference is inside machine noise (NOTES round 5), so
    the default stays the session's provider. Restored after the run.
    """
    import os
    import shutil
    import tempfile

    spark = result.sparkSession
    name = name or ("s_" + uuid.uuid4().hex[:12])
    prev = None
    prev_provider = None
    _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
    if state_store_provider is not None:
        prev_provider = spark.conf.get(_PROVIDER_KEY, None)
        spark.conf.set(_PROVIDER_KEY, state_store_provider)
    if shuffle_partitions is not None:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # A run-to-completion query's checkpoint is throwaway (offsets/state
    # die with the memory sink), so put it on the fastest local scratch
    # available — WAL/offset commits are pure fixed overhead here. A
    # real continuous deployment would pass its own durable checkpoint
    # via writeStream options instead of this helper.
    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt_dir = tempfile.mkdtemp(prefix="ss_ckpt_", dir=ckpt_base)
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", os.path.join(ckpt_dir, "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if state_store_provider is not None:
            if prev_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prev_provider)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return spark.table(name)


def file_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a file directory (the batch tables' streaming twin)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.format(fmt).load(path)


def classify_stream(index, read_stream: DataFrame, sink):
    """Streaming read classification: a continuously-arriving stream of
    (header, nucleotides) fragments classified against a STATIC bucketed
    minimizer-LCA index — a capability the (batch-only) reference lacks.

    Each read is complete within its micro-batch (the per-read groupBy
    never needs cross-batch state), so the right shape is foreachBatch
    running the full batch pipeline per micro-batch: span extraction →
    stream-static LEFT join against the index → regroup → resolve. No
    state store, no watermark, bounded memory; the static side is the
    same bucketed table batch classification uses, so each micro-batch
    shuffles only its own spans.

    ``sink(classified_df, epoch_id)`` receives each batch's results.
    Returns the DataStreamWriter (caller adds trigger/checkpoint and
    calls .start()).
    """
    from slacken_spark.classify import Classifier

    cls = Classifier(index)

    def process(batch_df, epoch_id):
        sink(cls.classify(batch_df), epoch_id)

    return read_stream.writeStream.foreachBatch(process)


def index_delta_stream(base: DataFrame, upd_stream: DataFrame, tokens, sink,
                       id_col: str = "doc_id", segment_rows: int = 10,
                       delta_fn=None):
    """Streaming incremental index maintenance: a CDC stream of document
    replacements patches a STATIC corpus's sharded inverted index — the
    continuous form of ``functions.inverted.delta_index`` and the
    standard Spark shape for streaming index upkeep (foreachBatch
    applying the batch delta per micro-batch, like a streaming
    MERGE INTO). ``delta_fn`` swaps the per-batch maintainer — the
    default is the boolean ``delta_index``; pass
    ``inverted.delta_scored_index`` for the RANKED (tf-carrying) index,
    whose delta has the identical (term, segment, df_segment, postings)
    keying and tombstone contract.

    Per micro-batch: ``delta_index(current_base, batch)`` emits only the
    affected (term, segment) posting lists (tombstones included) to
    ``sink(delta_df, epoch_id)``, then the in-memory base advances by
    the batch (anti-join + union) so later batches see earlier ones —
    sequential CDC application, each batch atomic. In production the
    base would be a storage-backed table the sink MERGEs into (the
    lineage of the advancing in-memory base grows per batch; a real
    deployment checkpoints it), but per-batch cost is the operator's
    whole point: bounded by the batch's affected segments, never the
    corpus.

    Returns the DataStreamWriter (caller adds trigger and starts).
    """
    from slacken_spark.functions.inverted import delta_index

    delta_fn = delta_fn or delta_index

    state = {"base": base}

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        delta = delta_fn(
            state["base"], batch_df, tokens, id_col, segment_rows
        )
        sink(delta, epoch_id)
        state["base"] = _advance_base(state["base"], batch_df, id_col, state)

    writer = upd_stream.writeStream.foreachBatch(process)
    writer._slacken_release = lambda: _release_advance_ckpt(state)
    return writer


# Every k-th advancement the base plan truncates to its materialized
# RDD; between checkpoints it grows by at most k anti-join+union layers.
_ADVANCE_CKPT_EVERY = 4


def _advance_base(
    base: DataFrame, batch_df: DataFrame, id_col: str,
    state: dict | None = None,
) -> DataFrame:
    """Sequential CDC base advancement (anti-join the batch's ids out,
    union the batch in) — ONE definition shared by the streaming
    maintainers so later batches of every operator see earlier ones
    through identical semantics.

    Lineage is BOUNDED, not compounding: when the caller passes its
    ``state`` dict, every ``_ADVANCE_CKPT_EVERY``-th advancement
    eagerly ``localCheckpoint``s the advanced base — truncating the
    plan to a Scan of the materialized RDD — and releases the previous
    checkpoint's blocks (unreferenced once the new one exists). So a
    long-running stream's per-batch plan holds at ≤ k layers over one
    materialized base instead of one layer per batch since the start
    (the r7-documented gap: "a real deployment checkpoints it" — this
    does). The checkpoint must be EAGER: a lazy one would keep a
    lineage dependency on the previous checkpoint's blocks, which an
    unpersisted local checkpoint cannot recompute. tests/
    test_streaming_ivm.py pins the plan-size bound over 9 batches."""
    from slacken_spark.functions.dedup import _stats_free, _unpersist_local_ckpt

    out = (
        base.join(batch_df.select(id_col), id_col, "left_anti")
        .unionByName(batch_df.select(*base.columns))
    )
    if state is not None:
        n = state["_advanced"] = state.get("_advanced", 0) + 1
        if n % _ADVANCE_CKPT_EVERY == 0:
            # _stats_free: each checkpoint's plan contains a JOIN over
            # the previous checkpoint, so over a long stream the
            # preserved sizeInBytes estimates would compound per
            # checkpoint (the dedup._stats_free BigInteger blowup,
            # stream-shaped). The batch side stays broadcast-eligible —
            # only the checkpointed base loses its estimate. unpersist
            # reaches the same backing RDD through the rebuilt frame.
            out = _stats_free(out.transform(_pin_eager))
            prev = state.get("_base_ckpt")
            if prev is not None:
                _unpersist_local_ckpt(prev)
            state["_base_ckpt"] = out
    return out


def _release_advance_ckpt(state: dict) -> None:
    """Free the final ``_advance_base`` checkpoint once a stream is
    DONE (the per-batch cadence frees every predecessor, but the last
    checkpoint otherwise lives until JVM GC — one base-sized RDD leaked
    per completed stream run). Only call after the query terminates:
    an unpersisted local checkpoint cannot be recomputed, so a
    restarted stream must not reuse this state."""
    from slacken_spark.functions.dedup import _unpersist_local_ckpt

    prev = state.pop("_base_ckpt", None)
    if prev is not None:
        _unpersist_local_ckpt(prev)


def run_foreach_to_completion(writer, name: str | None = None) -> None:
    """Run a foreachBatch DataStreamWriter to completion with the
    availableNow trigger and a THROWAWAY scratch checkpoint (fastest
    local dir — /dev/shm when present; offsets/state die with the run,
    exactly like ``run_to_completion``'s sink-side checkpoint). One
    definition so checkpoint handling has one place to fix — this
    block previously existed in three copies."""
    import os
    import shutil
    import tempfile

    ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    ckpt_dir = tempfile.mkdtemp(prefix="ss_ckpt_", dir=ckpt_base)
    try:
        w = writer.queryName(name or ("fb_" + uuid.uuid4().hex[:12]))
        q = (
            w.option("checkpointLocation", os.path.join(ckpt_dir, "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        # maintainers that advance an in-memory base attach a release
        # hook so their final checkpoint's blocks die with the run
        release = getattr(writer, "_slacken_release", None)
        if release is not None:
            release()


def cms_sketch_stream(doc_stream: DataFrame, to_occ, sink,
                      term_col: str = "term",
                      depth: int = 3, width: int = 512):
    """Streaming Count-Min-Sketch accumulation: each micro-batch maps
    through ``to_occ(batch_df) -> occurrences`` (term extraction runs
    on the STATIC per-batch frame, so window-backed tokenizers like
    ``shingle_rows`` are fine here where the streaming planner would
    reject them) and folds into a partial ``depth x width`` grid
    (functions.sketch.cms_sketch) handed to ``sink(grid_df, epoch_id)``
    — the sketch's MERGEABILITY is the whole streaming story, since
    grid(batch_1 ∪ batch_2) == merge of the per-batch grids, cell for
    cell, so a continuously-arriving corpus maintains the same sketch
    a batch pass would build. Per-batch cost is one map-side partial
    aggregation collapsing to grid size (fixed, corpus-independent);
    in production the sink MERGEs cells into a counters table (here
    the caller accumulates the ≤ depth*width rows and
    ``functions.sketch.cms_merge``s them).

    Returns the DataStreamWriter (caller adds trigger and starts).
    """
    from slacken_spark.functions.sketch import cms_sketch

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        sink(cms_sketch(to_occ(batch_df), term_col, depth, width), epoch_id)

    return doc_stream.writeStream.foreachBatch(process)


def grouped_sums_stream(base: DataFrame, view: DataFrame, upd_stream: DataFrame,
                        group_col: str, size, sink, id_col: str = "doc_id"):
    """Streaming incremental view maintenance: a CDC stream of row
    replacements keeps a grouped COUNT/SUM view current — the
    aggregate twin of ``index_delta_stream``, built on
    ``functions.ivm.maintain_grouped_sums``. Per micro-batch the view
    absorbs (batch-new − batch-old) through one group-sized full-outer
    merge and ``sink(view_df, epoch_id)`` sees the maintained view;
    the base then advances by the batch (anti-join + union) so later
    batches subtract the right old rows — sequential CDC application.

    The maintained view round-trips through the driver between batches
    (collect + recreate): it is group-cardinality-sized BY DESIGN (the
    whole point of a statistics view), and re-materializing it caps
    the otherwise per-batch-compounding lineage — the memory-sink
    stand-in for the production shape, where the sink MERGEs the view
    into a storage-backed table that the next batch reads back.

    ``size`` is the summed Column, evaluated against base/batch rows.
    Returns the DataStreamWriter (caller adds trigger and starts).
    """
    from slacken_spark.functions.ivm import maintain_grouped_sums

    state = {"base": base, "view": view}

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            # an empty CDC batch leaves the view UNCHANGED — but the
            # sink must still observe it (a silent skip would make an
            # all-empty stream report an empty view instead of the
            # current one, diverging from the batch operator, which
            # returns the view untouched for an empty update)
            sink(state["view"], epoch_id)
            return
        spark = batch_df.sparkSession
        maintained = maintain_grouped_sums(
            state["view"], state["base"], batch_df, group_col, size, id_col
        )
        schema = maintained.schema
        state["view"] = spark.createDataFrame(maintained.collect(), schema)
        sink(state["view"], epoch_id)
        state["base"] = _advance_base(state["base"], batch_df, id_col, state)

    writer = upd_stream.writeStream.foreachBatch(process)
    writer._slacken_release = lambda: _release_advance_ckpt(state)
    return writer


def zone_maps_stream(base: DataFrame, zm: DataFrame, upd_stream: DataFrame,
                     sink, id_col: str, layout_col: str, shard_width: int,
                     stat_cols: list[str]):
    """Streaming zone-map maintenance: a CDC stream of row replacements
    keeps the data-skipping stats table current — the layout twin of
    ``grouped_sums_stream``, built on ``skipping.maintain_zone_maps``.
    Per micro-batch only the batch's affected shards recompute (under
    the maps' own pruned scan); ``sink(zm_df, epoch_id)`` observes the
    maintained stats, the base then advances by the batch so later
    batches resolve old shards against earlier ones — sequential CDC
    application.

    The stats table round-trips through the driver between batches
    (collect + recreate): it is shard-count-sized BY DESIGN, and
    re-materializing caps the per-batch-compounding lineage — the
    memory-sink stand-in for the production shape (stats MERGEd into
    the table format's metadata layer, read back by the next batch).
    An empty micro-batch must still surface the UNCHANGED stats (same
    contract as the aggregate maintainer).

    Returns the DataStreamWriter (caller adds trigger and starts).
    """
    from slacken_spark.functions.skipping import maintain_zone_maps

    state = {"base": base, "zm": zm}

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            sink(state["zm"], epoch_id)
            return
        maintained = maintain_zone_maps(
            state["zm"], state["base"], batch_df,
            id_col, layout_col, shard_width, stat_cols,
        )
        spark = batch_df.sparkSession
        state["zm"] = spark.createDataFrame(
            maintained.collect(), maintained.schema
        )
        sink(state["zm"], epoch_id)
        state["base"] = _advance_base(state["base"], batch_df, id_col, state)

    writer = upd_stream.writeStream.foreachBatch(process)
    writer._slacken_release = lambda: _release_advance_ckpt(state)
    return writer


def histogram_stream(value_stream: DataFrame, sink, group_col: str,
                     cents, bin_width: int):
    """Streaming quantile-sketch accumulation: each micro-batch folds
    into a partial fixed-bin histogram (functions.sketch.
    histogram_sketch) handed to ``sink(hist_df, epoch_id)`` — the CMS
    pattern applied to the quantile sketch, whose mergeability is
    plain count addition: hist(batch_1 ∪ batch_2) == per-batch
    histograms summed bin for bin, so a continuously-arriving value
    stream maintains the same sketch (and therefore the same p50/p95
    read-off) a batch pass would build. Per-batch cost is one
    map-side partial aggregation collapsing to sketch size; in
    production the sink MERGEs bins into a counters table.

    Returns the DataStreamWriter (caller adds trigger and starts).
    """
    from slacken_spark.functions.sketch import histogram_sketch

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        sink(
            histogram_sketch(batch_df, group_col, cents, bin_width),
            epoch_id,
        )

    return value_stream.writeStream.foreachBatch(process)


def hll_stream(base_regs: DataFrame, value_stream: DataFrame,
               group_cols: list[str], value_col: str, sink, p: int = 9):
    """Streaming distinct-count maintenance: an APPEND stream keeps the
    per-group HyperLogLog register table current — completing the
    batch/stream/CDC symmetry the CMS, histogram, and zone-map
    families already have (``functions.sketch.hll_registers`` /
    ``hll_maintain`` are the batch/CDC halves, sharing ONE register
    definition with this maintainer).

    Per micro-batch: ``regs' = hll_merge(regs ∪ regs(batch))`` — one
    batch-sized map-side partial max plus one register-table-sized
    merge shuffle; ``sink(regs_df, epoch_id)`` observes the maintained
    table (an empty batch still reports it — the batch operator
    returns the table untouched for an empty append). No base
    advancement is needed, unlike the CDC maintainers: registers are
    max-monotone, so appends never require subtracting old rows — and
    for the same reason value DELETIONS cannot be streamed (the
    zone-map min/max asymmetry; recompute affected groups instead).

    The register table round-trips through the driver between batches
    (collect + recreate): it is register-cardinality-sized BY DESIGN
    (≤ groups × 2^p tiny integer rows), and re-materializing caps the
    otherwise per-batch-compounding lineage — the memory-sink stand-in
    for the production shape, where the sink MERGEs into a
    storage-backed table the next batch reads back.

    Returns the DataStreamWriter (caller adds trigger and starts).
    """
    from slacken_spark.functions.sketch import hll_maintain

    state = {"regs": base_regs}

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            sink(state["regs"], epoch_id)
            return
        spark = batch_df.sparkSession
        maintained = hll_maintain(
            state["regs"], batch_df, group_cols, value_col, p
        )
        schema = maintained.schema
        state["regs"] = spark.createDataFrame(maintained.collect(), schema)
        sink(state["regs"], epoch_id)

    return value_stream.writeStream.foreachBatch(process)


def bloom_stream(base_words: DataFrame, value_stream: DataFrame, col: str,
                 sink, m_bits: int = 8192, k: int = 2):
    """Streaming Bloom-filter maintenance over an APPEND stream —
    batch/stream/CDC symmetry for the membership family, same shape as
    :func:`hll_stream`: per micro-batch
    ``words' = bloom_merge(words ∪ bitmap(batch))``, the sink observes
    the maintained word table every epoch (empty batches included),
    and the table round-trips the driver between batches (≤ m_bits/32
    integer rows BY DESIGN — the production sink MERGEs into a
    storage-backed table). Appends only: bit_or is monotone, deletions
    are the zone-map asymmetry. Returns the DataStreamWriter."""
    from slacken_spark.functions.dedup import bloom_maintain

    state = {"words": base_words}

    def process(batch_df, epoch_id):
        if batch_df.isEmpty():
            sink(state["words"], epoch_id)
            return
        spark = batch_df.sparkSession
        maintained = bloom_maintain(
            state["words"], batch_df, col, m_bits, k
        )
        schema = maintained.schema
        state["words"] = spark.createDataFrame(maintained.collect(), schema)
        sink(state["words"], epoch_id)

    return value_stream.writeStream.foreachBatch(process)
