"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in the ``slacken_spark.plans``
catalog modules (``catalog`` + ``catalog_events`` / ``catalog_docs*``
/ ``catalog_genomic`` / ``catalog_multimodal`` / ``catalog_streaming``
— see ``plans.load_all``); this module only exposes the registry in
the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# Importing the catalog modules populates the registry.
from slacken_spark.plans import catalog as _catalog  # noqa: E402
from slacken_spark.plans import load_all as _load_all  # noqa: E402

_load_all()

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Executor-side package shipping (addPyFile) — the driver contract must
# work from ANY working directory; see session.ensure_package_shipped.
from slacken_spark.session import ensure_package_shipped as _ensure_shipped  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full genomic pipeline — deterministic genome
    construction → minimizer scan → LCA index build → classification
    join → per-read resolve (SURVEY §3 E1+E2) — on sf0.001."""
    _ensure_shipped(spark)
    fn, _ = _catalog.QUERIES["genomic_classify"]
    return fn(spark, DEFAULT_SF_DIR)


# The correctness gate records exactly the first 50 registered queries
# and silently drops the rest, so the order is rotated each round until
# every catalog entry's green row stays fresh (enforced by
# tests/test_gate.py::test_rolling_green_window_stays_fresh: every
# catalog entry must sit inside THIS round's first 50 or hold a green
# row in one of the two most recent recorded rounds). Round 14's 50 =
#   (a) the full binding backlog: all 46 entries whose freshest green
#       row is r11 (they turn two rounds stale the moment
#       CORRECTNESS_r13.json is tracked) — the r13 _TAIL's head, in
#       order (probes/rotation_plan.py recomputes this mechanically),
#   (b) four free seats given to the entries this round's optimization
#       RESTRUCTURED (r13 verdict item 7): inverted_index_patch /
#       inverted_index_compact / inverted_index_ranked_delta (now read
#       the app-scoped stored fine index instead of rebuilding it per
#       invocation) and dedup_components_mixed (its contraction engine
#       gained known-size broadcast hints), so the driver independently
#       re-verifies every restructured path.
# Seat math: 46 binding + 4 free picks = 50 exactly.
# _TAIL is ordered as the r15 re-promotion queue: the 46 r12-fresh
# entries first (they hit the 2-round staleness bound at r15 and must
# gate then), then the r13-fresh ones.

# Queries that MUST land a CORRECTNESS row this round (asserted inside
# the first 50 by tests/test_gate.py): this round's 50 exactly — the
# rotation IS the must-gate set, so a silent displacement cannot
# happen.
_MUST_GATE = [
    # (a) the binding 46 (freshest green row is r11 — they turn two
    # rounds stale the moment CORRECTNESS_r13.json is tracked), in the
    # r13 _TAIL promotion-queue order:
    "inverted_index_query_ranked",
    "epoch_shuffle_plan",
    "genomic_classify",
    "genomic_classify_wide",
    "genomic_classify_wide_hashed",
    "genomic_classify_detail",
    "genomic_index_lca_histogram",
    "genomic_clade_rollup",
    "streaming_genomic_classify",
    "genomic_kmer_totals",
    "ann_retrieve_docs",
    "bpe_top_pairs",
    "corpus_diff",
    "corpus_upsert_latest",
    "dataset_shard_manifest",
    "doc_bloom_decontaminate",
    "doc_unigram_rarity",
    "embedding_random_projection",
    "events_json_extract",
    "events_rolling_stats",
    "events_zorder_layout",
    "media_audio_stats",
    "media_image_stats",
    "media_phash_neardup",
    "pack_sequences",
    "scalar_funcs",
    "sessionize_events",
    "set_ops_nations",
    "size_histogram",
    "streaming_dedup_keys",
    "streaming_doc_quality",
    "streaming_session_windows",
    "streaming_window_counts",
    "two_level_agg",
    "video_frame_plan",
    "inverted_index_ranked_compact",
    "genomic_gold_eval",
    "events_hll_registers",
    "events_hll_maintain",
    "doc_bigram_lm_scores",
    "corpus_pps_sample",
    "doc_bloom_maintain",
    "salted_skew_join",
    "salted_skew_agg",
    "ngram_lm_counts",
    "value_percentiles",
    # (b) four free seats: the entries this round RESTRUCTURED
    # (r13 verdict item 7 — seat touched paths so the driver
    # independently re-verifies them): the three index-maintenance
    # entries that now read the app-scoped stored fine index
    # (_fine_index/_fine_scored_index) and the mixed dedup maintainer
    # whose contraction engine gained the known-size broadcast hints.
    "inverted_index_patch",
    "inverted_index_compact",
    "inverted_index_ranked_delta",
    "dedup_components_mixed",
]
_EARLY = list(_MUST_GATE)
_TAIL = [
    # r15 re-promotion queue, in order: first the r12-fresh entries
    # (their newest green row turns two rounds old when this round's
    # file lands — r15 must gate them), in the r12 gate order, minus
    # the free-seat pick gated this round; then the r13-fresh set in
    # the r13 gate order, minus the three free-seat picks.
    "dedup_components",
    "dedup_components_delta",
    "dedup_keep_longest",
    "dedup_keep_canonical",
    "embedding_lsh_delta",
    "bpe_learned_merges",
    "bpe_tokenized_counts",
    "cube_source_lang",
    "asof_event_order",
    "asof_event_order_forward",
    "count_distinct_multi",
    "dataset_split_counts",
    "dedup_exact",
    "deterministic_sample",
    "doc_boilerplate_scrub",
    "doc_bpe_token_stats",
    "doc_chunks",
    "doc_fingerprints",
    "doc_langid",
    "doc_length_quartiles",
    "doc_pii_redact",
    "doc_quality",
    "doc_token_stats",
    "embedding_cosine_topk",
    "embedding_lsh_buckets",
    "embedding_neardup_pairs",
    "embedding_quantize_int8",
    "embedding_semdedup_keep",
    "event_type_pivot",
    "events_approx_distinct",
    "fasta_input_roundtrip",
    "fastq_window",
    "hit_regroup",
    "inverted_index_digest",
    "inverted_index_sharded",
    "lca_fold",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "multi_stat_per_user",
    "ngram_jaccard_adjacent",
    "order_rejoin",
    "range_bucket_join",
    "rollup_revenue",
    "simhash_docs",
    "unpivot_part_metrics",
    "weights_rollup",
    "doc_cdc_chunks",
    "corpus_cdc_snapshot_diff",
    "source_hamilton_quota",
    "topk_per_group",
    "streaming_index_delta",
    "streaming_index_ranked_delta",
    "streaming_source_stats",
    "streaming_zone_maps",
    "bracken_weights",
    "bracken_distrib_lines",
    "dedup_components_predistinct",
    "classification_join",
    "corpus_read_asof",
    "dedup_graph_pagerank",
    "doc_decontaminate",
    "doc_dupspan_scrub",
    "doc_heavy_hitters_cms",
    "doc_heavy_hitters_delta",
    "doc_repetition",
    "doc_shard_zone_maps",
    "doc_vocab_top50",
    "embedding_ivf_topk_nprobe2",
    "embedding_kmeans_clusters",
    "funnel_conversion",
    "inverted_index_query",
    "minhash_lsh_delta",
    "nullsafe_join",
    "pack_sequences_sharded",
    "pricing_summary",
    "retention_cohorts",
    "scan_filter_project",
    "semi_anti_join",
    "source_quota_sample",
    "source_quota_sample_hash",
    "source_stats_maintain",
    "source_temperature_mix",
    "source_token_drift",
    "star_broadcast_join",
    "streaming_heavy_hitters",
    "streaming_running_totals",
    "streaming_value_quantiles",
    "tfidf_top_terms",
    "token_block_plan",
    "value_quantile_delta",
    "value_quantile_sketch",
    "zone_map_maintain",
    "zone_map_pruned_scan",
    "genomic_classify2",
    "dedup_components_drop",
    "inverted_index_delta",
]


def _ordered_names() -> list[str]:
    names = list(_catalog.QUERIES)
    early = [n for n in _EARLY if n in names]
    tail = [n for n in _TAIL if n in names]
    mid = [n for n in names if n not in set(early) | set(tail)]
    return early + mid + tail


def _with_shipping(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        name: _with_shipping(_catalog.QUERIES[name][0])
        for name in _ordered_names()
    }


def oracle_sql() -> dict[str, str]:
    return {
        name: _catalog.QUERIES[name][1]
        for name in _ordered_names()
        if _catalog.QUERIES[name][1] is not None
    }
