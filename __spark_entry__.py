"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``slacken_spark.plans.catalog`` (+
``catalog_docs`` / ``catalog_genomic``); this module only exposes the
registry in the driver's shape.
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
# every catalog entry has a green CORRECTNESS row. Round 6 executes the
# NOTES r5→r6 rotation plan: the four queries with no driver row in ANY
# round (doc_boilerplate_scrub — dropped by the r5 off-by-one at
# position 50 — plus the three round-end additions) go FIRST, then
# every query that is new or whose code/oracle changed this round, then
# the r5-demoted promotions (all with ≥1 earlier green row). Demoted:
# the r5-gated set (green in CORRECTNESS_r05, code untouched) plus
# six 4x-green promotions that no longer fit as late-round additions
# claimed slots (pricing_summary, scan_filter_project,
# classification_join, star_broadcast_join, nullsafe_join,
# semi_anti_join — first in line for r7). The must-gate set below is
# ASSERTED inside the first 50 by tests/test_gate.py, so a rotation
# commit can no longer silently drop a query (the r5 validator was a
# comment, not a test — hence the off-by-one).

# Queries that MUST land a CORRECTNESS row this round: never-gated ones
# plus everything new/changed since the r5 file was recorded.
_MUST_GATE = [
    # never had a driver row in any round:
    "doc_boilerplate_scrub",
    "cube_source_lang",
    "doc_length_quartiles",
    "unpivot_part_metrics",
    # new this round:
    "fasta_input_roundtrip",
    "source_quota_sample_hash",
    "embedding_semdedup_keep",
    "inverted_index_delta",
    "source_temperature_mix",
    # oracle upgraded this round (rows-only → hash-gated):
    "events_approx_distinct",
    "bpe_learned_merges",
    "bpe_tokenized_counts",
    # code changed this round:
    "source_quota_sample",  # refactored onto functions.packing.quota_sample
    "inverted_index_sharded",  # exact floor-division segment key + functions promotion
    "inverted_index_digest",  # refactored onto functions.inverted
    "bracken_weights",  # large-fragment routing re-measured, cutoff 1024
]
_EARLY = _MUST_GATE + [
    # r5-demoted promotions (NOTES rotation plan; every one green in
    # ≥1 earlier round, most in 4):
    "order_rejoin",
    "lca_fold",
    "hit_regroup",
    "count_distinct_multi",
    "multi_stat_per_user",
    "weights_rollup",
    "fastq_window",
    "salted_skew_join",
    "rollup_revenue",
    "doc_token_stats",
    "deterministic_sample",
    "salted_skew_agg",
    "event_type_pivot",
    "asof_event_order",
    "range_bucket_join",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_adjacent",
    "simhash_docs",
    "doc_fingerprints",
    "embedding_cosine_topk",
    "embedding_lsh_buckets",
    "embedding_neardup_pairs",
    "doc_pii_redact",
    "doc_quality",
    "doc_langid",
    "doc_bpe_token_stats",
    "value_percentiles",
    "doc_chunks",
    "asof_event_order_forward",
    "embedding_quantize_int8",
    "dataset_split_counts",
    "genomic_classify_wide_hashed",
]
_TAIL = [
    # deferred promotions — first in line for the r7 gate (4 green rows
    # each, the six that didn't fit under the 50-row cap):
    "pricing_summary",
    "scan_filter_project",
    "classification_join",
    "star_broadcast_join",
    "nullsafe_join",
    "semi_anti_join",
    # demoted: green in CORRECTNESS_r05, code untouched since
    # (the local pytest oracle suite re-runs ALL of them at sf0.01):
    "genomic_classify",
    "genomic_classify_wide",
    "genomic_kmer_totals",
    "genomic_index_lca_histogram",
    "genomic_clade_rollup",
    "media_image_stats",
    "media_phash_neardup",
    "media_audio_stats",
    "video_frame_plan",
    "scalar_funcs",
    "set_ops_nations",
    "topk_per_group",
    "two_level_agg",
    "size_histogram",
    "pack_sequences_sharded",
    "embedding_ivf_topk_nprobe2",
    "dedup_keep_canonical",
    "doc_decontaminate",
    "doc_repetition",
    "genomic_classify_detail",
    "tfidf_top_terms",
    "doc_dupspan_scrub",
    "bpe_top_pairs",
    "dataset_shard_manifest",
    "streaming_doc_quality",
    "corpus_upsert_latest",
    "events_zorder_layout",
    "ann_retrieve_docs",
    "events_json_extract",
    "corpus_diff",
    "sessionize_events",
    "streaming_window_counts",
    "streaming_session_windows",
    "streaming_genomic_classify",
    "streaming_dedup_keys",
    "pack_sequences",
    "embedding_ivf_topk",
    "embedding_kmeans_clusters",  # rows-only (iterative float trainer)
    "dedup_components",
    "doc_vocab_top50",
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
