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
# every catalog entry has a green CORRECTNESS row. Round 5: promote the
# 15 queries with no r4 row (green in r1-r3, rotated out by the cap —
# the flagship genomic set, the four media queries, and the r4-demoted
# tail), the new queries (pack_sequences_sharded, ivf nprobe2,
# dedup_keep_canonical, doc_decontaminate, source_quota_sample,
# doc_repetition, events_rolling_stats, doc_unigram_rarity,
# doc_boilerplate_scrub — the last three sit mid-list inside the cap),
# genomic_classify_detail (first round WITH an oracle), every operator
# added during round 5 (TF-IDF, dupspan, BPE ×3, shard manifest,
# streaming quality gate, inverted index ×2, upsert, z-order, ANN
# retrieval, JSON extract, corpus diff), and the queries whose code
# changed this round. Demoted: queries green in r4 (most also in an
# earlier round) with code untouched since (the local pytest oracle
# suite re-runs ALL of them at sf0.01 every session; the full demoted
# list and the r6 re-promotion plan are in NOTES.md). The gate
# composition — all r5-new and all aging queries inside the cap — is
# validated programmatically before each rotation commit.
_EARLY = [
    # aging: no CORRECTNESS_r04 row — cycle back in (VERDICT r4 item 1)
    "genomic_classify",
    "genomic_classify_wide",
    "genomic_kmer_totals",
    "genomic_index_lca_histogram",
    "genomic_clade_rollup",
    "bracken_weights",  # also: batched small-fragment kernel this round
    "media_image_stats",
    "media_phash_neardup",
    "media_audio_stats",
    "video_frame_plan",
    "scalar_funcs",
    "set_ops_nations",
    "topk_per_group",
    "two_level_agg",
    "size_histogram",
    # new this round — record a row immediately:
    "pack_sequences_sharded",
    "embedding_ivf_topk_nprobe2",
    "dedup_keep_canonical",
    "doc_decontaminate",
    "source_quota_sample",
    "doc_repetition",
    "genomic_classify_detail",  # byte-exact Kraken-line oracle now
    # new late round 5 — record a row immediately:
    "tfidf_top_terms",
    "doc_dupspan_scrub",
    "bpe_top_pairs",
    "bpe_learned_merges",  # rows-only (iterative trainer)
    "dataset_shard_manifest",
    "streaming_doc_quality",
    "inverted_index_digest",
    "corpus_upsert_latest",
    "events_zorder_layout",
    "bpe_tokenized_counts",  # rows-only (train+apply loop)
    "ann_retrieve_docs",
    "events_json_extract",
    "corpus_diff",
    "inverted_index_sharded",
    # code changed this round — keep under the hash gate:
    "sessionize_events",
    "streaming_window_counts",
    "streaming_session_windows",
    "streaming_genomic_classify",
    "streaming_dedup_keys",
    "pack_sequences",
    "embedding_ivf_topk",
    "embedding_kmeans_clusters",  # rows-only (iterative trainer)
    "dedup_components",
]
_TAIL = [
    # added at round end with the 50-slot gate already full of r5-new +
    # aging entries: pytest-gated at sf0.001 AND sf0.01 this round,
    # promoted for a driver row in r6 (NOTES rotation plan)
    "cube_source_lang",
    "doc_length_quartiles",
    "unpivot_part_metrics",
    # demoted late round 5 to make room for the six new queries (green
    # in r4, code untouched since):
    "ngram_jaccard_adjacent",
    "simhash_docs",
    "doc_pii_redact",
    "doc_quality",
    "doc_langid",
    "doc_bpe_token_stats",
    "value_percentiles",
    "doc_chunks",
    "asof_event_order_forward",
    "doc_vocab_top50",
    "doc_fingerprints",
    "embedding_cosine_topk",
    "embedding_lsh_buckets",
    "embedding_neardup_pairs",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "pricing_summary",
    "scan_filter_project",
    "classification_join",
    "star_broadcast_join",
    "nullsafe_join",
    "semi_anti_join",
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
