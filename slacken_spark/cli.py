"""Command-line interface mirroring the reference's command surface
(reference: slacken/Slacken.scala:108-379 subcommands: build, respace,
classify, classify2, bracken-build, stats, inspect, compare-index,
compare, input-check).

Usage: ``python -m slacken_spark <subcommand> …`` — see ``--help``.
"""

from __future__ import annotations

import argparse
import json
import sys

from slacken_spark import fsio


def _add_splitter_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-k", type=int, default=35, help="k-mer length")
    p.add_argument("-m", "--minimizer-width", type=int, default=31)
    # default None → 7 for m ≤ 31, 0 for wide minimizers (spaced seeds
    # operate on stored sequence bits and require m ≤ 31)
    p.add_argument("-s", "--spaces", type=int, default=None)
    p.add_argument("--no-canonical", action="store_true")
    p.add_argument(
        "--wide-scheme",
        choices=("exact", "hashed"),
        default="exact",
        help="wide-minimizer (m > 31) id scheme: exact multi-column"
        " (id1..idN, N = ceil(m/31) <= 4) keys, or the single-column"
        " 62-bit hash",
    )


def _splitter(args):
    from slacken_spark.kernels.minimizers import MinimizerConfig

    spaces = args.spaces
    if spaces is None:
        spaces = 0 if args.minimizer_width > 31 else 7
    return MinimizerConfig(
        k=args.k,
        m=args.minimizer_width,
        spaces=spaces,
        canonical=not args.no_canonical,
        wide=args.wide_scheme,
    )


def _spark(args):
    from slacken_spark.session import get_spark

    return get_spark("slacken_spark_cli", shuffle_partitions=args.partitions)


def _load_library(spark, args):
    from slacken_spark.sources.fasta import read_sequences, read_taxon_labels

    genomes = read_sequences(spark, args.library)
    labels = read_taxon_labels(spark, args.labels)
    return genomes.select("header", "nucleotides"), labels


def _load_taxonomy(args):
    import os

    from slacken_spark.kernels.taxonomy import Taxonomy

    d = args.taxonomy
    return Taxonomy.load(
        os.path.join(d, "nodes.dmp"),
        names_dmp=(
            os.path.join(d, "names.dmp")
            if os.path.exists(os.path.join(d, "names.dmp"))
            else None
        ),
        merged_dmp=(
            os.path.join(d, "merged.dmp")
            if os.path.exists(os.path.join(d, "merged.dmp"))
            else None
        ),
    )


def cmd_build(args) -> int:
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    genomes, labels = _load_library(spark, args)
    tax = _load_taxonomy(args)
    idx = KeyValueIndex.build(
        spark, genomes, labels, tax, _splitter(args), buckets=args.partitions
    )
    idx.write(args.output)
    print(json.dumps(idx.stats()))
    return 0


def cmd_respace(args) -> int:
    """Project an index to one or more larger space counts (the
    reference generates several respaced indexes in one run,
    Slacken.scala:176-184)."""
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    spaces = args.spaces if isinstance(args.spaces, list) else [args.spaces]
    for s in spaces:
        out = args.output if len(spaces) == 1 else f"{args.output}_s{s}"
        idx.respace(s).write(out)
    return 0


def cmd_classify(args) -> int:
    from slacken_spark.classify import Classifier, ClassifyParams, KrakenReport
    from slacken_spark.index import KeyValueIndex
    from slacken_spark.sources.fasta import read_paired_fastq, read_sequences

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    if args.paired and len(args.inputs) == 2:
        reads = read_paired_fastq(spark, args.inputs[0], args.inputs[1])
    else:
        reads = read_sequences(spark, args.inputs[0])
        for p in args.inputs[1:]:
            reads = reads.unionByName(read_sequences(spark, p))
    cpar = ClassifyParams(
        min_hit_groups=args.min_hit_groups,
        with_unclassified=not args.no_unclassified,
        thresholds=tuple(args.confidence),
        sample_regex=args.sample_regex,
        per_read_output=not args.no_detailed,
    )
    cls = Classifier(idx)
    if args.no_detailed:
        from slacken_spark.classify import SQLClassifier

        out = SQLClassifier(idx).classify(reads, cpar)
        counts = [
            (r["taxon"], r["n"])
            for r in out.where("classified")
            .groupBy("taxon")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        ]
        report = KrakenReport(idx.taxonomy, counts)
        fsio.write_text(
            args.output + "_kreport.txt", "\n".join(report.lines()) + "\n"
        )
        return 0
    for thr in cpar.thresholds:
        loc = f"{args.output}_c{thr}"
        out = cls.classify(reads, cpar, threshold=thr)
        cls.write_output(out, loc, cpar)
        # one Kraken report per sample, rebuilt from the written output
        # (the reference's report path re-reads what was written)
        for sample, lines in cls.reports_from_written(loc).items():
            suffix = f"_{sample}" if sample != "all" else ""
            fsio.write_text(
                f"{args.output}{suffix}_kreport.txt", "\n".join(lines) + "\n"
            )
    return 0


def cmd_classify2(args) -> int:
    from slacken_spark.classify import ClassifyParams
    from slacken_spark.dynamic import (
        ClassifiedReadCount,
        Dynamic,
        MinimizerDistinctCount,
        MinimizerFraction,
        MinimizerTotalCount,
    )
    from slacken_spark.index import KeyValueIndex
    from slacken_spark.sources.fasta import read_sequences

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    genomes, labels = _load_library(spark, args)
    crit = {
        "minimizer-total": MinimizerTotalCount(args.threshold),
        "minimizer-distinct": MinimizerDistinctCount(args.threshold),
        "minimizer-fraction": MinimizerFraction(args.threshold / 100.0),
        "reads": ClassifiedReadCount(args.threshold, args.confidence[0]),
    }[args.criterion]
    dyn = Dynamic(
        idx,
        genomes,
        labels,
        crit,
        cpar=ClassifyParams(min_hit_groups=args.min_hit_groups),
    )
    # read the gold set BEFORE the expensive two-step pipeline so a bad
    # path or malformed CSV fails fast, not after hours of work
    gold = (
        dyn.read_gold_set(
            args.gold_set, promote_rank_depth=args.promote_rank_depth
        )
        if args.gold_set
        else None
    )
    reads = read_sequences(spark, args.inputs[0])
    out, taxa = dyn.two_step_classify(reads)
    out.write.mode("overwrite").parquet(args.output)
    fsio.write_text(
        args.output + "_taxonSet.txt",
        "\n".join(str(t) for t in sorted(taxa)) + "\n",
    )
    if gold is not None:
        # gold-set evaluation of the DETECTED set (readGoldSet +
        # precision/recall, Dynamic.scala:265-312): remap merged ids,
        # promote library-absent taxa to their nearest library
        # ancestor, filter at the reclassify rank, then score
        m = dyn.gold_set_metrics(taxa, gold)
        fsio.write_text(
            args.output + "_goldEval.json", json.dumps(m, sort_keys=True) + "\n"
        )
    return 0


def cmd_bracken_build(args) -> int:
    from slacken_spark.bracken import BrackenWeights
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    genomes, labels = _load_library(spark, args)
    taxa = {int(r["taxon"]) for r in labels.select("taxon").distinct().collect()}
    bw = BrackenWeights(idx, args.read_len)
    bw.build_and_write(
        genomes,
        labels,
        taxa,
        f"{args.output}/database{args.read_len}mers.kmer_distrib",
    )
    return 0


def cmd_stats(args) -> int:
    """Index statistics; with --library (+ --labels), also the
    total-k-mer-count report (TKC1/2/3 columns) and the per-taxon
    coverage summary (IndexStatistics.scala stats surface)."""
    from slacken_spark.analysis import depth_histogram
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    print(json.dumps(idx.stats()))
    for row in depth_histogram(idx).collect():
        print(f"depth {row['depth']}: {row['n_records']}")
    if getattr(args, "library", None) and getattr(args, "labels", None):
        from slacken_spark.analysis import (
            taxon_coverage_stats,
            total_kmer_count_report,
        )
        from slacken_spark.sources.fasta import read_sequences, read_taxon_labels

        genomes = read_sequences(spark, args.library)
        labels = read_taxon_labels(spark, args.labels)
        for line in total_kmer_count_report(idx, genomes, labels):
            print(line)
        cov = taxon_coverage_stats(idx, genomes, labels).orderBy("taxon").collect()
        for r in cov:
            print(f"coverage {r['taxon']}: frac_leaf={r['frac_leaf']:.4f}"
                  f" total={r['total']}")
    return 0


def cmd_inspect(args) -> int:
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    (
        idx.distinct_minimizers_per_taxon()
        .orderBy("taxon")
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(args.output)
    )
    return 0


def cmd_compare_index(args) -> int:
    from slacken_spark.analysis import compare_indexes
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    a = KeyValueIndex.load(spark, args.index)
    b = KeyValueIndex.load(spark, args.other)
    for r in compare_indexes(a, b).collect():
        print(f"{r['category']}\t{r['n']}")
    return 0


def cmd_compare(args) -> int:
    from slacken_spark.analysis import (
        per_read_comparison,
        read_kraken_format,
    )
    from slacken_spark.index import KeyValueIndex

    spark = _spark(args)
    idx = KeyValueIndex.load(spark, args.index)
    cmp_df = read_kraken_format(spark, args.inputs[0])
    ref_df = read_kraken_format(spark, args.reference).withColumnRenamed(
        "taxon", "ref_taxon"
    )
    print(
        json.dumps(per_read_comparison(spark, cmp_df, ref_df, idx.taxonomy))
    )
    return 0


def cmd_input_check(args) -> int:
    """Sequence counts plus, when labels+taxonomy are given, the
    reference's full label-stats report: unknown/non-leaf labels,
    implied tree size, missing-rank histogram with rank names
    (inputStats, GenomeLibrary.scala:81-107)."""
    from pyspark.sql import functions as F

    from slacken_spark.sources.fasta import read_sequences

    spark = _spark(args)
    df = read_sequences(spark, args.inputs[0])
    row = df.agg(
        F.count(F.lit(1)).alias("sequences"),
        F.sum(F.length("nucleotides")).alias("bases"),
    ).first()
    out = {"sequences": row["sequences"], "bases": int(row["bases"] or 0)}
    if getattr(args, "labels", None) and getattr(args, "taxonomy", None):
        from slacken_spark.analysis import input_label_stats
        from slacken_spark.sources.fasta import read_taxon_labels

        tax = _load_taxonomy(args)
        out["labels"] = input_label_stats(read_taxon_labels(spark, args.labels), tax)
    print(json.dumps(out))
    return 0


def cmd_display_report(args) -> int:
    """Filter a Kraken/Slacken report by rank cutoff / min percentage /
    clade set (DisplayReport + FilterReport mains,
    DisplayReport.scala:86-113) — no Spark session needed."""
    from slacken_spark.analysis import filter_report, num_rank_for_code

    if args.report:
        lines = fsio.read_lines(args.report)
    else:
        lines = sys.stdin.read().splitlines()
    cutoff = num_rank_for_code(args.rank.upper()) if args.rank else None
    clades = None
    if args.clades:
        clades = {
            int(x) for x in fsio.read_text(args.clades).split() if x.strip()
        }
    for line in filter_report(
        lines, level_cutoff=cutoff, min_percent=args.min_percent, clades=clades
    ):
        print(line)
    return 0



def cmd_corpus_report(args) -> int:
    """Corpus monitoring report: per-source document/token counts, the
    integer-L1 unigram drift of each source vs the whole corpus, a
    token-length quantile sketch (p50/p95 upper bounds per source),
    and the corpus's length-layout zone maps — the dataset card /
    ingest-health surface over the SAME library operators the catalog
    gates (text.source_unigram_drift, sketch.histogram_sketch,
    skipping.zone_maps). Prints ONE JSON object."""
    from pyspark.sql import functions as F

    from slacken_spark.functions import text as X
    from slacken_spark.functions.sketch import (
        histogram_quantiles,
        histogram_sketch,
    )
    from slacken_spark.functions.skipping import layout_shard, zone_maps
    from slacken_spark.sources.docs import read_documents

    spark = _spark(args)
    docs = read_documents(
        spark,
        args.input,
        fmt=args.format,
        id_col=None if args.derive_ids else "doc_id",
    )
    # Null-safe monitoring keys: a row with no source must not crash
    # the JSON render (None is unsortable against str keys). The
    # sentinel is chosen COLLISION-FREE against the corpus's real
    # source names (a literal "(null)" source must not merge with the
    # null-source population); the distinct-sources probe is one
    # source-cardinality aggregation.
    real_sources = {
        r["source"]
        for r in docs.select("source").distinct().collect()
        if r["source"] is not None
    }
    null_key = "(null)"
    while null_key in real_sources:
        null_key += "~"
    docs = docs.withColumn(
        "source", F.coalesce(F.col("source"), F.lit(null_key))
    ).withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    # blank text is ZERO tokens (split of '' yields [''] — counting
    # that as one token would let a single null-text row inject an
    # empty-string token into every drift distribution and make a
    # perfectly-matching source look drifted)
    n_tokens = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(X.token_count(F.col("text")))
    sized = docs.withColumn("n_tokens", n_tokens.cast("long")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    # the explode-heavy drift pass and the three cheap stats passes
    # share the ingested corpus — persist once around them
    sized = sized.persist()
    per_source = {
        r["source"]: {"n_docs": r["n_docs"], "n_tokens": r["n_tokens"]}
        for r in sized.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    # a source whose docs carry no tokens yields no drift row (its
    # distribution is undefined); emit explicit nulls so every source
    # object has the same schema. Blank-text docs are excluded from
    # the drift distributions — they hold no tokens.
    for v in per_source.values():
        v["drift_l1_num"] = None
        v["drift_denom"] = None
    drift_in = sized.where(F.col("n_tokens") > 0)
    for r in X.source_unigram_drift(drift_in, "text", "source").collect():
        per_source[r["source"]]["drift_l1_num"] = r["l1_num"]
        per_source[r["source"]]["drift_denom"] = r["denom"]
    hist = histogram_sketch(sized, "source", F.col("n_tokens"), args.qbin)
    for r in histogram_quantiles(hist, args.qbin, [50, 95]).collect():
        per_source[r["grp"]]["p50_tokens_ub"] = r["q50_ub_cents"]
        per_source[r["grp"]]["p95_tokens_ub"] = r["q95_ub_cents"]
    zm = [
        {
            "shard": r["shard"],
            "n_rows": r["n_rows"],
            "min_n_tokens": r["min_n_tokens"],
            "max_n_tokens": r["max_n_tokens"],
        }
        for r in zone_maps(
            sized, layout_shard("n_chars", args.zm_width), ["n_tokens"]
        )
        .orderBy("shard")
        .collect()
    ]
    sized.unpersist()
    print(
        json.dumps(
            {
                "n_docs": sum(v["n_docs"] for v in per_source.values()),
                "n_tokens": sum(v["n_tokens"] for v in per_source.values()),
                "sources": per_source,
                "zone_maps": zm,
            },
            sort_keys=True,
        )
    )
    return 0


def cmd_pipeline(args) -> int:
    """Training-data pipeline driver: ingest → quality filter → dedup →
    per-source quota sampling → pack → deterministic shard publish,
    each stage the library operator the catalog gates (beyond-reference
    surface; the genomic commands above mirror the reference CLI).
    Prints the shard manifest as JSON lines."""
    from pyspark.sql import functions as F

    from slacken_spark.functions import text as X
    from slacken_spark.functions.dedup import exact_dedup
    from slacken_spark.functions.packing import pack_greedy, write_training_shards
    from slacken_spark.sources.docs import read_documents

    spark = _spark(args)
    docs = read_documents(
        spark,
        args.input,
        fmt=args.format,
        id_col=None if args.derive_ids else "doc_id",
    )
    if not args.derive_ids and docs.where(F.col("doc_id").isNull()).limit(1).count():
        print(
            "pipeline: input has null doc_id values — pass --derive-ids"
            " to derive content-addressed ids",
            file=sys.stderr,
        )
        return 2
    if args.dedup == "exact":
        keep = exact_dedup(docs, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        )
        docs = docs.join(keep, "doc_id", "left_semi")
    elif args.dedup == "dupspan":
        scrubbed = X.dupspan_scrub(docs, "text", "doc_id", n=args.dupspan_n)
        docs = (
            docs.select("doc_id", "source")
            .join(scrubbed.select("doc_id", "clean_text", "n_kept"), "doc_id")
            .where(F.col("n_kept") > 0)  # fully-scrubbed docs don't publish
            .select("doc_id", "source", F.col("clean_text").alias("text"))
        )
    # token counting happens ONCE, after dedup/scrub, so the quality gate
    # judges the content actually being published (a doc scrubbed below
    # the threshold is dropped here, not smuggled into the shards)
    sized = docs.withColumn(
        "n_tokens", X.token_count(F.col("text")).cast("long")
    )
    if args.min_tokens:
        sized = sized.where(F.col("n_tokens") >= args.min_tokens)
    if args.quota_tokens:
        # dataset-mixer step: deterministic hash-spread downsampling to a
        # per-source token budget; "hash" is the no-per-source-sort path
        # for when one source dominates (functions.packing.quota_sample).
        # Persist first: hash mode evaluates the upstream lineage twice
        # (histogram pass + kept-set output), and everything above —
        # ingest, dedup/scrub, token counting — is the expensive part.
        sized = sized.persist()
        from slacken_spark.functions.packing import quota_sample

        sized = quota_sample(
            sized,
            args.quota_tokens,
            "source",
            "doc_id",
            "n_tokens",
            args.quota_mode,
        )
    if args.pack_budget and (args.block_tokens or args.epoch):
        # a pack is the training unit (shards key on the pack identity
        # below) but the block/epoch layouts address individual docs —
        # emitting both would silently split packs across blocks/shards
        print(
            "pipeline: --block-tokens/--epoch are doc-granular layouts"
            " and cannot be combined with --pack-budget (packs are the"
            " training unit); run them on an unpacked publish",
            file=sys.stderr,
        )
        return 2
    if args.block_tokens or args.epoch:
        # the layout stages re-consume `sized` after the shard publish
        # (token_blocks alone scans it twice); without this persist the
        # whole ingest → dedup/scrub → token-count(→ quota) lineage
        # would re-run per consumer — the exact case token_blocks'
        # docstring warns about
        sized = sized.persist()
    shard_key = "doc_id"
    if args.pack_budget:
        packed = pack_greedy(
            sized.select("source", "doc_id", "n_tokens"),
            args.pack_budget,
            shards=args.pack_shards,
            shard_by="hash" if args.pack_shards > 1 else "range",
        ).withColumnRenamed("shard_id", "pack_shard")
        sized = sized.join(packed.select("doc_id", "pack_shard", "pack_id"), "doc_id")
        # shard on the PACK identity: a pack is the training unit, so all
        # its members must land in one shard (hashing doc_id would
        # scatter each pack across every output shard)
        sized = sized.withColumn(
            "pack_key",
            F.concat_ws("|", "source", "pack_shard", "pack_id"),
        )
        shard_key = "pack_key"
    manifest = write_training_shards(
        sized, args.output, shard_key, args.shards, size_col="n_tokens"
    )
    for row in manifest.orderBy("shard_id").collect():
        print(json.dumps(row.asDict()))
    if args.block_tokens:
        # training-batch layout: the concat-and-chunk plan over the
        # PUBLISHED rows (same sized frame the shards hold), written
        # beside the shards for the loader
        from slacken_spark.functions.packing import token_blocks

        plan = token_blocks(
            sized.select("doc_id", "n_tokens"), args.block_tokens,
            "doc_id", "n_tokens",
        )
        plan_path = args.output.rstrip("/") + "_block_plan"
        plan.write.mode("overwrite").parquet(plan_path)
        stats = (
            spark.read.parquet(plan_path)
            .agg(
                F.count_distinct("block_id").alias("n_blocks"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .first()
        )
        print(json.dumps({
            "block_plan": plan_path,
            "block_tokens": args.block_tokens,
            "n_blocks": stats["n_blocks"],
            "n_rows": stats["n_rows"],
        }))
    if args.epoch:
        # deterministic epoch addresses over the published doc ids —
        # one table per epoch, resumable by construction
        from slacken_spark.functions.packing import epoch_shuffle

        addr = epoch_shuffle(
            sized.select("doc_id"), "doc_id", shards=args.shards,
            epoch=args.epoch,
        )
        epoch_path = args.output.rstrip("/") + f"_epoch{args.epoch}"
        addr.write.mode("overwrite").parquet(epoch_path)
        print(json.dumps({
            "epoch_plan": epoch_path,
            "epoch": args.epoch,
            "shards": args.shards,
            "n_rows": spark.read.parquet(epoch_path).count(),
        }))
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="slacken_spark",
        description="PySpark-native Kraken 2-compatible metagenomic engine",
    )
    parser.add_argument("-p", "--partitions", type=int, default=200)
    sub = parser.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from genomes")
    _add_splitter_args(b)
    b.add_argument("--library", required=True)
    b.add_argument("--labels", required=True, help="seqid2taxid.map")
    b.add_argument("--taxonomy", required=True, help="dir with nodes.dmp/names.dmp")
    b.add_argument("-o", "--output", required=True)
    b.set_defaults(fn=cmd_build)

    r = sub.add_parser("respace", help="project an index to more spaces")
    r.add_argument("--index", required=True)
    r.add_argument(
        "-s", "--spaces", type=int, nargs="+", required=True,
        help="one or more space counts; each writes <output>_s<N>"
        " (one output when a single value is given)",
    )
    r.add_argument("-o", "--output", required=True)
    r.set_defaults(fn=cmd_respace)

    c = sub.add_parser("classify", help="classify reads")
    c.add_argument("--index", required=True)
    c.add_argument("inputs", nargs="+")
    c.add_argument("--paired", action="store_true")
    c.add_argument("-c", "--confidence", type=float, nargs="+", default=[0.0])
    c.add_argument("--min-hit-groups", type=int, default=2)
    c.add_argument("--no-unclassified", action="store_true")
    c.add_argument("--no-detailed", action="store_true")
    c.add_argument("--sample-regex")
    c.add_argument("-o", "--output", required=True)
    c.set_defaults(fn=cmd_classify)

    c2 = sub.add_parser("classify2", help="two-step dynamic classification")
    c2.add_argument("--index", required=True)
    c2.add_argument("--library", required=True)
    c2.add_argument("--labels", required=True)
    c2.add_argument("inputs", nargs="+")
    c2.add_argument(
        "--criterion",
        choices=[
            "minimizer-total",
            "minimizer-distinct",
            "minimizer-fraction",
            "reads",
        ],
        default="reads",
    )
    c2.add_argument("--threshold", type=int, default=100)
    c2.add_argument("-c", "--confidence", type=float, nargs="+", default=[0.15])
    c2.add_argument("--min-hit-groups", type=int, default=2)
    c2.add_argument("-o", "--output", required=True)
    c2.add_argument(
        "--gold-set",
        help="1-column CSV of gold taxon ids; writes <output>_goldEval.json "
        "with tp/fp/fn/precision/recall of the detected set",
    )
    c2.add_argument(
        "--promote-rank-depth",
        type=int,
        default=None,
        help="ALSO keep promoted (library-absent) gold taxa at/below this "
        "rank depth even when it is above the reclassify rank — a "
        "relaxation; promoted taxa at/below the reclassify rank are "
        "always kept",
    )
    c2.set_defaults(fn=cmd_classify2)

    bb = sub.add_parser("bracken-build", help="generate Bracken weights")
    bb.add_argument("--index", required=True)
    bb.add_argument("--library", required=True)
    bb.add_argument("--labels", required=True)
    bb.add_argument("--read-len", type=int, default=150)
    bb.add_argument("-o", "--output", required=True)
    bb.set_defaults(fn=cmd_bracken_build)

    st = sub.add_parser("stats", help="index statistics")
    st.add_argument("--index", required=True)
    st.add_argument("--library", help="genome library for k-mer/coverage reports")
    st.add_argument("--labels", help="seqid2taxid.map for the library")
    st.set_defaults(fn=cmd_stats)

    ins = sub.add_parser("inspect", help="index contents report")
    ins.add_argument("--index", required=True)
    ins.add_argument("-o", "--output", required=True)
    ins.set_defaults(fn=cmd_inspect)

    ci = sub.add_parser("compare-index", help="compare two indexes")
    ci.add_argument("--index", required=True)
    ci.add_argument("--other", required=True)
    ci.set_defaults(fn=cmd_compare_index)

    cp = sub.add_parser("compare", help="compare classifications vs reference")
    cp.add_argument("--index", required=True)
    cp.add_argument("--reference", required=True)
    cp.add_argument("inputs", nargs="+")
    cp.set_defaults(fn=cmd_compare)

    ic = sub.add_parser("input-check", help="inspect input data")
    ic.add_argument("inputs", nargs="+")
    ic.add_argument("--labels", help="seqid2taxid.map for label stats")
    ic.add_argument("--taxonomy", help="dir with nodes.dmp/names.dmp")
    ic.set_defaults(fn=cmd_input_check)

    dr = sub.add_parser(
        "display-report", help="filter a Kraken/Slacken report (stdin or file)"
    )
    dr.add_argument("report", nargs="?", help="report file (default: stdin)")
    dr.add_argument("--rank", help="rank code cutoff, e.g. G for genus")
    dr.add_argument("--min-percent", type=float)
    dr.add_argument("--clades", help="file with one taxon id per line")
    dr.set_defaults(fn=cmd_display_report)

    cr = sub.add_parser(
        "corpus-report",
        help="corpus monitoring: per-source stats, drift, quantiles, zone maps",
    )
    cr.add_argument("--input", required=True, help="corpus path/glob")
    cr.add_argument(
        "--format", default="jsonl", choices=("parquet", "jsonl", "csv", "text")
    )
    cr.add_argument(
        "--derive-ids",
        action="store_true",
        help="derive content-addressed doc ids (input has no doc_id column)",
    )
    cr.add_argument(
        "--qbin",
        type=int,
        default=16,
        help="token-length quantile-sketch bin width (error bound)",
    )
    cr.add_argument(
        "--zm-width",
        type=int,
        default=256,
        help="zone-map layout shard width over n_chars",
    )
    cr.set_defaults(fn=cmd_corpus_report)

    pl = sub.add_parser(
        "pipeline",
        help="training-data pipeline: ingest -> filter -> dedup -> pack -> shards",
    )
    pl.add_argument("--input", required=True, help="corpus path/glob")
    pl.add_argument(
        "--format", default="jsonl", choices=("parquet", "jsonl", "csv", "text")
    )
    pl.add_argument("--output", required=True, help="shard output directory")
    pl.add_argument(
        "--derive-ids",
        action="store_true",
        help="derive content-addressed doc ids (input has no doc_id column)",
    )
    pl.add_argument("--min-tokens", type=int, default=0)
    pl.add_argument(
        "--quota-tokens",
        type=int,
        default=0,
        help="per-source token quota (0 = no quota sampling)",
    )
    pl.add_argument("--quota-mode", choices=("window", "hash"), default="hash")
    pl.add_argument("--dedup", choices=("none", "exact", "dupspan"), default="none")
    pl.add_argument("--dupspan-n", type=int, default=5)
    pl.add_argument("--pack-budget", type=int, default=0)
    pl.add_argument("--pack-shards", type=int, default=1)
    pl.add_argument("--shards", type=int, default=8)
    pl.add_argument(
        "--block-tokens",
        type=int,
        default=0,
        help="also write a concat-and-chunk token-block plan of this"
        " block size next to the shards (0 = off)",
    )
    pl.add_argument(
        "--epoch",
        type=int,
        default=0,
        help="also write the deterministic epoch-N (shard, position)"
        " address table next to the shards (0 = off)",
    )
    # NOTE: no --partitions here — the global -p flag covers it (a
    # subparser redefinition would clobber a user-supplied global value
    # with the subparser default)
    pl.set_defaults(fn=cmd_pipeline)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
