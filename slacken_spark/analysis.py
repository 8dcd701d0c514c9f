"""Analysis tooling: classification comparison metrics, UniFrac distance,
index statistics.

Re-expresses the reference's analysis layer:
  - MappingComparison (analysis/MappingComparison.scala:140-332):
    per-read hit categories (TruePos/VaguePos/FalsePos/FalseNeg) against
    a reference mapping, per-taxon precision/recall at a rank;
  - UniFrac (analysis/UniFrac.scala:26-50): unweighted UniFrac distance
    between two taxon sets over the taxonomy tree;
  - IndexStatistics (IndexStatistics.scala:55-111): per-taxon leaf
    coverage fraction, depth histograms.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slacken_spark import fsio
from slacken_spark.index import KeyValueIndex, extract_index_rows
from slacken_spark.kernels.taxonomy import NONE, ROOT, Taxonomy

# ---------------------------------------------------------------------------
# Kraken-format read-back (S12, Classifier.scala:244-251)
# ---------------------------------------------------------------------------


def read_kraken_format(spark, path: str) -> DataFrame:
    """Parse written Kraken classification lines → (id, taxon)."""
    return (
        spark.read.option("sep", "\t")
        .csv(path)
        .select(F.col("_c1").alias("id"), F.col("_c2").cast("int").alias("taxon"))
    )


# ---------------------------------------------------------------------------
# Per-read hit categories (MappingComparison.scala:313-331)
# ---------------------------------------------------------------------------


def hit_category(
    tax: Taxonomy, ref: int, test: int, rank_depth: int | None
) -> str:
    if test == NONE:
        return "FalseNeg"
    ref_ancestor = (
        tax.ancestor_at_level(ref, rank_depth) if rank_depth is not None else ref
    ) or ref
    if ref == test:
        return "TruePos"
    if ref_ancestor != ROOT and ref_ancestor != NONE and tax.has_ancestor(
        test, ref_ancestor
    ):
        return "TruePos"
    if ref_ancestor in (ROOT, NONE) or tax.has_ancestor(ref, test):
        return "VaguePos"
    if test == ROOT:
        return "VaguePos"
    return "FalsePos"


def per_read_comparison(
    spark,
    cmp_df: DataFrame,
    ref_df: DataFrame,
    taxonomy: Taxonomy,
    rank_depth: int | None = None,
) -> dict:
    """Join test vs reference classifications on read id and compute
    sensitivity/PPV from hit categories (MappingComparison.scala:212-290).

    cmp_df: (id, taxon); ref_df: (id, ref_taxon).
    """
    bc = spark.sparkContext.broadcast(taxonomy)
    joint = ref_df.join(cmp_df, "id").select(
        F.col("ref_taxon"), F.col("taxon").alias("test_taxon")
    )

    def gen(batches):
        tax = bc.value
        for pdf in batches:
            cats = [
                hit_category(tax, int(r), int(t), rank_depth)
                for r, t in zip(pdf["ref_taxon"], pdf["test_taxon"])
            ]
            yield pd.DataFrame({"category": cats})

    cats = joint.mapInPandas(gen, "category string")
    counts = {
        r["category"]: r["n"]
        for r in cats.groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    tp = counts.get("TruePos", 0)
    fp = counts.get("FalsePos", 0)
    vp = counts.get("VaguePos", 0)
    fn = counts.get("FalseNeg", 0)
    total = tp + fp + vp + fn
    classified = tp + fp + vp
    return {
        "total_reads": total,
        "classified": classified,
        "tp": tp,
        "fp": fp,
        "vp": vp,
        "fn": fn,
        "sensitivity": tp / total if total else 0.0,
        "ppv": tp / (tp + fp) if tp + fp else 0.0,
    }


def per_taxon_comparison(
    spark,
    cmp_df: DataFrame,
    ref_df: DataFrame,
    taxonomy: Taxonomy,
    rank_depth: int,
    min_count: int = 1,
) -> dict:
    """Taxon-level precision/recall at a rank
    (MappingComparison.scala:170-210)."""
    bc = spark.sparkContext.broadcast(taxonomy)

    def to_level(col_df, col):
        def gen(batches):
            tax = bc.value
            for pdf in batches:
                lvl = [
                    tax.ancestor_at_level(int(t), rank_depth)
                    for t in pdf[col]
                ]
                yield pd.DataFrame({"taxon": lvl})

        return col_df.mapInPandas(gen, "taxon long").where(F.col("taxon") != NONE)

    ref_taxa = {
        r["taxon"]
        for r in to_level(ref_df.select(F.col("ref_taxon").alias("t")), "t")
        .distinct()
        .collect()
    }
    cmp_counts = (
        to_level(cmp_df.select(F.col("taxon").alias("t")), "t")
        .groupBy("taxon")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .collect()
    )
    cmp_taxa = {r["taxon"] for r in cmp_counts}
    vague = taxonomy.taxa_with_ancestors(ref_taxa) - ref_taxa
    tp = len(ref_taxa & cmp_taxa)
    fp = len((cmp_taxa - ref_taxa) - vague)
    vp = len(cmp_taxa & vague)
    fn = len(ref_taxa - cmp_taxa)
    denom = len(cmp_taxa - vague)
    return {
        "tp": tp,
        "fp": fp,
        "vp": vp,
        "fn": fn,
        "precision": tp / denom if denom else 0.0,
        "recall": tp / len(ref_taxa) if ref_taxa else 0.0,
    }


# ---------------------------------------------------------------------------
# Index-vs-index comparison (analysis/MinimizerMigration.scala:44-72)
# ---------------------------------------------------------------------------


def compare_indexes(a: KeyValueIndex, b: KeyValueIndex) -> DataFrame:
    """Full-outer null-safe alignment of two record sets → migration
    categories per minimizer: 'same' (LCA unchanged), 'moved' (different
    taxon), 'only_a', 'only_b'. One shuffle on the id columns."""
    def _id(idx: KeyValueIndex):
        key = [c for c in idx.cfg.key_cols if c in idx.records.columns]
        return F.struct(*key) if len(key) > 1 else F.col(key[0])

    id_a, id_b = _id(a), _id(b)
    ra = a.records.select(id_a.alias("id_a"), F.col("taxon").alias("taxon_a"))
    rb = b.records.select(id_b.alias("id_b"), F.col("taxon").alias("taxon_b"))
    joined = ra.join(rb, F.col("id_a").eqNullSafe(F.col("id_b")), "full_outer")
    cat = (
        F.when(F.col("id_a").isNull(), "only_b")
        .when(F.col("id_b").isNull(), "only_a")
        .when(F.col("taxon_a") == F.col("taxon_b"), "same")
        .otherwise("moved")
    )
    return joined.select(cat.alias("category")).groupBy("category").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# UniFrac (analysis/UniFrac.scala:26-50)
# ---------------------------------------------------------------------------


def unifrac_distance(tax: Taxonomy, sample1: set[int], sample2: set[int]) -> float:
    """Unweighted UniFrac: unique-path length over total path length of
    the two samples' ancestor closures (ROOT excluded)."""
    tree1 = tax.taxa_with_ancestors(sample1) - {ROOT}
    tree2 = tax.taxa_with_ancestors(sample2) - {ROOT}
    shared = tree1 & tree2
    both = tax.taxa_with_ancestors(sample1 | sample2) - {ROOT}
    unique = len(tree1 - shared) + len(tree2 - shared)
    return unique / len(both) if both else 0.0


# ---------------------------------------------------------------------------
# Index statistics (IndexStatistics.scala:55-111, KeyValueIndex.scala:308-336)
# ---------------------------------------------------------------------------


def taxon_coverage_stats(
    index: KeyValueIndex, genomes: DataFrame, labels: DataFrame
) -> DataFrame:
    """Per input taxon: fraction of its minimizer occurrences whose index
    record resolves to the SAME (leaf) taxon rather than an ancestor —
    how identifiable each genome is (showTaxonCoverageStats)."""
    labelled = genomes.join(F.broadcast(labels), "header")
    mins = extract_index_rows(labelled, index.cfg, index.table_bc)
    key = index.cfg.key_cols
    agg = mins.groupBy(*key, "taxon").agg(F.count(F.lit(1)).alias("count_all"))
    rec = index.records.withColumnRenamed("taxon", "idx_taxon")
    joint = agg.join(rec, key, "left").withColumn(
        "count_leaf",
        F.when(F.col("idx_taxon") == F.col("taxon"), F.col("count_all")).otherwise(
            F.lit(0)
        ),
    )
    return joint.groupBy("taxon").agg(
        (F.sum("count_leaf") / F.sum("count_all")).alias("frac_leaf"),
        F.sum("count_all").cast("long").alias("total"),
    )


def depth_histogram(index: KeyValueIndex) -> DataFrame:
    """Records per taxon structural depth (KeyValueIndex.scala:308-336)."""
    tax = index.taxonomy
    sd = tax.sdepth
    pairs = [(int(t), int(sd[t])) for t in range(tax.n_nodes)]
    depth_df = index.spark.createDataFrame(pairs, "taxon int, depth int")
    return (
        index.records.join(F.broadcast(depth_df), "taxon", "left")
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy("depth")
    )


# ---------------------------------------------------------------------------
# Input-label stats (inputStats, GenomeLibrary.scala:81-107)
# ---------------------------------------------------------------------------


def input_label_stats(labels_df: DataFrame, tax: Taxonomy) -> dict:
    """Statistics for a seqid2taxid label set: unknown/non-leaf/valid
    label counts, implied tree size, and the missing-rank histogram with
    human-readable labels (numericalRankToStr — U4). Label sets are
    taxonomy-bounded, so the distinct collect matches the reference's
    driver-side collect (GenomeLibrary.scala:85)."""
    from slacken_spark.kernels.taxonomy import numerical_rank_to_str

    labelled = [
        int(r["taxon"]) for r in labels_df.select("taxon").distinct().collect()
    ]
    invalid = sorted(t for t in labelled if not tax.is_defined(t))
    valid = [t for t in labelled if tax.is_defined(t)]
    non_leaf = sorted(t for t in valid if not tax.is_leaf(t))
    implied_tree = len(tax.taxa_with_ancestors(valid))
    hist: dict[int, int] = {}
    for t in valid:
        for lvl in tax.missing_steps_to_root(t):
            hist[lvl] = hist.get(lvl, 0) + 1
    return {
        "unknown_labels": invalid,
        "n_unknown": len(invalid),
        "n_non_leaf": len(non_leaf),
        "n_valid": len(valid),
        "implied_tree_size": implied_tree,
        "max_leaf_nodes": len(valid) - len(non_leaf),
        "missing_rank_histogram": [
            {
                "missing_level": lvl,
                "count": hist[lvl],
                "label": numerical_rank_to_str(lvl),
            }
            for lvl in sorted(hist)
        ],
    }


# ---------------------------------------------------------------------------
# Metrics TSV writer (MappingComparison.scala:31-113, metrics/README.md)
# ---------------------------------------------------------------------------

METRICS_HEADER = (
    "title\tfamily\tgroup\tsample\tlibrary\tk\tm\tfrequency\tfl\ts\tc\trank\t"
    "taxon_classified\ttaxon_total\ttaxon_precision\ttaxon_recall\t"
    "read_classified\tread_total\tread_tp\tread_fp\tread_vp\tread_fn\t"
    "read_ppv\tread_sensitivity\tread_index"
)

_TITLE_PATTERN = re.compile(
    r"(.*)/(.*)/(.+)_(\d+)_(\d+)_s(\d+)_c([\d.]+)_classified/sample=(.*)"
)


def metrics_tsv_line(
    title: str,
    rank: str | None,
    per_taxon: dict,
    per_read: dict,
) -> str | None:
    """One _metrics.tsv row (Metrics.toTSVString,
    MappingComparison.scala:51-65): extracts family/group/library/k/m/s/c
    /sample from the classified-output path; returns None (omitting the
    row) when the title doesn't match, like the reference."""
    m = _TITLE_PATTERN.match(title)
    if not m:
        return None
    family, group, library, k, mm, s, c, sample = m.groups()
    rank_str = rank if rank is not None else "All"
    pt = "\t".join(
        str(per_taxon[x]) for x in ("classified", "total", "precision", "recall")
    )
    pr = "\t".join(
        str(per_read[x])
        for x in (
            "classified",
            "total_reads",
            "tp",
            "fp",
            "vp",
            "fn",
            "ppv",
            "sensitivity",
            "index",
        )
    )
    return (
        f"{title}\t{family}\t{group}\t{sample}\t{library}\t{k}\t{mm}\t0\t0"
        f"\t{s}\t{c}\t{rank_str}\t{pt}\t{pr}"
    )


def write_metrics_tsv(location_prefix: str, lines: list[str]) -> str:
    """Write header + metric rows to ``<prefix>_metrics.tsv``
    (MappingComparison.scala:101-113)."""
    path = location_prefix + "_metrics.tsv"
    body = "\n".join([METRICS_HEADER] + [ln for ln in lines if ln is not None])
    fsio.write_text(path, body + "\n")
    return path


# ---------------------------------------------------------------------------
# CAMI → Kraken report conversion (analysis/CAMIToKrakenReport.scala:64-117)
# ---------------------------------------------------------------------------


class CAMIToKrakenReport:
    """Convert a CAMI read-mapping TSV (#anonymous_read_id genome_id
    tax_id) into a Kraken-format report, filtered at a minimum rank.

    Reads below the cutoff (after primary-id remap) are dropped; counts
    halve to convert single reads to pairs, then clade-roll through
    KrakenReport (CAMIToKrakenReport.scala:64-117)."""

    def __init__(
        self,
        spark,
        mapping_location: str,
        tax: Taxonomy,
        min_rank_depth: int | None = None,
    ):
        self.spark = spark
        self.tax = tax
        bc = spark.sparkContext.broadcast(tax)

        raw = (
            spark.read.option("sep", "\t")
            .option("header", "true")
            .csv(mapping_location)
        )
        cols = raw.columns
        id_col, taxon_col = cols[0], cols[2]

        def keep(batches):
            t = bc.value
            for pdf in batches:
                ids = pdf[id_col].astype(str)
                taxa = pdf[taxon_col].astype("int64")
                prim = (
                    t.primary[taxa.to_numpy()]
                    if t.primary is not None
                    else taxa.to_numpy()
                )
                if min_rank_depth is None:
                    ok = prim == prim  # all
                else:
                    dv = t.depth_vector()
                    ok = dv[prim] >= min_rank_depth
                yield pd.DataFrame({"id": ids[ok], "taxon": prim[ok]})

        self.filtered = raw.mapInPandas(keep, "id string, taxon long")

    def filtered_ids(self) -> list[str]:
        return [r["id"] for r in self.filtered.select("id").collect()]

    def write_filtered_ids(self, location: str) -> None:
        fsio.write_text(location, "\n".join(self.filtered_ids()) + "\n")

    def filtered_report(self):
        """KrakenReport over floor(count/2) per taxon (single→paired)."""
        from slacken_spark.classify import KrakenReport

        counts = (
            self.filtered.groupBy("taxon")
            .agg(F.floor(F.count(F.lit(1)) / 2).alias("n"))
            .collect()
        )
        pairs = [(int(r["taxon"]), int(r["n"])) for r in counts]
        return KrakenReport(self.tax, pairs)

    def write_filtered_report(self, location: str) -> None:
        fsio.write_text(
            location, "\n".join(self.filtered_report().lines()) + "\n"
        )


# ---------------------------------------------------------------------------
# Report filtering / display (analysis/DisplayReport.scala:28-113)
# ---------------------------------------------------------------------------

RANK_CODE_DEPTH = {
    "U": -1,
    "R": 0,
    "D": 1,
    "K": 2,
    "P": 3,
    "C": 4,
    "O": 5,
    "F": 6,
    "G": 7,
    "S": 8,
}


def num_rank_for_code(code: str) -> int:
    """Rank code letter → standardised depth; unknown codes (e.g. '-',
    'D1' suffixes already stripped) map to Unclassified (-1)
    (DisplayReport.numRankForCode)."""
    return RANK_CODE_DEPTH.get(code, -1)


def filter_report(
    lines,
    level_cutoff: int | None = None,
    min_percent: float | None = None,
    clades: set[int] | None = None,
):
    """Filter Kraken/Slacken report lines (DisplayReport.filterReport,
    DisplayReport.scala:43-84): drop comments, apply a minimum clade
    percentage, a standardised-rank cutoff (numeric suffixes like G1
    stripped), and — when ``clades`` is given — keep only those taxa and
    their descendants, tracked through the report's indentation levels.
    Yields accepted lines in order."""
    last_indent = float("inf")
    for line in lines:
        if line.startswith("#"):
            continue
        spl = line.split("\t")
        frac = float(spl[0])
        if min_percent is not None and frac < min_percent:
            continue
        level = re.sub(r"[0-9]+", "", spl[3])
        num_level = num_rank_for_code(level)
        if level_cutoff is not None and num_level > level_cutoff:
            continue
        taxon = int(spl[4])
        indent = len(re.match(r"\s*", spl[5]).group(0))
        in_clades = clades is None or taxon in clades
        if in_clades and last_indent > indent:
            # accept this taxon and the tree below it
            last_indent = indent
        if clades is None or taxon in clades or indent > last_indent:
            yield line
        else:
            last_indent = float("inf")  # not accepting the current subtree


# ---------------------------------------------------------------------------
# Total k-mer count report (IndexStatistics.scala:38-52, 114-210)
# ---------------------------------------------------------------------------


class TotalKmerSizeAggregator:
    """Clade k-mer-count averages over per-taxon genome sizes
    (TotalKmerSizeAggregator, IndexStatistics.scala:130-210):
    S1 = average over all leaf genomes in the clade, S2 = average of the
    immediate children's averages, S3 = the weighted blend of both."""

    def __init__(self, tax: Taxonomy, genome_sizes: dict[int, int]):
        self.tax = tax
        self.sizes = dict(genome_sizes)
        # post-order: (sum of genome sizes in the clade incl. self, count)
        self.tree: dict[int, tuple[int, int]] = {}
        stack: list[tuple[int, bool]] = [(ROOT, False)]
        while stack:
            t, expanded = stack.pop()
            ch = self.tax.children[t]
            if not expanded and ch:
                stack.append((t, True))
                stack.extend((c, False) for c in ch)
                continue
            s = self.sizes.get(t, 0)
            n = 1 if t in self.sizes else 0
            for c in ch:
                cs, cn = self.tree[c]
                s += cs
                n += cn
            self.tree[t] = (s, n)

    def _children_sum(self, t: int) -> tuple[int, int]:
        ch = self.tax.children[t]
        if not ch:
            return self.tree[t]
        s = n = 0
        for c in ch:
            cs, cn = self.tree[c]
            s += cs
            n += cn
        return s, n

    def s1(self, t: int) -> float:
        """Average k-mer count among the clade's genomes (TKC1-LeafOnly)."""
        s, n = self._children_sum(t)
        if t in self.sizes:
            s, n = s + self.sizes[t], n + 1
        return s / n if n else 0.0

    def s2(self, t: int) -> float:
        """Average of immediate children's averages (TKC2-FirstChildren)."""
        ch = self.tax.children[t]
        if ch:
            vals = [
                self.tree[c][0] / self.tree[c][1]
                for c in ch
                if self.tree[c][1] > 0
            ]
            if t in self.sizes:
                vals = [float(self.sizes[t])] + vals
            return sum(vals) / len(vals) if vals else 0.0
        s, n = self.tree[t]
        return s / n if n else 0.0

    def s3(self, t: int) -> float:
        """Weighted blend of S1 and S2 (TKC3-AllChildren)."""
        nz = [self.tree[c] for c in self.tax.children[t] if self.tree[c][1] > 0]
        if nz:
            s = sum(x[0] for x in nz)
            n = sum(x[1] for x in nz)
        else:
            s, n = self.tree[t]
        n_nz = len(nz)
        if n + n_nz == 0:
            return 0.0
        return (self.s1(t) * n + self.s2(t) * n_nz) / (n + n_nz)


def per_taxon_kmer_counts(
    index: KeyValueIndex, genomes: DataFrame, labels: DataFrame
) -> dict[int, int]:
    """Total (with duplicates) k-mer count per input taxon — the
    superkmerPositions length sum of totalKmerCountReport
    (IndexStatistics.scala:43-49), computed from FLAG_SEQUENCE spans."""
    from slacken_spark.index import extract_spans
    from slacken_spark.kernels.minimizers import FLAG_SEQUENCE

    labelled = genomes.join(F.broadcast(labels), "header")
    spans = extract_spans(labelled.select("header", "nucleotides"), index.cfg,
                          index.table_bc)
    per_header = (
        spans.where(F.col("flag") == FLAG_SEQUENCE)
        .groupBy("header")
        .agg(F.sum("kmers").alias("n_kmers"))
    )
    rows = (
        per_header.join(F.broadcast(labels), "header")
        .groupBy("taxon")
        .agg(F.sum("n_kmers").alias("n"))
        .collect()
    )
    return {int(r["taxon"]): int(r["n"]) for r in rows}


def total_kmer_count_report(
    index: KeyValueIndex, genomes: DataFrame, labels: DataFrame
):
    """KrakenReport over index record counts with three extra TKC
    columns per line (TotalKmerCountReport, IndexStatistics.scala:114-129)."""
    from slacken_spark.classify import KrakenReport

    counts = [
        (int(r["taxon"]), int(r["n"]))
        for r in index.records.groupBy("taxon")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    sizes = per_taxon_kmer_counts(index, genomes, labels)
    agg = TotalKmerSizeAggregator(index.taxonomy, sizes)
    rep = KrakenReport(index.taxonomy, counts)
    base = rep.lines()

    def extend(line: str) -> str:
        taxid = int(line.split("\t")[4])
        if taxid == NONE:
            return line
        return (
            f"{line}\t{round(agg.s1(taxid))}"
            f"\t{round(agg.s2(taxid))}\t{round(agg.s3(taxid))}"
        )

    return [extend(line) for line in base]


def taxon_full_coverage_stats(
    index: KeyValueIndex, genomes: DataFrame, labels: DataFrame
) -> DataFrame:
    """Per input taxon: '<lca-depth>:<count>|…' concat of minimizer
    occurrences (and distinct minimizers) by the structural depth of
    their index LCA (showTaxonFullCoverageStats + depthCountConcat,
    IndexStatistics.scala:86-111, U10). Depths via the broadcast
    depth_vector — no per-row Python."""
    from slacken_spark.index import extract_index_rows

    labelled = genomes.join(F.broadcast(labels), "header")
    mins = extract_index_rows(labelled, index.cfg, index.table_bc)
    key = index.cfg.key_cols
    min_counts = mins.groupBy(*key, "taxon").agg(
        F.count(F.lit(1)).alias("countAll"), F.lit(1).cast("long").alias("countDistinct")
    )
    rec = index.records.withColumnRenamed("taxon", "idx_taxon")
    dv = index.taxonomy.depth_vector()
    bc = index.spark.sparkContext.broadcast(dv)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def taxon_depth(t: pd.Series) -> pd.Series:
        d = bc.value
        tv = t.fillna(-1).to_numpy(dtype="int64")
        import numpy as np

        out = np.full(len(tv), -1, dtype="int32")
        ok = (tv >= 0) & (tv < len(d))
        out[ok] = d[tv[ok]]
        return pd.Series(out)

    def concat(depths: str, cnts: str):
        return F.array_join(
            F.transform(
                F.arrays_zip(depths, cnts),
                lambda z: F.concat_ws(":", z[depths], z[cnts]),
            ),
            "|",
        )

    by_depth = (
        min_counts.join(rec, key)
        .withColumn("idxTaxDepth", taxon_depth(F.col("idx_taxon")))
        .groupBy("taxon", "idxTaxDepth")
        .agg(
            F.sum("countAll").alias("sumAll"),
            F.sum("countDistinct").alias("sumDistinct"),
        )
        .groupBy("taxon")
        .agg(
            F.collect_list("idxTaxDepth").alias("lcaDepths"),
            F.collect_list("sumAll").alias("allCnts"),
            F.collect_list("sumDistinct").alias("distCnts"),
        )
    )
    return by_depth.select(
        "taxon",
        concat("lcaDepths", "allCnts").alias("minimizerCoverage"),
        concat("lcaDepths", "distCnts").alias("distinctMinimizerCoverage"),
    )
