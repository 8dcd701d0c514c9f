"""Two-step (dynamic) classification: detect a taxon set in the sample,
build a restricted index for it, re-classify.

Re-expresses the reference's Dynamic pipeline
(reference: slacken/Dynamic.scala:31-380):
  step 1: count minimizer/read evidence per taxon (criteria
    MinimizerTotalCount / MinimizerDistinctCount / ClassifiedReadCount),
    clade-rollup the counts (TreeAggregator) and keep taxa at/below the
    reclassify rank whose clade total meets the threshold (CountFilter),
    expand with all descendants;
  step 2: rebuild records restricted to the detected set
    (base.makeRecords(…, taxonSet)) and classify against the dynamic
    index.

Gold-set evaluation (readGoldSet / precision-recall) is included for
parity with Dynamic.scala:265-312.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slacken_spark.classify import Classifier, ClassifyParams
from slacken_spark.index import KeyValueIndex, extract_spans
from slacken_spark.kernels.taxonomy import (
    AMBIGUOUS_SPAN,
    MATE_PAIR_BORDER,
    Taxonomy,
    ancestors_udf,
    member_mask_udf,
)


@dataclass(frozen=True)
class MinimizerTotalCount:
    threshold: int


@dataclass(frozen=True)
class MinimizerDistinctCount:
    threshold: int


@dataclass(frozen=True)
class ClassifiedReadCount:
    threshold: int
    confidence: float = 0.15


@dataclass(frozen=True)
class MinimizerFraction:
    """Keep taxa whose fraction of index minimizers observed in the
    sample meets the threshold. (The reference declares this criterion
    but leaves it unimplemented — Dynamic.scala:255 `???`; the counting
    helper exists at Dynamic.scala:121-129 and this completes it.)"""

    threshold: float


def clade_totals(taxonomy: Taxonomy, counts: list[tuple[int, int]]) -> dict[int, int]:
    """TreeAggregator: add each taxon's count to every ancestor
    (KrakenReport.scala:26-41)."""
    out: dict[int, int] = {}
    for t, c in counts:
        if t <= 0:
            continue
        for p in taxonomy.path_to_root(t):
            out[p] = out.get(p, 0) + c
    return out


def clade_rollup(spark, taxonomy: Taxonomy, counts: DataFrame) -> DataFrame:
    """Distributed TreeAggregator: explode each taxon's ancestor path
    (broadcast-taxonomy pandas UDF) and sum per ancestor — each taxon's
    count is added to every node on its path to root
    (KrakenReport.scala:26-41), with the addition running as a
    partial-aggregated groupBy instead of a driver-side dict.
    Input: (taxon, count); output: (taxon, count) clade totals."""
    anc = ancestors_udf(spark, taxonomy)
    return (
        counts.where(F.col("taxon") > 0)
        .select(F.explode(anc(F.col("taxon"))).alias("taxon"), "count")
        .groupBy("taxon")
        .agg(F.sum("count").alias("count"))
    )


class Dynamic:
    def __init__(
        self,
        base: KeyValueIndex,
        genomes: DataFrame,
        labels: DataFrame,
        criterion,
        reclassify_rank_depth: int = 8,  # species
        cpar: ClassifyParams | None = None,
    ):
        self.base = base
        self.genomes = genomes
        self.labels = labels
        self.criterion = criterion
        self.rank_depth = reclassify_rank_depth
        self.cpar = cpar or ClassifyParams()

    @property
    def taxonomy(self) -> Taxonomy:
        return self.base.taxonomy

    # ---------------- step-1 counting (Dynamic.scala:95-142) ----------------

    def _minimizers_in_subjects(self, reads: DataFrame) -> DataFrame:
        """(taxon, minimizer) hits at/below the reclassify rank.

        Depth filtering happens executor-side through a broadcast
        defined∧depth mask (the reference applies the depth filter via
        the broadcast taxonomy, Dynamic.scala:95-107) — a literal
        ``isin`` over every at/below-rank taxon would be millions of
        literals on a real taxonomy."""
        spans = extract_spans(reads, self.base.cfg, self.base.table_bc)
        hits = self.base.span_hits_with_minimizer(spans)
        tax = self.taxonomy
        mask = tax.defined_mask() & (tax.depth_vector() >= self.rank_depth)
        member = member_mask_udf(self.base.spark, mask)
        return hits.where(
            (F.col("taxon") != AMBIGUOUS_SPAN)
            & (F.col("taxon") != MATE_PAIR_BORDER)
            & member(F.col("taxon"))
        ).select("taxon", *self.base.cfg.id_cols)

    def total_minimizers_per_taxon_df(self, reads: DataFrame) -> DataFrame:
        return (
            self._minimizers_in_subjects(reads)
            .groupBy("taxon")
            .agg(F.count("id1").alias("count"))
        )

    def total_minimizers_per_taxon(self, reads: DataFrame) -> list[tuple[int, int]]:
        rows = self.total_minimizers_per_taxon_df(reads).collect()
        return [(r["taxon"], r["count"]) for r in rows]

    def distinct_minimizers_per_taxon_df(self, reads: DataFrame) -> DataFrame:
        return (
            self._minimizers_in_subjects(reads)
            .groupBy("taxon")
            .agg(F.count_distinct(*self.base.cfg.id_cols).alias("count"))
        )

    def distinct_minimizers_per_taxon(self, reads: DataFrame) -> list[tuple[int, int]]:
        rows = self.distinct_minimizers_per_taxon_df(reads).collect()
        return [(r["taxon"], r["count"]) for r in rows]

    def minimizer_fraction_per_taxon_df(self, reads: DataFrame) -> DataFrame:
        """Fraction of each taxon's index minimizers seen in the sample
        (minimizerFractionPerTaxon, Dynamic.scala:121-129): distinct in
        sample ÷ distinct in records, as a per-taxon join. The sample
        side (taxa detected in one sample) is broadcast against the
        index-wide distinct counts — no driver-side dicts."""
        in_sample = self.distinct_minimizers_per_taxon_df(reads).withColumnRenamed(
            "count", "n_sample"
        )
        in_records = self.base.distinct_minimizers_per_taxon()
        return in_records.join(F.broadcast(in_sample), "taxon").select(
            "taxon",
            (F.col("n_sample") / F.col("n_minimizers")).alias("fraction"),
        )

    def minimizer_fraction_per_taxon(
        self, reads: DataFrame
    ) -> list[tuple[int, float]]:
        rows = self.minimizer_fraction_per_taxon_df(reads).collect()
        return [(r["taxon"], r["fraction"]) for r in rows]

    def classified_reads_per_taxon_df(
        self, reads: DataFrame, confidence: float
    ) -> DataFrame:
        cls = Classifier(self.base)
        out = cls.classify(reads, self.cpar, threshold=confidence)
        return (
            out.where("classified")
            .groupBy("taxon")
            .agg(F.count(F.lit(1)).alias("count"))
        )

    def classified_reads_per_taxon(
        self, reads: DataFrame, confidence: float
    ) -> list[tuple[int, int]]:
        rows = self.classified_reads_per_taxon_df(reads, confidence).collect()
        return [(r["taxon"], r["count"]) for r in rows]

    # ---------------- CountFilter + set detection (Dynamic.scala:191-280) ----

    def clade_rollup_df(self, counts: DataFrame) -> DataFrame:
        """Distributed TreeAggregator over this taxonomy — see
        :func:`clade_rollup`."""
        return clade_rollup(self.base.spark, self.taxonomy, counts)

    def count_filter_df(self, counts: DataFrame, threshold: int) -> DataFrame:
        """CountFilter (Dynamic.scala:191-214) over clade totals: keep
        taxa at/below the reclassify rank whose clade total meets the
        threshold. Depth check runs executor-side via a broadcast mask."""
        tax = self.taxonomy
        at_rank = member_mask_udf(
            self.base.spark, tax.depth_vector() >= self.rank_depth
        )
        return self.clade_rollup_df(counts).where(
            (F.col("count") >= threshold) & at_rank(F.col("taxon"))
        )

    def count_filter(self, counts: list[tuple[int, int]], threshold: int) -> set[int]:
        tax = self.taxonomy
        rollup = clade_totals(tax, counts)
        return {
            t
            for t in rollup
            if tax.depth(t) >= self.rank_depth and rollup[t] >= threshold
        }

    def find_taxon_set(self, reads: DataFrame) -> set[int]:
        """Criterion counts → clade rollup → CountFilter → descendant
        expansion. Everything up to the final (taxonomy-bounded) taxon
        set is a DataFrame plan; only the detected set is collected, as
        the reference does before broadcasting it into the step-2 build
        (Dynamic.scala:320-374)."""
        c = self.criterion
        if isinstance(c, MinimizerTotalCount):
            counts = self.total_minimizers_per_taxon_df(reads)
        elif isinstance(c, MinimizerDistinctCount):
            counts = self.distinct_minimizers_per_taxon_df(reads)
        elif isinstance(c, ClassifiedReadCount):
            counts = self.classified_reads_per_taxon_df(reads, c.confidence)
        elif isinstance(c, MinimizerFraction):
            # fractions don't clade-roll (a parent's fraction is not the
            # sum of children's) — filter directly at the rank
            tax = self.taxonomy
            at_rank = member_mask_udf(
                self.base.spark, tax.depth_vector() >= self.rank_depth
            )
            kept = (
                self.minimizer_fraction_per_taxon_df(reads)
                .where((F.col("fraction") >= c.threshold) & at_rank(F.col("taxon")))
                .select("taxon")
                .collect()
            )
            return tax.taxa_with_descendants({r["taxon"] for r in kept})
        else:
            raise ValueError(f"unknown criterion {c!r}")
        keep = {
            r["taxon"]
            for r in self.count_filter_df(counts, c.threshold).select("taxon").collect()
        }
        return self.taxonomy.taxa_with_descendants(keep)

    def read_gold_set(
        self,
        path: str,
        promote_rank_depth: int | None = None,
    ) -> set[int]:
        """Load a gold taxon set from a 1-column CSV (readGoldSet,
        Dynamic.scala:284-312): remap merged ids through ``primary``,
        promote taxa absent from the library to their nearest ancestor
        present in it, filter at the reclassify rank.
        ``promote_rank_depth`` is a RELAXATION for promoted taxa only:
        they are ADDITIONALLY kept at/below that depth even when it is
        above the reclassify rank (promoted taxa at/below the
        reclassify rank are always kept, so a value deeper than the
        reclassify rank has no effect)."""
        spark = self.base.spark
        tax = self.taxonomy
        raw = {
            int(r["_c0"])
            for r in spark.read.csv(path).collect()
        }
        primary = tax.primary
        gold = {
            int(primary[t]) if primary is not None and 0 <= t < len(primary) else t
            for t in raw
        }
        library = {
            int(r["taxon"])
            for r in self.labels.select("taxon").distinct().collect()
        }
        not_found = gold - library
        promoted = set()
        for t in not_found:
            if not (0 < t < tax.n_nodes):
                continue  # unknown taxon, not promotable
            for p in tax.path_to_root(t):
                if p in library:
                    promoted.add(p)
                    break
        kept_promoted = (
            {t for t in promoted if tax.depth(t) >= promote_rank_depth}
            if promote_rank_depth is not None
            else set()
        )
        total = gold | promoted
        return {
            t
            for t in total
            if 0 < t < tax.n_nodes and tax.depth(t) >= self.rank_depth
        } | kept_promoted

    def gold_set_metrics(
        self, detected: set[int], gold: set[int]
    ) -> dict[str, float]:
        """Precision/recall vs a gold taxon set (Dynamic.scala:265-274)."""
        tp = len(detected & gold)
        fp = len(detected - gold)
        fn = len(gold - detected)
        return {
            "tp": tp,
            "fp": fp,
            "fn": fn,
            "precision": tp / (tp + fp) if tp + fp else 0.0,
            "recall": tp / len(gold) if gold else 0.0,
        }

    # ---------------- step 2 (Dynamic.scala:320-374) ----------------

    def build_dynamic_index(self, taxon_set: set[int]) -> KeyValueIndex:
        return KeyValueIndex.build(
            self.base.spark,
            self.genomes,
            self.labels,
            self.taxonomy,
            self.base.cfg,
            buckets=self.base.buckets,
            taxon_filter=taxon_set,
        )

    def two_step_classify(self, reads: DataFrame) -> tuple[DataFrame, set[int]]:
        """Detect set → dynamic index → re-classify. Returns
        (classifications, detected taxon set)."""
        taxon_set = self.find_taxon_set(reads)
        dyn = self.build_dynamic_index(taxon_set)
        dyn.records = dyn.records.persist()
        cls = Classifier(dyn)
        return cls.classify(reads, self.cpar), taxon_set
