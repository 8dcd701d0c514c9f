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
        ).select(
            "taxon",
            F.col("id1").alias("minimizer"),
            F.col("id2").alias("minimizer2"),
        )

    def total_minimizers_per_taxon(self, reads: DataFrame) -> list[tuple[int, int]]:
        rows = (
            self._minimizers_in_subjects(reads)
            .groupBy("taxon")
            .agg(F.count("minimizer").alias("count"))
            .collect()
        )
        return [(r["taxon"], r["count"]) for r in rows]

    def distinct_minimizers_per_taxon(self, reads: DataFrame) -> list[tuple[int, int]]:
        rows = (
            self._minimizers_in_subjects(reads)
            .groupBy("taxon")
            .agg(F.count_distinct("minimizer", "minimizer2").alias("count"))
            .collect()
        )
        return [(r["taxon"], r["count"]) for r in rows]

    def minimizer_fraction_per_taxon(
        self, reads: DataFrame
    ) -> list[tuple[int, float]]:
        """Fraction of each taxon's index minimizers seen in the sample
        (minimizerFractionPerTaxon, Dynamic.scala:121-129): distinct in
        sample ÷ distinct in records, joined per taxon."""
        in_sample = dict(self.distinct_minimizers_per_taxon(reads))
        if not in_sample:
            return []
        import numpy as np

        from slacken_spark.kernels.taxonomy import member_mask_udf

        mask = np.zeros(self.taxonomy.n_nodes, dtype=bool)
        mask[
            np.asarray(
                [t for t in in_sample if 0 <= t < self.taxonomy.n_nodes],
                dtype=np.int64,
            )
        ] = True
        member = member_mask_udf(self.base.spark, mask)
        in_records = {
            r["taxon"]: r["n_minimizers"]
            for r in self.base.distinct_minimizers_per_taxon()
            .where(member(F.col("taxon")))
            .collect()
        }
        return [
            (t, in_sample[t] / in_records[t])
            for t in in_sample
            if in_records.get(t)
        ]

    def classified_reads_per_taxon(
        self, reads: DataFrame, confidence: float
    ) -> list[tuple[int, int]]:
        cls = Classifier(self.base)
        out = cls.classify(reads, self.cpar, threshold=confidence)
        rows = (
            out.where("classified")
            .groupBy("taxon")
            .agg(F.count(F.lit(1)).alias("count"))
            .collect()
        )
        return [(r["taxon"], r["count"]) for r in rows]

    # ---------------- CountFilter + set detection (Dynamic.scala:191-280) ----

    def count_filter(self, counts: list[tuple[int, int]], threshold: int) -> set[int]:
        tax = self.taxonomy
        rollup = clade_totals(tax, counts)
        return {
            t
            for t in rollup
            if tax.depth(t) >= self.rank_depth and rollup[t] >= threshold
        }

    def find_taxon_set(self, reads: DataFrame) -> set[int]:
        c = self.criterion
        if isinstance(c, MinimizerTotalCount):
            counts = self.total_minimizers_per_taxon(reads)
        elif isinstance(c, MinimizerDistinctCount):
            counts = self.distinct_minimizers_per_taxon(reads)
        elif isinstance(c, ClassifiedReadCount):
            counts = self.classified_reads_per_taxon(reads, c.confidence)
        elif isinstance(c, MinimizerFraction):
            # fractions don't clade-roll (a parent's fraction is not the
            # sum of children's) — filter directly at the rank
            tax = self.taxonomy
            keep = {
                t
                for t, frac in self.minimizer_fraction_per_taxon(reads)
                if tax.depth(t) >= self.rank_depth and frac >= c.threshold
            }
            return tax.taxa_with_descendants(keep)
        else:
            raise ValueError(f"unknown criterion {c!r}")
        keep = self.count_filter(counts, c.threshold)
        return self.taxonomy.taxa_with_descendants(keep)

    def read_gold_set(
        self,
        path: str,
        promote_rank_depth: int | None = None,
    ) -> set[int]:
        """Load a gold taxon set from a 1-column CSV (readGoldSet,
        Dynamic.scala:284-312): remap merged ids through ``primary``,
        promote taxa absent from the library to their nearest ancestor
        present in it, filter at the reclassify rank (keeping promoted
        taxa at/below ``promote_rank_depth`` when given)."""
        spark = self.base.spark
        tax = self.taxonomy
        raw = {
            int(r["_c0"])
            for r in spark.read.csv(path).collect()
        }
        primary = tax.primary
        gold = {
            int(primary[t]) if primary is not None and t < len(primary) else t
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
