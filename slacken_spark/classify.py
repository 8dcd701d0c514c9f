"""Read classification against a KeyValueIndex + Kraken-style reports.

Spark-first re-expression of the reference's Classifier
(reference: slacken/Classifier.scala:60-250, TaxonCounts.scala:31-121,
KrakenReport.scala:26-115):

  pipeline: fragments → spans (scanner kernel in mapInPandas) →
  LEFT join bucketed records (only the spans side shuffles) →
  groupBy(header) collect ordered hits → per-read resolve_tree kernel
  (one Arrow batch per Python call) → per-read Kraken lines +
  driver-side tree report.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slacken_spark.index import KeyValueIndex, extract_spans
from slacken_spark.kernels.taxonomy import (
    AMBIGUOUS_SPAN,
    MATE_PAIR_BORDER,
    NONE,
    ROOT,
    Taxonomy,
)


@dataclass
class ClassifyParams:
    """Classifier.scala:60-61 ClassifyParams."""

    min_hit_groups: int = 2
    with_unclassified: bool = True
    thresholds: tuple[float, ...] = (0.0,)
    sample_regex: str | None = None
    per_read_output: bool = True


def taxon_counts_from_hits(
    taxa: np.ndarray, counts: np.ndarray
) -> tuple[list[int], list[int]]:
    """Merge consecutive equal taxa (TaxonCounts.fromHits,
    TaxonCounts.scala:31-48) — run-length reduction via reduceat."""
    if len(taxa) == 0:
        return [], []
    starts = np.empty(len(taxa), dtype=bool)
    starts[0] = True
    np.not_equal(taxa[1:], taxa[:-1], out=starts[1:])
    idx = np.flatnonzero(starts)
    merged = np.add.reduceat(counts, idx)
    return taxa[idx].tolist(), merged.tolist()


def pairs_in_order_string(taxa: list[int], counts: list[int]) -> str:
    """Kraken hit-detail string 'taxid:count …' with 'A' for ambiguous
    and '|:|' at the mate-pair border (TaxonCounts.scala:92-110)."""
    parts = []
    for t, c in zip(taxa, counts):
        if t == MATE_PAIR_BORDER:
            parts.append("|:|")
        elif t == AMBIGUOUS_SPAN:
            parts.append(f"A:{c}")
        else:
            parts.append(f"{t}:{c}")
    return " ".join(parts)


def length_string(taxa: list[int], counts: list[int], k: int) -> str:
    """'len' or 'len1|len2' for mate pairs (TaxonCounts.scala:113-121)."""
    if MATE_PAIR_BORDER in taxa:
        b = taxa.index(MATE_PAIR_BORDER)
        l1 = sum(counts[:b]) + (k - 1)
        l2 = sum(counts[b + 1 :]) + (k - 1)
        return f"{l1}|{l2}"
    return str(sum(counts) + (k - 1))


class Classifier:
    def __init__(self, index: KeyValueIndex):
        self.index = index

    def grouped_hits(self, fragments: DataFrame) -> DataFrame:
        """Fragments → (header, hits[], num_distinct)
        (collectHitsBySequence, Classifier.scala:70-96). Hits are
        array<struct<ordinal,taxon,count,distinct>> sorted by ordinal
        (struct comparison is field-order lexicographic, so array_sort
        replaces the kernel-side re-sort at Classifier.scala:136)."""
        spans = extract_spans(fragments, self.index.cfg, self.index.table_bc)
        hits = self.index.span_hits(spans)
        hit = F.struct(
            F.col("ordinal"), F.col("taxon"), F.col("count"), F.col("distinct")
        )
        grouped = (
            hits.select("header", hit.alias("hit"))
            .groupBy("header")
            .agg(
                F.array_sort(F.collect_list("hit")).alias("hits"),
                F.count_if(
                    F.col("hit.distinct") & (F.col("hit.taxon") != NONE)
                ).alias("num_distinct"),
            )
        )
        # project the ordered struct array to aligned primitive arrays:
        # Arrow hands primitive arrays to pandas as numpy (zero dict
        # boxing), which is what keeps the per-read kernel cheap
        return grouped.select(
            "header",
            "num_distinct",
            F.transform("hits", lambda h: h["taxon"]).alias("taxa"),
            F.transform("hits", lambda h: h["count"]).alias("counts"),
        )

    def classify(
        self, fragments: DataFrame, cpar: ClassifyParams | None = None,
        threshold: float | None = None,
    ) -> DataFrame:
        """Per-read classification
        → (sample_id, classified, header, taxon, length_string, hits_string).
        """
        cpar = cpar or ClassifyParams()
        threshold = cpar.thresholds[0] if threshold is None else threshold
        return self._classify_grouped(self.grouped_hits(fragments), cpar, threshold)

    def classify_multi(
        self, fragments: DataFrame, cpar: ClassifyParams
    ) -> dict[float, DataFrame]:
        """Classify at several confidence thresholds, caching the grouped
        hits across thresholds (Classifier.scala:156-170). Caller should
        unpersist via the returned frames' lineage when done."""
        grouped = self.grouped_hits(fragments)
        if len(cpar.thresholds) > 1:
            grouped = grouped.persist()
        out = {}
        for thr in cpar.thresholds:
            out[thr] = self._classify_grouped(grouped, cpar, thr)
        return out

    def _classify_grouped(self, grouped, cpar, threshold):
        """Internal: classification kernel over pre-grouped hits.

        Every stage is batched across the Arrow batch: run-merging of
        consecutive equal taxa (one boundary scan over the flattened hit
        lists), per-read totals via scatter-add, resolve_tree via the
        vectorized batch kernel, and even the Kraken detail strings —
        per-run 'taxid:count' pieces are built with vectorized string
        ops and joined per read (the one remaining per-read operation,
        a C-level str.join per group).
        """
        k = self.index.cfg.k
        min_hit_groups = cpar.min_hit_groups
        sample_regex = cpar.sample_regex
        bc_tax = self.index.spark.sparkContext.broadcast(self.index.taxonomy)

        def gen(batches):
            tax: Taxonomy = bc_tax.value
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                lens = np.fromiter(
                    (len(x) for x in pdf["taxa"]), dtype=np.int64, count=n
                )
                total_hits = int(lens.sum())
                flat_t = (
                    np.concatenate(
                        [np.asarray(x, dtype=np.int64) for x in pdf["taxa"]]
                    )
                    if total_hits
                    else np.empty(0, dtype=np.int64)
                )
                flat_c = (
                    np.concatenate(
                        [np.asarray(x, dtype=np.int64) for x in pdf["counts"]]
                    )
                    if total_hits
                    else np.empty(0, dtype=np.int64)
                )
                rid = np.repeat(np.arange(n, dtype=np.int64), lens)

                # run-merge consecutive equal taxa per read
                # (TaxonCounts.fromHits, batched)
                if total_hits:
                    start = np.empty(total_hits, dtype=bool)
                    start[0] = True
                    start[1:] = (flat_t[1:] != flat_t[:-1]) | (
                        rid[1:] != rid[:-1]
                    )
                    sidx = np.flatnonzero(start)
                    m_t = flat_t[sidx]
                    m_c = np.add.reduceat(flat_c, sidx)
                    m_rid = rid[sidx]
                else:
                    m_t = m_c = m_rid = np.empty(0, dtype=np.int64)

                is_border = m_t == MATE_PAIR_BORDER
                is_ambig = m_t == AMBIGUOUS_SPAN
                not_border = ~is_border
                tot = np.zeros(n, dtype=np.int64)
                np.add.at(tot, m_rid[not_border], m_c[not_border])
                required = np.ceil(threshold * tot)

                winners = np.zeros(n, dtype=np.int64)
                sel = not_border & ~is_ambig
                if sel.any():
                    seg_a, tax_a, cnt_a = m_rid[sel], m_t[sel], m_c[sel]
                    # merge duplicate (read, taxon) keys (resolve expects
                    # one entry per key); runs are read-major so seg is
                    # already sorted — sort within read by taxon
                    key = seg_a * (np.int64(1) << np.int64(32)) + tax_a
                    order = np.argsort(key, kind="stable")
                    key, seg_a, tax_a, cnt_a = (
                        key[order],
                        seg_a[order],
                        tax_a[order],
                        cnt_a[order],
                    )
                    first = np.empty(len(key), dtype=bool)
                    first[0] = True
                    np.not_equal(key[1:], key[:-1], out=first[1:])
                    idx = np.flatnonzero(first)
                    seg_a, tax_a = seg_a[idx], tax_a[idx]
                    cnt_a = np.add.reduceat(cnt_a, idx)
                    usegs, w = tax.resolve_tree_batch(
                        seg_a, tax_a, cnt_a, required[np.unique(seg_a)]
                    )
                    winners[usegs] = w

                num_distinct = pdf["num_distinct"].to_numpy()
                classified = (winners != NONE) & (num_distinct >= min_hit_groups)
                taxon_out = np.where(classified, winners, NONE).astype(np.int64)

                # ---- hits_string: vectorized per-run pieces, joined per
                # read (TaxonCounts.pairsInOrderString) ----
                if total_hits:
                    cstr = m_c.astype("U20")
                    pieces = np.char.add(
                        np.char.add(m_t.astype("U20"), ":"), cstr
                    )
                    pieces[is_ambig] = np.char.add("A:", cstr[is_ambig])
                    pieces[is_border] = "|:|"
                    hits_ser = (
                        pd.Series(pieces, index=m_rid)
                        .groupby(level=0)
                        .agg(" ".join)
                    )
                    hits_string = np.full(n, "", dtype=object)
                    hits_string[hits_ser.index.to_numpy()] = (
                        hits_ser.to_numpy()
                    )
                else:
                    hits_string = np.full(n, "", dtype=object)

                # ---- length_string: 'len' or 'len1|len2' at the mate
                # border (TaxonCounts.lengthString) ----
                has_border = np.zeros(n, dtype=bool)
                has_border[m_rid[is_border]] = True
                # runs strictly after the read's border (cumsum of border
                # markers, rebased per read)
                if total_hits:
                    bcum = np.cumsum(is_border.astype(np.int64))
                    read_first = np.empty(len(m_rid), dtype=bool)
                    read_first[0] = True
                    read_first[1:] = m_rid[1:] != m_rid[:-1]
                    base_at = np.zeros(n, dtype=np.int64)
                    fidx = np.flatnonzero(read_first)
                    base_at[m_rid[fidx]] = bcum[fidx] - is_border[
                        fidx
                    ].astype(np.int64)
                    after = (bcum - base_at[m_rid]) > 0  # incl. the border
                    l1 = np.zeros(n, dtype=np.int64)
                    l2 = np.zeros(n, dtype=np.int64)
                    pre = not_border & ~after
                    post = not_border & after
                    np.add.at(l1, m_rid[pre], m_c[pre])
                    np.add.at(l2, m_rid[post], m_c[post])
                else:
                    l1 = l2 = np.zeros(n, dtype=np.int64)
                single = (l1 + l2 + (k - 1)).astype("U20")
                dual = np.char.add(
                    np.char.add((l1 + (k - 1)).astype("U20"), "|"),
                    (l2 + (k - 1)).astype("U20"),
                )
                length_str = np.where(has_border, dual, single)

                sample = pd.Series(np.full(n, "all", dtype=object))
                if sample_regex:
                    ext = pdf["header"].str.extract(
                        f"({sample_regex})" if "(" not in sample_regex
                        else sample_regex,
                        expand=True,
                    )[0]
                    sample = ext.fillna("other")

                yield pd.DataFrame(
                    {
                        "sample_id": sample.to_numpy(),
                        "classified": classified,
                        "header": pdf["header"].to_numpy(),
                        "taxon": taxon_out.astype(np.int32),
                        "length_string": length_str,
                        "hits_string": hits_string,
                    }
                )

        return grouped.mapInPandas(
            gen,
            "sample_id string, classified boolean, header string, taxon int,"
            " length_string string, hits_string string",
        )

    def output_lines(self, classified: DataFrame) -> DataFrame:
        """Kraken 2 per-read line format 'C/U\\ttitle\\ttaxon\\tlen\\thits'
        (ClassifiedRead.outputLine, Classifier.scala:29-45)."""
        return classified.select(
            F.concat_ws(
                "\t",
                F.when(F.col("classified"), "C").otherwise("U"),
                F.col("header"),
                F.col("taxon"),
                F.col("length_string"),
                F.col("hits_string"),
            ).alias("classification"),
            F.col("sample_id").alias("sample"),
        )

    def write_output(self, classified: DataFrame, location: str, cpar: ClassifyParams):
        """Gzip text partitioned by sample (Classifier.scala:199-210)."""
        keep = classified if cpar.with_unclassified else classified.where("classified")
        (
            self.output_lines(keep)
            .coalesce(min(self.index.buckets, 1000))
            .write.mode("overwrite")
            .partitionBy("sample")
            .option("compression", "gzip")
            .text(location)
        )

    def reports_from_written(self, location: str) -> dict[str, list[str]]:
        """Re-read written per-sample classifications and build one
        Kraken report per sample (makeReportsFromClassifications,
        Classifier.scala:229-251): read back the gzip text (S12), count
        reads per taxon per sample, clade-roll each sample's tree."""
        import posixpath

        from slacken_spark.analysis import read_kraken_format
        from slacken_spark.fsio import list_dir

        out: dict[str, list[str]] = {}
        # any-FS directory listing (HDFSUtil.scala:76-98 contract) — a
        # glob() here would silently be local-only
        for d in list_dir(location, prefix="sample="):
            sample = posixpath.basename(d.rstrip("/")).split("=", 1)[1]
            back = read_kraken_format(self.index.spark, d)
            counts = [
                (r["taxon"], r["n"])
                for r in back.groupBy("taxon")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ]
            out[sample] = KrakenReport(self.index.taxonomy, counts).lines()
        return out

    def taxon_read_counts(self, classified: DataFrame) -> list[tuple[int, int]]:
        """Per-taxon read counts for the report (Classifier.scala:214-217)."""
        rows = (
            classified.groupBy("taxon")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return [(int(r["taxon"]), int(r["n"])) for r in rows]


class SQLClassifier:
    """The reports-only classification path (``--no-detailed``):
    arrays-of-primitives aggregation instead of per-read struct lists
    (SQLClassifier, Classifier.scala:259-367). Cheaper Arrow transfer —
    the shape recommended for the 100 TB path (SURVEY §4 perf note).
    """

    def __init__(self, index: KeyValueIndex):
        self.index = index

    def grouped_hits(self, fragments: DataFrame) -> DataFrame:
        """(header, num_distinct, total_count, taxa[], counts[]) — two-level
        aggregation (Classifier.scala:267-291); hit ordering is lost,
        which per-read-output doesn't need."""
        spans = extract_spans(fragments, self.index.cfg, self.index.table_bc)
        hits = self.index.span_hits(spans)
        lvl1 = hits.groupBy("header", "taxon").agg(
            F.sum("count").cast("int").alias("count"),
            F.count_if(F.col("distinct") & (F.col("taxon") != NONE))
            .cast("int")
            .alias("num_distinct"),
        )
        keep = F.col("taxon") != MATE_PAIR_BORDER
        keep_tax = keep & (F.col("taxon") != AMBIGUOUS_SPAN)
        return lvl1.groupBy("header").agg(
            F.sum("num_distinct").cast("int").alias("num_distinct"),
            F.sum(F.when(keep, F.col("count"))).cast("int").alias("total_count"),
            F.collect_list(F.when(keep_tax, F.col("taxon"))).alias("taxa"),
            F.collect_list(F.when(keep_tax, F.col("count"))).alias("counts"),
        )

    def classify(
        self,
        fragments: DataFrame,
        cpar: ClassifyParams | None = None,
        threshold: float | None = None,
    ) -> DataFrame:
        """→ (sample_id, classified, taxon). classifySimple semantics:
        min-hit-groups gate in SQL, resolve_tree in one Arrow-batched UDF."""
        cpar = cpar or ClassifyParams(per_read_output=False)
        threshold = cpar.thresholds[0] if threshold is None else threshold
        bc_tax = self.index.spark.sparkContext.broadcast(self.index.taxonomy)
        min_hit_groups = cpar.min_hit_groups
        sample_regex = cpar.sample_regex
        grouped = self.grouped_hits(fragments)

        def gen(batches):
            tax: Taxonomy = bc_tax.value
            for pdf in batches:
                n = len(pdf)
                if n == 0:
                    continue
                num_distinct = pdf["num_distinct"].to_numpy()
                gate = num_distinct >= min_hit_groups
                total = pdf["total_count"].fillna(0).to_numpy(dtype=np.float64)
                required = np.ceil(threshold * total)
                lens = np.fromiter(
                    (len(x) for x in pdf["taxa"]), dtype=np.int64, count=n
                )
                winners = np.zeros(n, dtype=np.int64)
                if lens.sum():
                    rid = np.repeat(np.arange(n, dtype=np.int64), lens)
                    flat_t = np.concatenate(
                        [np.asarray(x, dtype=np.int64) for x in pdf["taxa"]]
                    )
                    flat_c = np.concatenate(
                        [np.asarray(x, dtype=np.int64) for x in pdf["counts"]]
                    )
                    keep = gate[rid]
                    seg_a, tax_a, cnt_a = rid[keep], flat_t[keep], flat_c[keep]
                    if len(seg_a):
                        key = seg_a * (np.int64(1) << np.int64(32)) + tax_a
                        order = np.argsort(key, kind="stable")
                        key, seg_a, tax_a, cnt_a = (
                            key[order],
                            seg_a[order],
                            tax_a[order],
                            cnt_a[order],
                        )
                        first = np.empty(len(key), dtype=bool)
                        first[0] = True
                        np.not_equal(key[1:], key[:-1], out=first[1:])
                        idx = np.flatnonzero(first)
                        seg_a, tax_a = seg_a[idx], tax_a[idx]
                        cnt_a = np.add.reduceat(cnt_a, idx)
                        usegs, w = tax.resolve_tree_batch(
                            seg_a, tax_a, cnt_a, required[np.unique(seg_a)]
                        )
                        winners[usegs] = w
                winners[~gate] = NONE
                sample = pd.Series(np.full(n, "all", dtype=object))
                if sample_regex:
                    ext = pdf["header"].str.extract(
                        f"({sample_regex})" if "(" not in sample_regex
                        else sample_regex,
                        expand=True,
                    )[0]
                    sample = ext.fillna("other")
                yield pd.DataFrame(
                    {
                        "sample_id": sample.to_numpy(),
                        "classified": winners != NONE,
                        "taxon": winners.astype(np.int32),
                    }
                )

        return grouped.mapInPandas(
            gen, "sample_id string, classified boolean, taxon int"
        )


# ---------------------------------------------------------------------------
# Kraken report (driver-side tree rollup — KrakenReport.scala:26-115)
# ---------------------------------------------------------------------------

RANK_CODES = {
    0: "R",  # root
    1: "D",  # superkingdom/domain
    2: "K",
    3: "P",
    4: "C",
    5: "O",
    6: "F",
    7: "G",
    8: "S",
}


@dataclass
class KrakenReport:
    """Clade-rollup tree report. ``counts`` are (taxon, read_count)."""

    taxonomy: Taxonomy
    counts: list[tuple[int, int]]
    report_zeros: bool = False
    clade_totals: dict[int, int] = field(init=False)
    taxon_counts: dict[int, int] = field(init=False)

    def __post_init__(self):
        self.taxon_counts = {}
        for t, c in self.counts:
            self.taxon_counts[t] = self.taxon_counts.get(t, 0) + c
        self.clade_totals = {}
        for t, c in self.taxon_counts.items():
            if t == NONE:
                self.clade_totals[NONE] = self.clade_totals.get(NONE, 0) + c
                continue
            for p in self.taxonomy.path_to_root(t):
                self.clade_totals[p] = self.clade_totals.get(p, 0) + c
        self.total = sum(self.taxon_counts.values())

    def _line(self, taxid: int, rank_code: str, rank_depth: int, depth: int) -> str:
        clade = self.clade_totals.get(taxid, 0)
        own = self.taxon_counts.get(taxid, 0)
        pct = "%6.2f" % (100.0 * clade / self.total if self.total else 0.0)
        ds = "" if rank_depth == 0 else str(rank_depth)
        name = ""
        if self.taxonomy.names is not None and taxid < len(self.taxonomy.names):
            name = self.taxonomy.names[taxid]
        indent = "  " * depth
        return f"{pct}\t{clade}\t{own}\t{rank_code}{ds}\t{taxid}\t{indent}{name}"

    def lines(self) -> list[str]:
        out = []
        unclassified = self.taxon_counts.get(NONE, 0)
        if unclassified or self.report_zeros:
            out.append(self._line(NONE, "U", 0, 0))
        self._dfs(out, ROOT, "R", 0, 0)
        return out

    def _dfs(self, out: list[str], taxid: int, rank: str, rank_depth: int, depth: int):
        rd = (
            self.taxonomy.rank_depths[taxid]
            if self.taxonomy.rank_depths is not None
            and taxid < len(self.taxonomy.rank_depths)
            else -1
        )
        if rd >= 0:
            rank, rank_depth = RANK_CODES.get(int(rd), "-"), 0
        else:
            rank_depth += 1
        out.append(self._line(taxid, rank, rank_depth, depth))
        kids = [
            (c, self.clade_totals.get(c, 0)) for c in self.taxonomy.children[taxid]
        ]
        kids.sort(key=lambda x: -x[1])
        for child, cnt in kids:
            if self.report_zeros or cnt > 0:
                self._dfs(out, child, rank, rank_depth, depth + 1)
