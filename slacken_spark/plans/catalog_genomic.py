"""Query catalog, part 3: the genomic engine driven from the driver's
tables, with DuckDB oracles wherever the result is independently
predictable.

DNA is derived deterministically from the ``part`` table — md5 hex
translated to ACGT — so both engines construct identical genomes.
Genome layout: ``brand_core(256bp) || part_unique(256bp)``. Minimizers
in the core region occur in every part of the brand, so the index-build
LCA fold must lift them to the brand taxon, while unique-region
minimizers stay on the leaf part taxon. Reads drawn from known offsets
then have *predictable* classifications:

  - a read inside the core        → brand taxon,
  - a read inside the unique tail → leaf (part) taxon,
  - a read spanning the boundary  → leaf (leaf path-score ≥ brand's).

The oracle recomputes those expectations with plain SQL — a full
differential test of scanner → LCA fold → classification join →
resolve_tree, in the spirit of the reference's independently-computed
golden counts (KeyValueIndexTest.scala:35-99).

Taxonomy: ROOT(1) ← brand taxa (2+xy from 'Brand#xy') ← part leaves
(p_partkey+1000). Sampled deterministically: p_partkey % 40 == 0.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slacken_spark.appcache import app_scoped_get
from slacken_spark.classify import Classifier, ClassifyParams
from slacken_spark.index import KeyValueIndex, extract_spans
from slacken_spark.kernels.minimizers import MinimizerConfig
from slacken_spark.kernels.taxonomy import Taxonomy
from slacken_spark.plans.catalog import register, t

CFG = MinimizerConfig(k=21, m=15, spaces=2, canonical=True)

# 8 md5 blocks of 32 hex chars = 256 bases
_N_BLOCKS = 8
_HEX2DNA = ("0123456789abcdef", "ACGTACGTACGTACGT")


def _dna_expr(salt: str, key_col, n_blocks: int = _N_BLOCKS):
    """256bp deterministic DNA: concat of md5 blocks, hex→ACGT."""
    blocks = [
        F.md5(F.concat(F.lit(f"{salt}:"), key_col.cast("string"), F.lit(f":{b}")))
        for b in range(n_blocks)
    ]
    return F.translate(F.concat(*blocks), *_HEX2DNA)


def _dna_sql(salt: str, key_expr: str, n_blocks: int = _N_BLOCKS) -> str:
    parts = " || ".join(
        f"md5('{salt}:' || {key_expr} || ':{b}')" for b in range(n_blocks)
    )
    return f"translate({parts}, '0123456789abcdef', 'ACGTACGTACGTACGT')"


# brand taxon from 'Brand#xy' → 2 + xy; leaf taxon = p_partkey + 1000
# (column exprs built lazily — pyspark needs an active context)
def _brand_taxon():
    return 2 + F.substring("p_brand", 7, 2).cast("int")


_BRAND_TAXON_SQL = "CAST(2 + CAST(substr(p_brand, 7, 2) AS INT) AS VARCHAR)"


def _genomes(spark, sf_dir):
    """(header, nucleotides, taxon, brand_taxon) — sampled parts.

    NOT repartitioned: the %40 sample is a few hundred short genomes —
    at this size the extra exchanges cost more than the single-threaded
    DNA construction they would spread (measured: +0.9 s per query).
    Real genome libraries arrive as many files/partitions."""
    part = t(spark, sf_dir, "part").where(F.col("p_partkey") % 40 == 0)
    return part.select(
        F.concat(F.lit("g"), F.col("p_partkey")).alias("header"),
        F.concat(
            _dna_expr("core", _brand_taxon()), _dna_expr("uniq", F.col("p_partkey"))
        ).alias("nucleotides"),
        (F.col("p_partkey") + 1000).cast("int").alias("taxon"),
        _brand_taxon().cast("int").alias("brand_taxon"),
    )


def _taxonomy(spark, sf_dir) -> Taxonomy:
    """ROOT ← brands (rank genus, depth 7) ← part leaves (rank species,
    depth 8). Ranks matter only to the two-step dynamic pipeline
    (genomic_classify2), whose CountFilter keeps taxa at/below the
    reclassify rank — they change nothing about parents/LCA, so every
    other genomic query is rank-oblivious."""
    rows = (
        t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 40 == 0)
        .select(
            (F.col("p_partkey") + 1000).alias("leaf"), _brand_taxon().alias("brand")
        )
        .toPandas()
    )
    brands = sorted(set(rows["brand"].tolist()))
    ids = rows["leaf"].tolist() + brands
    parents = rows["brand"].tolist() + [1] * len(brands)
    ranks = ["species"] * len(rows) + ["genus"] * len(brands)
    return Taxonomy.from_edges(ids, parents, ranks)


# One deterministic index per (application, sf_dir): five catalog queries
# classify against the SAME index, and real usage is build-once /
# classify-many, so rebuilding it inside every query would bench the
# build five times over (classify timings therefore EXCLUDE the shared
# build; genomic_index_lca_histogram's first run is the build-inclusive
# number). The records DataFrame is persisted; the cache is keyed on
# the Spark applicationId — stable for the life of the SparkContext,
# never reused after a stop/start (unlike id(spark), which a new
# session can legitimately collide with after GC) — and entries from
# dead applications are evicted on the next lookup (their persisted
# blocks died with the old context, so popping the reference is the
# whole cleanup).
_INDEX_CACHE: dict = {}


def _build_index(spark, sf_dir, cfg=None) -> KeyValueIndex:
    cfg = cfg or CFG

    def build() -> KeyValueIndex:
        g = _genomes(spark, sf_dir)
        labels = g.select("header", "taxon")
        genomes = g.select("header", "nucleotides")
        idx = KeyValueIndex.build(
            spark, genomes, labels, _taxonomy(spark, sf_dir), cfg, buckets=32
        )
        idx.records = idx.records.persist()
        return idx

    return app_scoped_get(
        _INDEX_CACHE, spark, (sf_dir, str(cfg.to_dict())), build
    )


# ---------------------------------------------------------------------------
# Span accounting: the scanner's k-mer totals vs SQL length arithmetic
# (the reference's numberOf35Mers-style golden check)
# ---------------------------------------------------------------------------


@register(
    "genomic_kmer_totals",
    f"""
    WITH g AS (
        SELECT 'g' || p_partkey AS header,
               {_dna_sql("core", _BRAND_TAXON_SQL)}
                 || {_dna_sql("uniq", "p_partkey")} AS dna
        FROM part WHERE p_partkey % 40 = 0
    )
    SELECT header,
           CAST(length(dna) - {CFG.k - 1} AS BIGINT) AS total_kmers
    FROM g
    """,
)
def genomic_kmer_totals(spark, sf_dir):
    """Spark runs the real scanner (ambiguity split → super-mers) via
    mapInPandas and sums per-span k-mer counts; the oracle computes
    len−k+1 independently. Differential check of the whole span layer."""
    g = _genomes(spark, sf_dir).select("header", "nucleotides")
    spans = extract_spans(g, CFG)
    return spans.groupBy("header").agg(
        F.sum("kmers").cast("long").alias("total_kmers")
    )


# ---------------------------------------------------------------------------
# Index build: LCA fold lifts brand-shared minimizers to the brand taxon
# ---------------------------------------------------------------------------


@register(
    "genomic_index_lca_histogram",
    f"""
    WITH parts AS (SELECT p_partkey, {_BRAND_TAXON_SQL} AS brand
                   FROM part WHERE p_partkey % 40 = 0),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand)
    SELECT * FROM (
        SELECT 'leaf' AS level, count(*) AS n_taxa FROM parts
        UNION ALL
        -- a brand-level record exists only when ≥2 parts share the core
        SELECT 'brand' AS level, count(*) AS n_taxa FROM bc WHERE n >= 2
    ) x WHERE n_taxa > 0
    """,
)
def genomic_index_lca_histogram(spark, sf_dir):
    """Build the index, then check that BOTH levels of the tree appear
    among record taxa and that every expected taxon is present: the
    oracle predicts the exact distinct-taxon census per level (each part
    has ≥1 unique minimizer; each brand core is shared by the brand's
    parts — at least one such part exists per brand)."""
    idx = _build_index(spark, sf_dir)
    return (
        idx.records.select(
            F.when(F.col("taxon") >= 1000, "leaf").otherwise("brand").alias("level"),
            "taxon",
        )
        .groupBy("level")
        .agg(F.count_distinct("taxon").alias("n_taxa"))
    )


# ---------------------------------------------------------------------------
# Full classification with oracle-predictable results
# ---------------------------------------------------------------------------

# read offsets (1-based): core-only, boundary-spanning, unique-only
_READ_DEFS = [("core", 40, 150), ("span", 200, 150), ("uniq", 320, 150)]


def _reads(spark, sf_dir):
    g = _genomes(spark, sf_dir)
    reads = None
    for tag, off, ln in _READ_DEFS:
        r = g.select(
            F.concat(F.lit(f"r_{tag}_"), F.col("header")).alias("header"),
            F.substring("nucleotides", off, ln).alias("nucleotides"),
        )
        reads = r if reads is None else reads.unionByName(r)
    return reads


_CLASSIFY_ORACLE_SQL = f"""
    WITH parts AS (
        SELECT p_partkey, {_BRAND_TAXON_SQL} AS brand
        FROM part WHERE p_partkey % 40 = 0
    ),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand),
    reads AS (
        -- core read lifts to the brand only when ≥2 parts share the core;
        -- a single-part brand's core minimizers stay on the leaf
        SELECT 'r_core_g' || p_partkey AS header,
               CASE WHEN bc.n >= 2 THEN CAST(p.brand AS INT)
                    ELSE p_partkey + 1000 END AS expect
        FROM parts p JOIN bc ON p.brand = bc.brand
        UNION ALL
        SELECT 'r_span_g' || p_partkey, p_partkey + 1000 FROM parts
        UNION ALL
        SELECT 'r_uniq_g' || p_partkey, p_partkey + 1000 FROM parts
    )
    SELECT header, TRUE AS classified, CAST(expect AS INT) AS taxon
    FROM reads
    """


@register("genomic_classify", _CLASSIFY_ORACLE_SQL)
def genomic_classify(spark, sf_dir):
    """End-to-end: index build + classify three reads per genome. The
    oracle predicts every read's taxon from the genome layout (see
    module docstring) — a full differential test of the pipeline."""
    idx = _build_index(spark, sf_dir)
    cls = Classifier(idx)
    out = cls.classify(_reads(spark, sf_dir), ClassifyParams(min_hit_groups=2))
    return out.select("header", "classified", "taxon")


# The Kraken line's hit string is predictable whenever every k-mer in a
# read resolves to ONE taxon: run-merging (TaxonCounts.fromHits)
# collapses the whole read to a single 'taxon:count' island with
# count = len − k + 1, erasing the (minimizer-position-dependent, NOT
# SQL-expressible) super-mer boundaries. So the detail query draws
# single-region reads only — core (→ brand or leaf), uniq (→ leaf),
# absent DNA (→ all-miss, 'U … 0:130') — plus a core+uniq mate PAIR,
# whose line exercises the '|:|' border and the 'len1|len2' length
# format while staying a concatenation of two predictable islands.
# (The boundary-SPANNING read stays in genomic_classify, where only the
# final taxon — not the island split point — is asserted.)
_DETAIL_KMERS = 150 - CFG.k + 1  # 130 k-mers per 150bp read


_DETAIL_ORACLE_SQL = f"""
    WITH parts AS (
        SELECT p_partkey, {_BRAND_TAXON_SQL} AS brand
        FROM part WHERE p_partkey % 40 = 0
    ),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand),
    base AS (
        SELECT p.p_partkey,
               CAST(p.p_partkey + 1000 AS INT) AS leaf,
               CASE WHEN bc.n >= 2 THEN CAST(p.brand AS INT)
                    ELSE p.p_partkey + 1000 END AS core_taxon
        FROM parts p JOIN bc ON p.brand = bc.brand
    ),
    lines AS (
        SELECT concat_ws(chr(9), 'C', 'r_core_g' || p_partkey,
                         CAST(core_taxon AS VARCHAR), '150',
                         core_taxon || ':{_DETAIL_KMERS}') AS classification
        FROM base
        UNION ALL
        SELECT concat_ws(chr(9), 'C', 'r_uniq_g' || p_partkey,
                         CAST(leaf AS VARCHAR), '150',
                         leaf || ':{_DETAIL_KMERS}')
        FROM base
        UNION ALL
        SELECT concat_ws(chr(9), 'U', 'r_none_g' || p_partkey, '0', '150',
                         '0:{_DETAIL_KMERS}')
        FROM base
        UNION ALL
        SELECT concat_ws(chr(9), 'C', 'r_pair_g' || p_partkey,
                         CAST(leaf AS VARCHAR), '150|150',
                         core_taxon || ':{_DETAIL_KMERS} |:| '
                           || leaf || ':{_DETAIL_KMERS}')
        FROM base
    )
    SELECT classification, 'all' AS sample FROM lines
    """


def _detail_reads(spark, sf_dir):
    g = _genomes(spark, sf_dir)
    key = (F.col("taxon") - 1000).cast("int")  # p_partkey back out of the leaf id
    no2 = F.lit(None).cast("string")
    core = F.substring("nucleotides", 40, 150)
    uniq = F.substring("nucleotides", 320, 150)
    reads = None
    for tag, r1, r2 in [
        ("core", core, no2),
        ("uniq", uniq, no2),
        # 5 md5 blocks = 160bp of DNA present in NO genome → every
        # minimizer misses the index
        ("none", F.substring(_dna_expr("none", key, 5), 1, 150), no2),
        ("pair", core, uniq),
    ]:
        r = g.select(
            F.concat(F.lit(f"r_{tag}_"), F.col("header")).alias("header"),
            r1.alias("nucleotides"),
            r2.alias("nucleotides2"),
        )
        reads = r if reads is None else reads.unionByName(r)
    return reads


@register("genomic_classify_detail", _DETAIL_ORACLE_SQL)
def genomic_classify_detail(spark, sf_dir):
    """Per-read Kraken 2 output lines — 'C/U␉header␉taxon␉len␉hits'
    with run-merged 'taxid:count' islands, the '|:|' mate-pair border
    and 'len1|len2' pair lengths (ClassifiedRead.outputLine +
    TaxonCounts.pairsInOrderString, Classifier.scala:29-45,
    TaxonCounts.scala:92-121). The oracle reconstructs every byte of
    the line from the genome layout (see _DETAIL_ORACLE_SQL comment)."""
    idx = _build_index(spark, sf_dir)
    cls = Classifier(idx)
    out = cls.classify(
        _detail_reads(spark, sf_dir), ClassifyParams(min_hit_groups=2)
    )
    return cls.output_lines(out)


CFG_WIDE = MinimizerConfig(k=50, m=45, spaces=0, canonical=True)

# wide-m read layout: k=50 ⇒ core-only windows need the last k-mer start
# ≤ 256−50 → boundary shifts vs the k=21 case; reuse offsets that stay
# unambiguous: core read within bases 1..206+49, uniq read ≥ 257
_WIDE_READ_DEFS = [("wcore", 30, 150), ("wuniq", 300, 150)]


_WIDE_ORACLE_SQL = f"""
    WITH parts AS (
        SELECT p_partkey, {_BRAND_TAXON_SQL} AS brand
        FROM part WHERE p_partkey % 40 = 0
    ),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand),
    reads AS (
        SELECT 'r_wcore_g' || p_partkey AS header,
               CASE WHEN bc.n >= 2 THEN CAST(p.brand AS INT)
                    ELSE p_partkey + 1000 END AS expect
        FROM parts p JOIN bc ON p.brand = bc.brand
        UNION ALL
        SELECT 'r_wuniq_g' || p_partkey, p_partkey + 1000 FROM parts
    )
    SELECT header, TRUE AS classified, CAST(expect AS INT) AS taxon
    FROM reads
    """


def _classify_wide(spark, sf_dir, cfg):
    g = _genomes(spark, sf_dir)
    idx = _build_index(spark, sf_dir, cfg)
    reads = None
    for tag, off, ln in _WIDE_READ_DEFS:
        r = g.select(
            F.concat(F.lit(f"r_{tag}_"), F.col("header")).alias("header"),
            F.substring("nucleotides", off, ln).alias("nucleotides"),
        )
        reads = r if reads is None else reads.unionByName(r)
    out = Classifier(idx).classify(reads, ClassifyParams(min_hit_groups=2))
    return out.select("header", "classified", "taxon")


@register("genomic_classify_wide", _WIDE_ORACLE_SQL)
def genomic_classify_wide(spark, sf_dir):
    """The same predictive classification differential, with WIDE
    minimizers (m=45 > 31) stored as EXACT two-column (id1, id2) keys
    (the reference's multi-long id1..idN, KmerKeyedIndex.scala:44-53):
    verifies the wide scanner + canonical pair identity + two-column
    bucketed join end-to-end against SQL."""
    return _classify_wide(spark, sf_dir, CFG_WIDE)


@register("genomic_classify_wide_hashed", _WIDE_ORACLE_SQL)
def genomic_classify_wide_hashed(spark, sf_dir):
    """Wide classification under the opt-in single-column HASHED id
    scheme (round-1 layout; 62-bit mix, ~n²/2⁶³ collision bound): same
    oracle — collisions would surface as classification mismatches."""
    from dataclasses import replace

    return _classify_wide(spark, sf_dir, replace(CFG_WIDE, wide="hashed"))


# ---------------------------------------------------------------------------
# Bracken weights with predictable self-classification
# ---------------------------------------------------------------------------

_BRACKEN_READ_LEN = 100


@register(
    "bracken_weights",
    f"""
    SELECT CAST(p_partkey + 1000 AS INT) AS dest,
           CAST(p_partkey + 1000 AS INT) AS source,
           CAST(256 - {_BRACKEN_READ_LEN} + 1 AS BIGINT) AS count
    FROM part WHERE p_partkey % 40 = 0
    """,
)
def bracken_weights(spark, sf_dir):
    """Self-classify every simulated read of fully-unique genomes: each
    genome's minimizers fold to its own leaf, so every one of the
    len−L+1 reads must land on the source taxon — the oracle enumerates
    the exact (dest, source, count) table. Exercises fragment splitting,
    the distinct-minimizer left join, and the vectorized FragmentWindow
    end-to-end."""
    _, weights = _bracken_self_weights(spark, sf_dir)
    return weights


# The weights table of the self-classify fixture is the shared input of
# bracken_weights AND the kmer_distrib artifact digest — memoized
# app-scoped like the classification index (build-once/derive-many, the
# real artifact pipeline's shape).
_BRACKEN_W_CACHE: dict = {}


def _bracken_self_weights(spark, sf_dir):
    from slacken_spark.bracken import BrackenWeights

    def build():
        part = t(spark, sf_dir, "part").where(F.col("p_partkey") % 40 == 0)
        genomes = part.select(
            F.concat(F.lit("bk"), F.col("p_partkey")).alias("header"),
            _dna_expr("bkuniq", F.col("p_partkey")).alias("nucleotides"),
        )
        labels = part.select(
            F.concat(F.lit("bk"), F.col("p_partkey")).alias("header"),
            (F.col("p_partkey") + 1000).cast("int").alias("taxon"),
        )
        idx = KeyValueIndex.build(
            spark, genomes, labels, _taxonomy(spark, sf_dir), CFG, buckets=32
        )
        bw = BrackenWeights(idx, _BRACKEN_READ_LEN)
        return bw, bw.build_weights(genomes, labels).persist()

    return app_scoped_get(_BRACKEN_W_CACHE, spark, ("bracken_w", sf_dir), build)


@register(
    "bracken_distrib_lines",
    f"""
    SELECT CAST(p_partkey + 1000 AS INT) AS dest,
           CAST(p_partkey + 1000 AS VARCHAR) || chr(9)
             || CAST(p_partkey + 1000 AS VARCHAR)
             || ':{256 - _BRACKEN_READ_LEN + 1}:{256 - _BRACKEN_READ_LEN + 1}'
             AS line
    FROM part WHERE p_partkey % 40 = 0
    """,
)
def bracken_distrib_lines(spark, sf_dir):
    """The kmer_distrib artifact's DATA ROWS, rendered executor-side —
    the reference's flagship Bracken output (BrackenWeights.scala:
    413-430): per destination taxon, the space-joined
    ``source:kmers_mapped:total_genome_kmers`` triples. On the
    self-classify fixture every genome maps only to itself, so each
    dest renders exactly ``dest\\tdest:157:157`` — the oracle
    enumerates the rendered lines, pinning group_data's per-source
    totals join AND the executor-side string rendering that
    write_kmer_distrib streams to the single-file artifact (the driver
    never materializes a line)."""
    bw, weights = _bracken_self_weights(spark, sf_dir)
    return bw.kmer_distrib_df(bw.group_data(weights))


# ---------------------------------------------------------------------------
# Distributed clade rollup (TreeAggregator as explode + groupBy-sum)
# ---------------------------------------------------------------------------


@register(
    "genomic_clade_rollup",
    f"""
    WITH parts AS (
        SELECT p_partkey, {_BRAND_TAXON_SQL} AS brand
        FROM part WHERE p_partkey % 40 = 0
    ),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand),
    reads AS (
        SELECT CASE WHEN bc.n >= 2 THEN CAST(p.brand AS INT)
                    ELSE p_partkey + 1000 END AS taxon
        FROM parts p JOIN bc ON p.brand = bc.brand
        UNION ALL
        SELECT p_partkey + 1000 FROM parts
        UNION ALL
        SELECT p_partkey + 1000 FROM parts
    ),
    counts AS (SELECT taxon, count(*) AS count FROM reads GROUP BY taxon),
    -- rollup over the 3-level tree: self, leaf→brand edge, everything→ROOT
    unioned AS (
        SELECT taxon, count FROM counts
        UNION ALL
        SELECT CAST(p.brand AS INT) AS taxon, c.count
        FROM counts c JOIN parts p ON c.taxon = p.p_partkey + 1000
        UNION ALL
        SELECT 1 AS taxon, count FROM counts
    )
    SELECT taxon, CAST(sum(count) AS BIGINT) AS count
    FROM unioned GROUP BY taxon
    """,
)
def genomic_clade_rollup(spark, sf_dir):
    """Classify the three reads per genome, count classified reads per
    taxon, then clade-roll the counts DISTRIBUTED: each taxon's ancestor
    path comes from a broadcast-taxonomy pandas UDF, exploded and summed
    per ancestor (TreeAggregator, KrakenReport.scala:26-41 — here as a
    partial-aggregated groupBy, not a driver dict). The oracle predicts
    every read's taxon from the genome layout and rolls the 3-level tree
    up with plain unions."""
    from slacken_spark.dynamic import clade_rollup

    idx = _build_index(spark, sf_dir)
    cls = Classifier(idx)
    out = cls.classify(_reads(spark, sf_dir), ClassifyParams(min_hit_groups=2))
    counts = (
        out.where("classified")
        .groupBy("taxon")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return clade_rollup(spark, idx.taxonomy, counts)


@register("streaming_genomic_classify", _CLASSIFY_ORACLE_SQL)
def streaming_genomic_classify(spark, sf_dir):
    """Stream ≡ batch differential for the FLAGSHIP pipeline: the same
    reads as genomic_classify arrive as a two-file parquet STREAM and
    are classified per micro-batch by the foreachBatch stream-static
    join against the bucketed index (streaming/ops.classify_stream) —
    then hash-compared against the very same oracle that gates the
    batch path. Proves micro-batch boundaries don't change a single
    classification."""
    import os
    import shutil
    import tempfile

    from slacken_spark.streaming import ops

    idx = _build_index(spark, sf_dir)
    reads = _reads(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="sgc_")
    try:
        in_dir = os.path.join(tmp, "in")
        # two files → two micro-batches (maxFilesPerTrigger=1)
        reads.where(F.col("header").startswith("r_core")).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        reads.where(~F.col("header").startswith("r_core")).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = ops.file_stream(
            spark,
            in_dir,
            "header string, nucleotides string",
            max_files_per_trigger=1,
        )
        rows: list = []

        # GATE-HARNESS SINK — NOT the scale pattern: this differential
        # check collects each (150-row) micro-batch to the driver so the
        # result can hash against the batch oracle. A production sink
        # for ops.classify_stream writes files/tables per epoch
        # (e.g. df.write.parquet) — never driver collect.
        def sink(df, _epoch):
            rows.extend(df.select("header", "classified", "taxon").collect())

        ops.run_foreach_to_completion(ops.classify_stream(idx, stream, sink))
        return spark.createDataFrame(
            rows, "header string, classified boolean, taxon int"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------------------
# Two-step dynamic classification (E3): detect taxon set → restricted
# dynamic index → re-classify (Dynamic.scala:250-374, Slacken.scala:199-261)
# ---------------------------------------------------------------------------

# The sample is built so the DETECTED set is SQL-predictable: uniq-region
# reads exist only for every-other library genome (p_partkey % 80 = 0),
# so with MinimizerDistinctCount(threshold=1) at species rank the
# detection sees leaf-labeled hits exactly for (a) parts with a uniq
# read, plus (b) single-part brands, whose CORE minimizers stay on the
# leaf in the base index (no sibling to lift the LCA) and therefore
# survive the species-rank depth filter under the core reads that every
# part contributes. Step 2 then classifies the same sample against the
# index rebuilt from ONLY the detected genomes, which moves answers in
# three oracle-predictable ways (dn = detected parts per brand):
#   core read, dn >= 2 → brand (shared core LCA-lifts as usual),
#   core read, dn  = 1 → the ONE detected sibling's leaf (the lift
#                        disappears with the siblings),
#   core read, dn  = 0 → unclassified (library lost the whole brand),
#   uniq read          → own leaf (exists only for detected parts).
_CLASSIFY2_ORACLE_SQL = f"""
    WITH parts AS (
        SELECT p_partkey,
               CAST(2 + CAST(substr(p_brand, 7, 2) AS INT) AS INT) AS brand
        FROM part WHERE p_partkey % 40 = 0
    ),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand),
    det AS (
        SELECT p.p_partkey, p.brand
        FROM parts p JOIN bc ON p.brand = bc.brand
        WHERE p.p_partkey % 80 = 0 OR bc.n = 1
    ),
    dbc AS (SELECT brand, count(*) AS dn, min(p_partkey) AS d1
            FROM det GROUP BY brand),
    reads AS (
        SELECT 'r2_core_g' || p.p_partkey AS header,
               coalesce(dbc.dn, 0) > 0 AS classified,
               CASE WHEN coalesce(dbc.dn, 0) >= 2 THEN p.brand
                    WHEN coalesce(dbc.dn, 0) = 1 THEN dbc.d1 + 1000
                    ELSE 0 END AS taxon
        FROM parts p LEFT JOIN dbc ON p.brand = dbc.brand
        UNION ALL
        -- uniq reads exist only for the % 80 parts (all of which are
        -- detected, so they always classify to their own leaf)
        SELECT 'r2_uniq_g' || p.p_partkey,
               TRUE AS classified,
               p.p_partkey + 1000 AS taxon
        FROM parts p WHERE p.p_partkey % 80 = 0
    )
    SELECT header, classified, CAST(taxon AS INT) AS taxon FROM reads
    """


def _classify2_reads(spark, sf_dir):
    """The ONE definition of the two-step fixture's sample reads (core
    read per library genome at offset 40; uniq read at offset 320 for
    the % 80 genomes) — genomic_classify2 AND genomic_gold_eval both
    predict their detected set from exactly this construction, so a
    tweak to one consumer cannot desynchronize the other's oracle."""
    g = _genomes(spark, sf_dir)
    core = g.select(
        F.concat(F.lit("r2_core_"), F.col("header")).alias("header"),
        F.substring("nucleotides", 40, 150).alias("nucleotides"),
    )
    uniq = g.where((F.col("taxon") - 1000) % 80 == 0).select(
        F.concat(F.lit("r2_uniq_"), F.col("header")).alias("header"),
        F.substring("nucleotides", 320, 150).alias("nucleotides"),
    )
    return core.unionByName(uniq)


@register("genomic_classify2", _CLASSIFY2_ORACLE_SQL)
def genomic_classify2(spark, sf_dir):
    """The reference's THIRD flagship pipeline end-to-end: two-step
    dynamic classification (Dynamic.scala:250-374) — step 1 counts
    distinct minimizers per species-rank taxon in the sample against
    the full base index, clade-rolls the counts (TreeAggregator),
    keeps taxa meeting the CountFilter threshold and expands
    descendants; step 2 rebuilds the index restricted to the detected
    set and re-classifies the sample against it. The oracle unrolls
    both steps: the detected set is predictable from which parts carry
    uniq reads (plus single-part brands, see _CLASSIFY2_ORACLE_SQL),
    and every read's step-2 answer follows from the detected-per-brand
    census — a full differential of detection → CountFilter → dynamic
    build → re-classification, including reads whose answer CHANGES
    vs the one-step path (lost brands go unclassified; dn=1 cores fall
    from brand to the surviving sibling's leaf)."""
    from slacken_spark.dynamic import Dynamic, MinimizerDistinctCount

    idx = _build_index(spark, sf_dir)
    g = _genomes(spark, sf_dir)
    dyn = Dynamic(
        idx,
        g.select("header", "nucleotides"),
        g.select("header", "taxon"),
        MinimizerDistinctCount(threshold=1),
        reclassify_rank_depth=8,  # species
        cpar=ClassifyParams(min_hit_groups=2),
    )
    out, _detected = dyn.two_step_classify(_classify2_reads(spark, sf_dir))
    return out.select("header", "classified", "taxon")


# Gold-set evaluation (readGoldSet / precision-recall,
# Dynamic.scala:265-312): the detected set from the classify2 fixture
# scored against a gold taxon CSV. The gold file deliberately mixes
# (a) library leaves (% 120 parts — kept), (b) BRAND ids (in the
# taxonomy, not in the library; their only ancestor is ROOT, also not
# in the library, so promotion finds nothing and the species-rank
# filter drops them — depth 7 < 8), and (c) unknown ids (p+1007 —
# never a leaf id since leaves are ≡0 mod 40 offset 1000; undefined
# nodes carry depth −1, out-of-range ids skip the promotion loop), so
# the remap/promote/filter pipeline all execute. What survives is
# exactly the % 120 leaves, which the oracle states directly.
_GOLD_EVAL_SQL = f"""
    WITH parts AS (
        SELECT p_partkey,
               CAST(2 + CAST(substr(p_brand, 7, 2) AS INT) AS INT) AS brand
        FROM part WHERE p_partkey % 40 = 0
    ),
    bc AS (SELECT brand, count(*) AS n FROM parts GROUP BY brand),
    det AS (
        SELECT p.p_partkey
        FROM parts p JOIN bc ON p.brand = bc.brand
        WHERE p.p_partkey % 80 = 0 OR bc.n = 1
    ),
    gold AS (SELECT p_partkey FROM parts WHERE p_partkey % 120 = 0),
    m AS (SELECT
        (SELECT count(*) FROM det
         WHERE p_partkey IN (SELECT p_partkey FROM gold)) AS tp,
        (SELECT count(*) FROM det) AS nd,
        (SELECT count(*) FROM gold) AS ng)
    SELECT CAST(tp AS BIGINT) AS tp,
           CAST(nd - tp AS BIGINT) AS fp,
           CAST(ng - tp AS BIGINT) AS fn,
           coalesce(tp * 1.0 / nullif(nd, 0), 0.0) AS prec,
           coalesce(tp * 1.0 / nullif(ng, 0), 0.0) AS rec
    FROM m
    """


@register("genomic_gold_eval", _GOLD_EVAL_SQL)
def genomic_gold_eval(spark, sf_dir):
    """Gold-set evaluation of taxon-set detection (readGoldSet +
    precision/recall, Dynamic.scala:265-312) — the last piece of the
    dynamic pipeline to earn a driver row: detection runs the
    classify2 fixture (MinimizerDistinctCount at species rank), the
    gold CSV round-trips through ``read_gold_set``'s full
    remap → promote-missing → rank-filter pipeline (see
    _GOLD_EVAL_SQL for what each branch does on this taxonomy), and
    the emitted row is ``gold_set_metrics``' exact integers with
    precision/recall as single int/int divisions — IEEE-identical on
    both engines."""
    import os
    import tempfile

    from slacken_spark.dynamic import Dynamic, MinimizerDistinctCount

    idx = _build_index(spark, sf_dir)
    g = _genomes(spark, sf_dir)
    dyn = Dynamic(
        idx,
        g.select("header", "nucleotides"),
        g.select("header", "taxon"),
        MinimizerDistinctCount(threshold=1),
        reclassify_rank_depth=8,
    )
    detected = dyn.find_taxon_set(_classify2_reads(spark, sf_dir))
    # deterministic gold CSV (ONE driver collect, part-sample-sized
    # plan-time metadata serving all three id families)
    sample = [
        (int(r["p_partkey"]), r["p_brand"])
        for r in t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 40 == 0)
        .select("p_partkey", "p_brand")
        .collect()
    ]
    gold_ids = (
        [p + 1000 for p, _ in sample if p % 120 == 0]
        + sorted({2 + int(b[6:8]) for p, b in sample if p % 200 == 0})
        + [p + 1007 for p, _ in sample if p % 160 == 0]
    )
    with tempfile.TemporaryDirectory(prefix="gold_") as tmp:
        path = os.path.join(tmp, "gold.csv")
        with open(path, "w") as f:
            f.write("\n".join(str(i) for i in gold_ids) + "\n")
        gold = dyn.read_gold_set(path)
    m = dyn.gold_set_metrics(detected, gold)
    return spark.createDataFrame(
        [(m["tp"], m["fp"], m["fn"], float(m["precision"]), float(m["recall"]))],
        "tp long, fp long, fn long, prec double, rec double",
    )


# ---------------------------------------------------------------------------
# Input-layer round trip: FASTA / FASTQ / @list / indexed .fai under the gate
# ---------------------------------------------------------------------------

_FIO_SALT = "fio"
_FIO_CHUNK, _FIO_K = 100, 21  # chunk 100bp, (k-1)=20bp overlap

_FASTA_IO_SQL = f"""
WITH src AS (
    SELECT 'P' || CAST(p_partkey AS VARCHAR) AS header,
           {_dna_sql(_FIO_SALT, "CAST(p_partkey AS VARCHAR)")} AS nt
    FROM part WHERE p_partkey % 40 = 0
),
whole AS (
    SELECT header, CAST(0 AS BIGINT) AS location,
           CAST(len(nt) AS BIGINT) AS n_bases, md5(nt) AS seq_digest
    FROM src
),
idx AS (
    SELECT header, CAST(s AS BIGINT) AS location,
           CAST(least({_FIO_CHUNK + _FIO_K - 1}, len(nt) - s) AS BIGINT) AS n_bases,
           md5(substr(nt, CAST(s AS INT) + 1, {_FIO_CHUNK + _FIO_K - 1})) AS seq_digest
    FROM src, unnest(range(0, len(nt), {_FIO_CHUNK})) AS u(s)
)
SELECT 'fasta' AS variant, * FROM whole
UNION ALL SELECT 'fastq' AS variant, * FROM whole
UNION ALL SELECT 'list' AS variant, * FROM whole
UNION ALL SELECT 'list' AS variant, * FROM whole
UNION ALL SELECT 'indexed' AS variant, * FROM idx
"""


_FIO_FIXTURE_CACHE: dict = {}


def _write_sequence_fixture(spark, sf_dir):
    """Materialize deterministic FASTA (+ .fai sidecar), FASTQ and @list
    files derived from the part table — the gate fixture for the input
    layer. The driver-side collect is the FIXTURE WRITER only (bounded:
    the p_partkey % 40 sample), not a query pattern; layout is 60-base
    FASTA lines so the .fai line_bases/line_bytes arithmetic is real.
    Written once per (application, sf_dir) — content is deterministic,
    so reruns reuse the files (same build-once contract as the index
    cache)."""
    return app_scoped_get(
        _FIO_FIXTURE_CACHE, spark, sf_dir, lambda: _write_fixture_files(spark, sf_dir)
    )


def _write_fixture_files(spark, sf_dir):
    import hashlib
    import os
    import tempfile

    rows = (
        t(spark, sf_dir, "part")
        .where(F.col("p_partkey") % 40 == 0)
        .select(
            F.col("p_partkey").alias("key"),
            F.concat(F.lit("P"), F.col("p_partkey").cast("string")).alias("header"),
            _dna_expr(_FIO_SALT, F.col("p_partkey")).alias("nt"),
        )
        .orderBy("key")
        .collect()
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"slacken_fio_{tag}")
    os.makedirs(d, exist_ok=True)
    width = 60
    fasta_parts, fai_lines, fastq_parts = [], [], []
    offset = 0
    for r in rows:
        h, nt = r["header"], r["nt"]
        rec_header = f">{h}\n"
        offset += len(rec_header)
        fai_lines.append(f"{h}\t{len(nt)}\t{offset}\t{width}\t{width + 1}\n")
        body = "".join(
            nt[i : i + width] + "\n" for i in range(0, len(nt), width)
        )
        fasta_parts.append(rec_header + body)
        offset += len(body)
        fastq_parts.append(f"@{h}\n{nt}\n+\n{'I' * len(nt)}\n")
    fasta_p = os.path.join(d, "genomes.fasta")
    fastq_p = os.path.join(d, "reads.fastq")
    list_p = os.path.join(d, "inputs.txt")
    def publish(path: str, content: str):
        # atomic replace: the path is shared across applications (keyed
        # by sf_dir, not app), so a concurrent app must never observe a
        # mid-truncate file; identical deterministic bytes make the
        # replace itself invisible to readers
        fd, tmp = tempfile.mkstemp(dir=d, prefix="._fio_")
        with os.fdopen(fd, "w") as fh:
            fh.write(content)
        os.replace(tmp, path)

    publish(fasta_p, "".join(fasta_parts))
    publish(fasta_p + ".fai", "".join(fai_lines))
    publish(fastq_p, "".join(fastq_parts))
    publish(list_p, fasta_p + "\n" + fastq_p + "\n")
    return fasta_p, fastq_p, list_p


@register("fasta_input_roundtrip", _FASTA_IO_SQL)
def fasta_input_roundtrip(spark, sf_dir):
    """The FASTA/FASTQ input layer (SURVEY S1-S4) under the hash gate:
    deterministic part-derived genomes are written as multi-line FASTA
    (+ .fai), FASTQ and an @list file, read back through the real
    sources (sources/fasta.py: extension dispatch, 4-line FASTQ window,
    @list indirection, .fai-planned ranged reads with (k-1)-base
    overlap — FileInputs.scala:156-274 semantics), and reduced to
    (variant, header, location, n_bases, seq_digest) rows the oracle
    predicts from the same table: whole sequences for fasta/fastq/list
    (list yields both files' records), 120bp overlapped chunks at
    100bp strides for the indexed scan."""
    from slacken_spark.sources.fasta import read_indexed_fasta, read_sequences

    fasta_p, fastq_p, list_p = _write_sequence_fixture(spark, sf_dir)

    def shape(df, variant):
        return df.select(
            F.lit(variant).alias("variant"),
            "header",
            "location",
            F.length("nucleotides").cast("long").alias("n_bases"),
            F.md5("nucleotides").alias("seq_digest"),
        )

    return (
        shape(read_sequences(spark, fasta_p), "fasta")
        .unionByName(shape(read_sequences(spark, fastq_p), "fastq"))
        .unionByName(shape(read_sequences(spark, "@" + list_p), "list"))
        .unionByName(
            shape(
                read_indexed_fasta(spark, fasta_p, k=_FIO_K, max_chunk=_FIO_CHUNK),
                "indexed",
            )
        )
    )
