"""Minimizer → LCA-taxon key-value index: build, persist, load, join.

Spark-first re-expression of the reference's KeyValueIndex
(reference: slacken/KeyValueIndex.scala:32-257):
  - records table: one row per distinct minimizer → (id1 long, taxon int),
    single-long minimizers (m ≤ 31; KeyValueIndex.scala:49-50 generalizes
    to idN columns — this engine pins N=1, covering the default m=31);
  - the index is persisted as a BUCKETED parquet table
    (``bucketBy(buckets, "id1")`` + saveAsTable, KeyValueIndex.scala:125-139)
    with a JSON params sidecar (IndexParams.scala:63-91), and reloaded by
    re-registering the bucketed DDL (KeyValueIndex.scala:150-159) so the
    classification join NEVER reshuffles the index side — only the spans
    side shuffles into bucket alignment. Sessions classifying against an
    index pin ``spark.sql.shuffle.partitions`` to the bucket count
    (SparkTool.scala:54-58).
  - the LCA fold aggregation (KeyValueIndex.scala:85-93,
    LowestCommonAncestor.scala:149-170) runs as collect_list + one
    Arrow-batched pandas UDF over the broadcast taxonomy
    (Taxonomy.lca_list_udf) — LCA is associative/commutative, and
    minimizer groups are small (the genomes sharing a minimizer).
"""

from __future__ import annotations

import json
import os
import posixpath

from slacken_spark import fsio

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slacken_spark.kernels.minimizers import (
    FLAG_AMBIGUOUS,
    FLAG_MATE_PAIR_BORDER,
    MinimizerConfig,
)
from slacken_spark.kernels.taxonomy import (
    AMBIGUOUS_SPAN,
    MATE_PAIR_BORDER,
    NONE,
    Taxonomy,
    member_mask_udf,
)

def spans_schema(cfg: MinimizerConfig) -> str:
    """Span-row schema: id columns follow the config (id1, id2 always;
    id3/id4 for exact wide m > 62)."""
    ids = ", ".join(f"{c} long" for c in cfg.id_cols)
    return f"header string, {ids}, distinct boolean, kmers int, flag int, ordinal int"


# Default-config schema (kept for callers/tests that don't thread a cfg).
SPANS_SCHEMA = spans_schema(MinimizerConfig())


def extract_spans(
    df: DataFrame, cfg: MinimizerConfig, table_bc=None
) -> DataFrame:
    """Fragments → ordinal spans (getSpans, KeyValueIndex.scala:163-173).

    mapInPandas over Arrow batches; per-fragment work is the vectorized
    scanner kernel. Output: (header, id1.., distinct, kmers, flag, ordinal).
    ``table_bc``: optional broadcast explicit-priority table (MinTable).
    """
    cfg_dict = cfg.to_dict()
    id_cols = cfg.id_cols

    def gen(batches):
        import numpy as np
        import pandas as pd

        from slacken_spark.kernels.minimizers import batch_span_words

        c = MinimizerConfig.from_dict(cfg_dict)
        table = table_bc.value if table_bc is not None else None
        rng = np.random.default_rng(0x5EED)
        for pdf in batches:
            if not len(pdf):
                continue
            seqs = pdf["nucleotides"].tolist()
            seqs2 = (
                pdf["nucleotides2"].tolist()
                if "nucleotides2" in pdf.columns
                else None
            )
            counts, words, dist, kmers, flags = batch_span_words(
                seqs, c, rng, seqs2, priority_table=table
            )
            n = len(words[0])
            headers = np.repeat(pdf["header"].to_numpy(), counts)
            # ordinal restarts per read
            offsets = np.repeat(np.cumsum(counts) - counts, counts)
            ords = np.arange(n, dtype=np.int64) - offsets
            out = {"header": headers}
            for name, w in zip(id_cols, words):
                out[name] = w
            out["distinct"] = dist
            out["kmers"] = kmers.astype(np.int32)
            out["flag"] = flags.astype(np.int32)
            out["ordinal"] = ords.astype(np.int32)
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, spans_schema(cfg))


def extract_index_rows(
    df: DataFrame, cfg: MinimizerConfig, table_bc=None
) -> DataFrame:
    """Labelled genome fragments → (id1.., taxon) minimizer rows
    (Minimizers.find, Minimizers.scala:43-76). Map-only; shuffles next
    at the LCA groupBy."""
    cfg_dict = cfg.to_dict()
    id_cols = cfg.id_cols

    def gen(batches):
        import pandas as pd

        from slacken_spark.kernels.minimizers import batch_genome_words

        c = MinimizerConfig.from_dict(cfg_dict)
        table = table_bc.value if table_bc is not None else None
        for pdf in batches:
            if not len(pdf):
                continue
            unit_of, words = batch_genome_words(
                pdf["nucleotides"].tolist(), c, priority_table=table
            )
            taxa = pdf["taxon"].to_numpy()[unit_of]
            out = {
                name: pd.array(w, dtype="int64")
                for name, w in zip(id_cols, words)
            }
            out["taxon"] = pd.array(taxa, dtype="int32")
            yield pd.DataFrame(out)

    ids_ddl = ", ".join(f"{c} long" for c in id_cols)
    return df.mapInPandas(gen, f"{ids_ddl}, taxon int")


class KeyValueIndex:
    """A loaded (or just-built) minimizer → LCA index."""

    def __init__(
        self,
        spark: SparkSession,
        records: DataFrame,
        cfg: MinimizerConfig,
        taxonomy: Taxonomy,
        buckets: int,
        location: str | None = None,
        priority_table=None,
    ):
        self.spark = spark
        self.records = records
        self.cfg = cfg
        self.taxonomy = taxonomy
        self.buckets = buckets
        self.location = location
        self.priority_table = priority_table
        self.table_bc = (
            spark.sparkContext.broadcast(priority_table)
            if priority_table is not None
            else None
        )

    # ---------------- build ----------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        genomes: DataFrame,
        labels: DataFrame,
        taxonomy: Taxonomy,
        cfg: MinimizerConfig,
        buckets: int = 32,
        taxon_filter: set[int] | None = None,
        priority_table=None,
    ) -> "KeyValueIndex":
        """Genomes ⋈ labels → minimizer rows → LCA fold → records.

        ``genomes``: (header, nucleotides); ``labels``: (header, taxon)
        — the label side is small and broadcast (GenomeLibrary.scala:70-71).
        Taxa undefined in the taxonomy are dropped UNCONDITIONALLY
        (KeyValueIndex.scala:118-121) via a broadcast-mask membership UDF
        — never a literal ``isin`` (an NCBI taxonomy has ~2.5M defined
        taxa; a literal list would explode the plan, and dropping the
        filter would let out-of-range ids crash the vectorized LCA).
        ``taxon_filter`` restricts to a detected taxon set (the dynamic
        second-step build, KeyValueIndex.scala:102-113)."""
        import numpy as np

        mask = taxonomy.defined_mask()
        if taxon_filter is not None:
            fmask = np.zeros(taxonomy.n_nodes, dtype=bool)
            ids = np.asarray(
                [t for t in taxon_filter if 0 <= t < taxonomy.n_nodes],
                dtype=np.int64,
            )
            fmask[ids] = True
            mask &= fmask
        member = member_mask_udf(spark, mask)
        labelled = genomes.join(F.broadcast(labels), "header").where(
            member(F.col("taxon"))
        )
        idx = cls(spark, None, cfg, taxonomy, buckets, priority_table=priority_table)
        rows = extract_index_rows(labelled, cfg, idx.table_bc)
        lca_udf = taxonomy.lca_list_udf(spark)
        key = cfg.key_cols  # (id1, id2) for wide-exact, else id1 only
        idx.records = (
            rows.groupBy(*key)
            .agg(F.collect_list("taxon").alias("taxa"))
            .select(*key, lca_udf(F.col("taxa")).cast("int").alias("taxon"))
        )
        return idx

    # ---------------- persist / load ----------------

    def write(self, location: str, table_name: str | None = None) -> "KeyValueIndex":
        """Persist as a bucketed parquet table + params sidecar.

        bucketBy preserves the hash partitioning on disk so later
        classification joins shuffle only the read side
        (KeyValueIndex.scala:125-139).
        """
        # a relative location would split the index: Spark resolves it
        # against the warehouse dir, the pyarrow sidecars against cwd
        location = fsio.absolutize(location)
        table_name = table_name or "slacken_index_" + os.path.basename(
            location.rstrip("/")
        ).replace("-", "_").replace(".", "_")
        self.spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        key = self.cfg.key_cols
        (
            self.records.repartition(self.buckets, *key)
            .write.mode("overwrite")
            .option("path", location)
            .bucketBy(self.buckets, *key)
            .sortBy(*key)
            .format("parquet")
            .saveAsTable(table_name)
        )
        params = {
            # version 2 records the wide-minimizer id scheme in
            # splitter.wide ("exact" multi-column id1..idN words, N =
            # ceil(m/31) ≤ 4, vs "hashed" 62-bit, irreversible);
            # version-1 sidecars predate the field and always used
            # hashed ids for m > 31
            "version": 2,
            "buckets": self.buckets,
            "key_cols": key,
            "splitter": self.cfg.to_dict(),
        }
        # sidecars via any-FS (HDFSUtil.scala:76-98): location may be a
        # file://, s3://, hdfs:// or gs:// URI, same as the table path
        fsio.write_text(
            posixpath.join(location, "_index_params.json"),
            json.dumps(params, indent=2),
        )
        if self.priority_table is not None:
            import numpy as np

            fs_, loc_ = fsio.any_fs(location)
            with fs_.open_output_stream(
                posixpath.join(loc_, "_priority_table.npy")
            ) as fh:
                np.save(fh, self.priority_table)
        tax_dir = posixpath.join(location, "_taxonomy")
        fs_, tax_ = fsio.any_fs(tax_dir)
        fs_.create_dir(tax_, recursive=True)
        self.taxonomy.save(tax_dir)
        self.location = location
        self.records = self.spark.table(table_name)
        return self

    @classmethod
    def load(cls, spark: SparkSession, location: str) -> "KeyValueIndex":
        """Reload: params sidecar + bucketed-table DDL registration
        (KeyValueIndex.scala:150-159, 407-427). Pins
        spark.sql.shuffle.partitions to the bucket count."""
        location = fsio.absolutize(location)  # see write()
        params = json.loads(
            fsio.read_text(posixpath.join(location, "_index_params.json"))
        )
        cfg = MinimizerConfig.from_dict(params["splitter"])
        buckets = int(params["buckets"])
        taxonomy = Taxonomy.load_dir(posixpath.join(location, "_taxonomy"))
        table = None
        table_path = posixpath.join(location, "_priority_table.npy")
        if fsio.exists(table_path):
            import io as _io

            import numpy as np

            fs_, tp_ = fsio.any_fs(table_path)
            with fs_.open_input_stream(tp_) as fh:
                table = np.load(_io.BytesIO(fh.read()))
        name = "slacken_index_" + os.path.basename(location.rstrip("/")).replace(
            "-", "_"
        ).replace(".", "_")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        cols = ", ".join(f"{c} BIGINT" for c in cfg.key_cols) + ", taxon INT"
        key_ddl = ", ".join(cfg.key_cols)
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET"
            f" CLUSTERED BY ({key_ddl}) SORTED BY ({key_ddl})"
            f" INTO {buckets} BUCKETS LOCATION '{location}'"
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(buckets))
        return cls(
            spark,
            spark.table(name),
            cfg,
            taxonomy,
            buckets,
            location,
            priority_table=table,
        )

    # ---------------- stats (KeyValueIndex.scala:220-257) ----------------

    def distinct_minimizers_per_taxon(self) -> DataFrame:
        return self.records.groupBy("taxon").agg(
            F.count_distinct(*self.cfg.key_cols).alias("n_minimizers")
        )

    def stats(self) -> dict:
        row = self.records.agg(
            F.count(F.lit(1)).alias("records"),
            F.count_distinct("taxon").alias("taxa"),
        ).first()
        return {"records": row["records"], "taxa": row["taxa"]}

    # ---------------- classification join ----------------

    def respace(self, spaces: int) -> "KeyValueIndex":
        """Project the index to a larger spaced-seed mask — a
        dimensionality reduction (KeyValueIndex.respace,
        KeyValueIndex.scala:347-383): zero the newly-masked 2-bit
        positions of every stored minimizer, then re-fold LCAs of
        now-colliding records. The resulting index stores MASKED ids;
        its cfg.masked flag makes span extraction mask read minimizers
        identically, so classification joins keep working."""
        from dataclasses import replace

        if self.priority_table is not None:
            raise ValueError("cannot respace a table-ordered index")
        if spaces <= self.cfg.spaces:
            raise ValueError(
                f"respacing to <= current spaces is not meaningful"
                f" (was {self.cfg.spaces}, requested {spaces})"
            )
        if self.cfg.m > 31 and not self.cfg.wide_exact:
            raise ValueError(
                "cannot respace a hashed wide index (ids are irreversible);"
                " build with wide='exact'"
            )
        new_cfg = replace(self.cfg, spaces=spaces, masked=True)
        key = new_cfg.key_cols
        lca_udf = self.taxonomy.lca_list_udf(self.spark)
        # per-word seed-mask slices: one column for m ≤ 31, id1..idN for
        # exact wide ids — each word masks its own slice of the seed
        masked_cols = [
            F.col(c).bitwiseAND(F.lit(mask)).alias(c)
            for c, mask in zip(key, new_cfg.word_masks)
        ]
        new_records = (
            self.records.select(*masked_cols, "taxon")
            .groupBy(*key)
            .agg(F.collect_list("taxon").alias("taxa"))
            .select(
                *key, lca_udf(F.col("taxa")).cast("int").alias("taxon")
            )
        )
        return KeyValueIndex(
            self.spark, new_records, new_cfg, self.taxonomy, self.buckets
        )

    def with_records(self, records: DataFrame) -> "KeyValueIndex":
        """Same params/taxonomy over different records (the dynamic index;
        KeyValueIndex.withRecords)."""
        return KeyValueIndex(
            self.spark, records, self.cfg, self.taxonomy, self.buckets
        )

    def span_hits_with_minimizer(self, spans: DataFrame) -> DataFrame:
        """span_hits keeping the minimizer column
        (findHitsWithMinimizers, KeyValueIndex.scala:205-217)."""
        joined = spans.join(self.records, self.cfg.key_cols, "left")
        return joined.select(
            "header",
            *self.cfg.id_cols,
            "distinct",
            "ordinal",
            F.when(spans["flag"] == FLAG_AMBIGUOUS, F.lit(AMBIGUOUS_SPAN))
            .when(spans["flag"] == FLAG_MATE_PAIR_BORDER, F.lit(MATE_PAIR_BORDER))
            .when(F.col("taxon").isNotNull(), F.col("taxon"))
            .otherwise(F.lit(NONE))
            .cast("int")
            .alias("taxon"),
            F.col("kmers").alias("count"),
        )

    def span_hits(self, spans: DataFrame) -> DataFrame:
        """Classification join + sentinel decode (J1 + spanToHit,
        Classifier.scala:79-90, KeyValueIndex.scala:176-185). LEFT join
        keeps unmatched spans as NONE hits; ambiguous / mate-border spans
        decode to their sentinel taxa."""
        joined = spans.join(self.records, self.cfg.key_cols, "left")
        return joined.select(
            "header",
            "distinct",
            "ordinal",
            F.when(spans["flag"] == FLAG_AMBIGUOUS, F.lit(AMBIGUOUS_SPAN))
            .when(spans["flag"] == FLAG_MATE_PAIR_BORDER, F.lit(MATE_PAIR_BORDER))
            .when(F.col("taxon").isNotNull(), F.col("taxon"))
            .otherwise(F.lit(NONE))
            .cast("int")
            .alias("taxon"),
            F.col("kmers").alias("count"),
        )
