"""slacken_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
system (JNP-Solutions/Slacken, a Kraken 2-style metagenomic profiler on
Spark; see SURVEY.md) as an idiomatic PySpark engine, and extends it with
the operators a large-scale training-data pipeline needs (deduplication,
similarity search, text analysis, multimodal column plumbing).

Layout:
  kernels/    single-node numpy kernels (2-bit DNA, taxonomy/LCA, minimizers)
  sources/    input readers (FASTA/FASTQ/dmp/TSV/parquet)
  operators/  distributed operators (index build, classify, asof, sessionize)
  functions/  column-level function libraries (text, dedup, similarity)
  plans/      ready-made query plans over the relational test tables
  streaming/  Structured Streaming wrappers
"""

__version__ = "0.1.0"
