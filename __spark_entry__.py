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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the catalog modules populates the registry.
from slacken_spark.plans import catalog as _catalog
from slacken_spark.plans import load_all as _load_all

_load_all()

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full genomic pipeline — deterministic genome
    construction → minimizer scan → LCA index build → classification
    join → per-read resolve (SURVEY §3 E1+E2) — on sf0.001."""
    fn, _ = _catalog.QUERIES["genomic_classify"]
    return fn(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _catalog.QUERIES.items() if sql is not None
    }
