"""Differential test: every catalog query vs its DuckDB oracle, mirroring
the driver's correctness gate (see __spark_entry__ docstring)."""

import pytest

from tests.oracle_harness import compare, duckdb_conn


def _load_registry():
    from slacken_spark.plans import load_all

    return load_all()


REGISTRY = _load_registry()


def _demoted():
    from slacken_spark.plans.catalog import DEMOTED

    return DEMOTED


# Demoted entries (capacity-ceiling consolidations, catalog.DEMOTED)
# keep the SAME exact-oracle bar here — only the driver seat was
# released.
ALL_CASES = {**REGISTRY, **_demoted()}
ORACLE_CASES = [n for n, (_f, sql) in ALL_CASES.items() if sql is not None]
ROWS_ONLY_CASES = [n for n, (_f, sql) in ALL_CASES.items() if sql is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(name, spark, sf_dir, con):
    fn, sql = ALL_CASES[name]
    df = fn(spark, sf_dir)
    issues = compare(df, con, sql, name)
    assert not issues, "\n".join(issues)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(name, spark, sf_dir):
    fn, _ = ALL_CASES[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
