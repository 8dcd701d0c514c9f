"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, normalizes both (columns sorted by name, rows sorted),
and asserts exact equality (floats: exact bitwise after the query's own
rounding discipline — the catalog is designed so both engines compute the
same IEEE values).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify for stable sorting/na handling
    df = df.reset_index(drop=True)
    if len(df) == 0:
        return df
    order = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
    df = df.iloc[order.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    issues: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return [f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"]
    if len(sp) != len(du):
        issues.append(f"{name}: row count spark={len(sp)} duck={len(du)}")
        return issues
    nsp = normalize(sp)
    ndu = normalize(du)
    for col in nsp.columns:
        sv = nsp[col].tolist()
        dv = ndu[col].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            issues.append(
                f"{name}.{col}: {len(bad)}/{len(sv)} values differ; first at row {i}: "
                f"spark={a!r} duck={b!r}"
            )
    return issues
