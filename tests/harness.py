"""Local replica of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet dir, compare
row-count + column names + order-insensitive values (columns sorted by name).

Stricter than a value-hash: mismatches report the first differing rows.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    import decimal

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def compare_query(spark, name: str, query_fn, oracle: str, sf_dir: str) -> list[str]:
    """Returns a list of problem strings (empty == pass)."""
    problems: list[str] = []
    sdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    odf = con.execute(oracle).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    if len(sdf) != len(odf):
        problems.append(f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}")
    a, b = canon_rows(sdf), canon_rows(odf)
    if a != b:
        sa, sb = set(a), set(b)
        only_a = list(sa - sb)[:3]
        only_b = list(sb - sa)[:3]
        problems.append(
            f"{name}: value mismatch; spark-only={only_a} oracle-only={only_b}"
        )
    return problems
