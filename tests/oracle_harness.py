"""Local replica of the driver's correctness gate: run each queries() entry on
Spark AND its oracle_sql() on DuckDB over the same parquet, compare
row-count + column names + sorted values. Stricter than the driver (exact
equality after canonicalization) so passing here implies passing there.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def _strict_value(v):
    """Driver-faithful stringify: NO numeric normalization (in particular
    no Decimal->float), so a DECIMAL(18,6) trailing-zero rendering
    ('-2.287980') mismatches DuckDB's float path ('-2.28798') exactly the
    way the driver's stringify-then-hash did in CORRECTNESS_r10.  Queries
    must ship rendering-proof types (integers / strings / dates), not rely
    on numeric-equality comparison."""
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonicalize_strict(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(
        tuple(_strict_value(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spark_pd = spark_df.toPandas()
    if sorted(spark_pd.columns) != sorted(duck_df.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(spark_pd.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_pd) != len(duck_df):
        problems.append(f"{name}: row count spark={len(spark_pd)} duck={len(duck_df)}")
    a = canonicalize(spark_pd)
    b = canonicalize(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        only_a = [r for r in a[:2000] if r not in set(b[:2000])][:2]
        problems.append(f"{name}: value mismatch; first row diffs={diffs} only_spark={only_a}")
        return problems
    # rendering gate (r11): numerically equal is NOT enough — the driver
    # hashes STRINGIFIED rows, so the strict canon must match too
    sa = canonicalize_strict(spark_pd)
    sb = canonicalize_strict(duck_df)
    if sa != sb:
        diffs = [(x, y) for x, y in zip(sa, sb) if x != y][:3]
        problems.append(
            f"{name}: RENDERING mismatch (numeric values equal — ship "
            f"integers/strings, not DECIMAL/float); first diffs={diffs}"
        )
    return problems


def run_one(spark, con, name: str, fn, sql: str | None, sf_dir: str) -> list[str]:
    spark_df = fn(spark, sf_dir)
    if sql is None:
        n = spark_df.count()
        return [] if n >= 0 else [f"{name}: negative count?"]
    duck_df = con.execute(sql).fetchdf()
    return compare(spark_df, duck_df, name)
