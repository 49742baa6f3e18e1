"""Local replica of the driver's duckdb-oracle comparison.

Runs the Spark plan and the oracle SQL side by side, canonicalizes both
frames (sorted column names, row sort, string rendering) and compares
exactly — stricter than a hash, with a readable diff on failure.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TESTDATA_TABLES = (
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
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()

    def render(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(render)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(
    spark_df, oracle_sql: str, sf_dir: str, require_rows: bool = False
) -> tuple[bool, str]:
    left = canonicalize(spark_df.toPandas())
    con = duckdb_conn(sf_dir)
    right = canonicalize(con.execute(oracle_sql).fetchdf())
    con.close()
    if require_rows and len(right) == 0:
        return False, "oracle returned 0 rows — query proves nothing, fix thresholds"
    if list(left.columns) != list(right.columns):
        return False, f"column mismatch: spark={list(left.columns)} oracle={list(right.columns)}"
    if len(left) != len(right):
        return False, f"row count mismatch: spark={len(left)} oracle={len(right)}"
    neq = (left != right).any(axis=1)
    if neq.any():
        idx = neq[neq].index[:5]
        msg = ["value mismatch (first 5):"]
        for i in idx:
            msg.append(f"  spark : {left.loc[i].to_dict()}")
            msg.append(f"  oracle: {right.loc[i].to_dict()}")
        return False, "\n".join(msg)
    return True, f"OK ({len(left)} rows)"
