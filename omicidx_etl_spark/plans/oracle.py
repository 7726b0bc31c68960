"""Driver-style oracle comparison: run a Spark DataFrame and a DuckDB SQL
over the same parquet tables; compare row count, column-name set, and an
order-insensitive value comparison (sorted columns + sorted rows).

Used by tests and the local pre-flight harness so every queries()/oracle_sql()
pair is proven equivalent before the driver sees it.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v
            )
    key = df.columns.tolist()
    return df.sort_values(key, kind="mergesort").reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    got = spark_df.toPandas()
    con = duckdb_conn(sf_dir)
    exp = con.execute(sql).df()
    con.close()
    if sorted(got.columns) != sorted(exp.columns):
        return False, f"columns differ: spark={sorted(got.columns)} duck={sorted(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count differs: spark={len(got)} duck={len(exp)}"
    g, e = _norm(got), _norm(exp)
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    return False, f"value mismatch col={c} row={i}: {a!r} != {b!r}"
            elif pd.isna(a) and pd.isna(b):
                continue
            elif a != b:
                return False, f"value mismatch col={c} row={i}: {a!r} != {b!r}"
    return True, f"ok ({len(got)} rows)"
