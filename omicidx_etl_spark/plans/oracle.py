"""Driver-style oracle comparison: run a Spark DataFrame and a DuckDB SQL
over the same parquet tables; compare row count, column-name set, and an
order-insensitive value comparison (sorted columns + sorted rows).

Used by tests and the local pre-flight harness so every queries()/oracle_sql()
pair is proven equivalent before the driver sees it.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
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
            # tuple-ify list-likes so sort/compare work — but only when the
            # column actually holds list-likes (probe the first non-null
            # value instead of mapping a Python lambda over every row)
            probe = next((v for v in df[c] if v is not None), None)
            if (
                probe is not None
                and not isinstance(probe, (str, bytes))
                and (isinstance(probe, (list, tuple)) or hasattr(probe, "__len__"))
            ):
                df[c] = df[c].map(
                    lambda v: None if v is None else tuple(v)
                )
    key = df.columns.tolist()
    return df.sort_values(key, kind="mergesort").reset_index(drop=True)


def _col_mismatch(ga: pd.Series, ea: pd.Series) -> "int | None":
    """Index of the first differing value (NaN==NaN, None==None), or None.
    Vectorized: the old per-value Python loop took hours on the multi-10^7-row
    results an sf1 parity sweep produces."""
    gv, ev = ga.values, ea.values
    if ga.dtype.kind == "f" and ea.dtype.kind == "f":
        eq = (gv == ev) | (np.isnan(gv.astype("float64")) & np.isnan(ev.astype("float64")))
    else:
        eq = np.asarray(gv == ev)
        if eq.dtype != bool:  # object compare can yield object array
            eq = eq.astype(bool)
        both_na = ga.isna().values & ea.isna().values
        eq = eq | both_na
    if eq.all():
        return None
    return int(np.argmax(~eq))


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
        i = _col_mismatch(g[c], e[c])
        if i is not None:
            a, b = g[c].iloc[i], e[c].iloc[i]
            return False, f"value mismatch col={c} row={i}: {a!r} != {b!r}"
    return True, f"ok ({len(got)} rows)"
