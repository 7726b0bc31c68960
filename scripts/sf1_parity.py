#!/usr/bin/env python
"""One-off order-of-magnitude parity validation (VERDICT r02 stretch #8).

Synthesizes an sf1-equivalent dataset (10x sf0.1) by replicating each fact
table 10 times with key offsets that preserve referential integrity —
copy i of orders gets o_orderkey + i*OFF and o_custkey + i*OFF, matching
copy i of customer, etc. Dims (region, nation) are shared. Then runs the
ENTIRE oracle-paired registry (Spark vs DuckDB over the same parquet) with
the exact compare the driver uses: sorted-by-all-columns frames, dtype
check, value equality.

Purpose: the fixed-point float convention (CLAUDE.md oracle-parity note)
and every aggregate/ordering tie-break get validated at 10x the driver's
gate scale before anyone trusts them at 100x. Run manually:

    python scripts/sf1_parity.py [out_dir]

Never run concurrently with bench.py (benchmark hygiene).
"""

from __future__ import annotations

import os
import sys
import time

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000_000  # key offset per copy; far above any sf0.1 key

# table -> columns to offset per copy (PKs and the FKs that reference them)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]  # dims: genuinely small at every SF


def build(out_dir: str, copies: int = 10) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in SHARED:
        con.execute(
            f"copy (select * from read_parquet('{SRC}/{t}.parquet')) "
            f"to '{out_dir}/{t}.parquet' (format parquet)"
        )
    for t, keys in KEYED.items():
        sel = []
        cols = [
            r[0]
            for r in con.execute(
                f"describe select * from read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        for c in cols:
            if c in keys:
                sel.append(f"{c} + i.i * {OFF} as {c}")
            else:
                sel.append(c)
        con.execute(
            f"copy (select {', '.join(sel)} "
            f"from read_parquet('{SRC}/{t}.parquet'), "
            f"(select unnest(range({copies})) as i) i) "
            f"to '{out_dir}/{t}.parquet' (format parquet)"
        )
        n = con.execute(
            f"select count(*) from read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(f"  {t}: {n} rows", flush=True)


def run_parity(sf_dir: str) -> int:
    import duckdb
    import pandas as pd

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from omicidx_etl_spark.queries import oracle_sql, queries
    from omicidx_etl_spark.session import get_spark

    QUERIES, ORACLE_SQL = queries(), oracle_sql()
    spark = get_spark("sf1-parity")
    con = duckdb.connect()
    for t in SHARED + list(KEYED):
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed = []
    for name, fn in QUERIES.items():
        if name not in ORACLE_SQL:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.execute(ORACLE_SQL[name]).df()
            cols = sorted(got.columns)
            got = got[cols].sort_values(cols).reset_index(drop=True)
            want = want[cols].sort_values(cols).reset_index(drop=True)
            assert list(map(str, got.dtypes)) == list(map(str, want.dtypes)), (
                f"dtypes {list(got.dtypes)} vs {list(want.dtypes)}"
            )
            pd.testing.assert_frame_equal(got, want)
            print(f"  OK   {name}: {len(got)} rows {time.time()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report-all is the point
            failed.append(name)
            print(f"  FAIL {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
    spark.stop()
    print(f"{len(ORACLE_SQL) - len(failed)}/{len(ORACLE_SQL)} parity at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    if not os.path.exists(os.path.join(out, "lineitem.parquet")):
        print(f"building 10x sf0.1 at {out}", flush=True)
        build(out)
    raise SystemExit(run_parity(out))
