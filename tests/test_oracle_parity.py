"""Every queries()/oracle_sql() pair must be value-equivalent on DuckDB —
the same check the driver runs (row count + column names + order-insensitive
values), at sf0.001 for speed (driver uses sf0.01)."""

from __future__ import annotations

from omicidx_etl_spark import queries as Q
from omicidx_etl_spark.plans.oracle import compare
from tests.conftest import SF_ORACLE

NAMES = sorted(Q._REGISTRY)


def _check_one(spark, name: str) -> tuple[str, bool, str]:
    fn, sql = Q._REGISTRY[name]
    if sql is None:
        return name, fn(spark, SF_ORACLE).count() >= 0, "rows-only"
    ok, msg = compare(fn(spark, SF_ORACLE), sql, SF_ORACLE)
    return name, ok, msg


def test_oracle_parity_all(spark):
    """All 50+ registry pairs, checked CONCURRENTLY on a thread pool: Spark
    schedules jobs from multiple threads onto the same local[8] session and
    each thread opens its own DuckDB connection, so the file's wall time is
    bounded by the slowest few queries instead of the sum of all of them
    (sequential: ~4 min; pooled: ~1 min). Failures are aggregated so one
    broken query still reports every other broken query."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(lambda n: _check_one(spark, n), NAMES))
    bad = [f"{n}: {msg}" for n, ok, msg in results if not ok]
    assert not bad, f"{len(bad)}/{len(results)} oracle mismatches:\n" + "\n".join(bad)


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_compare_detects_mismatches():
    """The comparator is vectorized (numpy column-wise) — prove it still
    FAILS on real differences, per dtype family, not just passes on
    identical inputs."""
    import numpy as np
    import pandas as pd

    from omicidx_etl_spark.plans.oracle import _col_mismatch

    f = pd.Series([1.0, np.nan, 3.0])
    assert _col_mismatch(f, f.copy()) is None
    assert _col_mismatch(f, pd.Series([1.0, np.nan, 4.0])) == 2
    o = pd.Series([None, (1, 2), "x"], dtype=object)
    assert _col_mismatch(o, o.copy()) is None
    assert _col_mismatch(o, pd.Series([None, (1, 3), "x"], dtype=object)) == 1
    ts = pd.Series(pd.to_datetime(["2024-01-01", None]))
    assert _col_mismatch(ts, ts.copy()) is None
    assert _col_mismatch(ts, pd.Series(pd.to_datetime(["2024-01-02", None]))) == 0
    assert _col_mismatch(pd.Series([1, 2]), pd.Series([1, 9])) == 1
