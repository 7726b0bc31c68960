"""Every queries()/oracle_sql() pair must be value-equivalent on DuckDB —
the same check the driver runs (row count + column names + order-insensitive
values), at sf0.001 for speed (driver uses sf0.01)."""

from __future__ import annotations

import pytest

from omicidx_etl_spark import queries as Q
from omicidx_etl_spark.plans.oracle import compare
from tests.conftest import SF_ORACLE

NAMES = sorted(Q._REGISTRY)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, name):
    fn, sql = Q._REGISTRY[name]
    if sql is None:
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0
        return
    ok, msg = compare(fn(spark, SF_ORACLE), sql, SF_ORACLE)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    assert set(E.oracle_sql()) <= set(E.queries())
