"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC consolidation (latest-per-key +
tombstone replay, the reference's ``010_raw_to_parquet.sql:36-43,341``
semantics) on the sf0.001 events table. ``queries()``/``oracle_sql()``
expose the full operator registry from ``omicidx_etl_spark.queries`` —
every entry is pre-verified against DuckDB by
``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omicidx_etl_spark import queries as _Q  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make ``omicidx_etl_spark`` importable on Python workers regardless of
    the driver's cwd/sys.path (mapInPandas / pandas UDFs unpickle by module
    name) — delegates to the package's own shipping helper, the same
    mechanism ``spark-submit --py-files`` uses."""
    from omicidx_etl_spark.session import ensure_worker_package

    ensure_worker_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ship_package(spark)
    return _Q.cdc_replay_events(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    run.__name__ = getattr(fn, "__name__", "query")
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline ops). Each callable takes (spark, sf_dir)."""
    return {k: _wrap(v) for k, v in _Q.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query, same column aliases; all
    float outputs are fixed-point-exact so value hashes match."""
    return _Q.oracle_sql()
