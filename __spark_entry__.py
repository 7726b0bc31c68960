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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _Q.cdc_replay_events(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data-pipeline ops). Each callable takes (spark, sf_dir)."""
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query, same column aliases; all
    float outputs are fixed-point-exact so value hashes match."""
    return _Q.oracle_sql()
