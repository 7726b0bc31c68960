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

_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``omicidx_etl_spark`` importable on Python workers regardless of
    the driver's cwd/sys.path (mapInPandas / pandas UDFs unpickle by module
    name). Zips the package once and addPyFile()s it per SparkContext —
    the same mechanism ``spark-submit --py-files`` uses."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "omicidx_etl_spark")
    zpath = os.path.join(tempfile.gettempdir(), "omicidx_etl_spark_pyfiles.zip")
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
        os.replace(tmp, zpath)
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already registered on this context
    _SHIPPED.add(key)


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
