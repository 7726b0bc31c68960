"""Sources & sinks from SURVEY.md §2.1, as named engine APIs.

The reference lands/consumes data as gzipped NDJSON, remote CSV with a
``'-'`` null sentinel, hive-partitioned parquet with bounded part sizes,
and ordered single-file parquet; its change-feed reader picks "latest Full
snapshot + all later Incrementals" from a file manifest. Each of those is a
one-to-few-liner on Spark — the value here is pinning the exact reference
semantics (cited per function) behind stable names with tests, so the §2.1
inventory maps 1:1 onto engine API.

All functions are driver-thin: they only declare reads/writes; Spark
executes them distributed. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- sources
def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S2 — NDJSON(.gz) scan (``read_ndjson_auto`` in the reference,
    ``sql/010_raw_to_parquet.sql:40,78,116``). Gzip is transparent to
    Spark's json source. Pass ``schema`` to skip the inference pass — the
    reference infers because "the schema vary by file"
    (``geo/extract.py:119-121``); at 100 TB an explicit schema avoids a
    full second scan of the input."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_sentinel(
    spark: SparkSession,
    path: str,
    null_value: str = "-",
    header: bool = True,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S3 — CSV scan with a null sentinel (``read_csv_auto(url,
    nullstr='-')``, ``sql/010_raw_to_parquet.sql:152-155``)."""
    reader = spark.read.option("header", header).option("nullValue", null_value)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def current_change_batch(
    manifest: DataFrame,
    entity_col: str = "entity",
    date_col: str = "date",
    stage_col: str = "stage",
    full_value: str = "Full",
) -> DataFrame:
    """S6 — change-feed batch discovery ("binlog tail"): per entity, keep
    the latest Full snapshot and every later Incremental — the reference's
    reverse-chronological ``in_current_batch`` scan
    (``sra/mirror.py:93-145``), as one window + filter instead of a Python
    loop. Input: a manifest DataFrame (one row per feed file). Output: the
    rows forming the current batch, with ``is_full`` flag.

    Deliberate divergence from the reference: when an entity has NO Full
    snapshot, the reference marks all its Incrementals as in-batch
    (``mirror.py:119-128``); this drops the entity instead — incrementals
    without a base snapshot replay into an incomplete table, so the safer
    contract is to surface the entity only once its Full lands.

    Scale: the manifest is file metadata (rows ≈ file count), so the
    window shuffle is trivial next to the data it gates."""
    w = Window.partitionBy(entity_col)
    latest_full = F.max(
        F.when(F.col(stage_col) == full_value, F.col(date_col))
    ).over(w)
    return (
        manifest.withColumn("__latest_full", latest_full)
        .filter(
            F.col("__latest_full").isNotNull()
            & (F.col(date_col) >= F.col("__latest_full"))
        )
        .withColumn("is_full", F.col(stage_col) == full_value)
        .drop("__latest_full")
    )


# ------------------------------------------------------------------ sinks
def write_ndjson_gz(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S12 — gzipped NDJSON sink (``orjson.dumps`` + gzip writer,
    ``biosample/extract.py:130-141``)."""
    df.write.mode(mode).option("compression", "gzip").json(path)


def write_parquet_chunked(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 500_000,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """S8/S10 — bounded part-file parquet sink: the reference buffers
    500k records per part (``sra/mirror_parquet.py:66-67``) / splits at
    500 MB (``etl/icite.py:108-111``); Spark's ``maxRecordsPerFile`` gives
    the same bound without the hand-rolled buffer, and the write is
    task-parallel instead of single-threaded."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .option("compression", compression)
        .parquet(path)
    )


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    compression: str = "zstd",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """S11 — hive-partitioned sink (``{entity}/date=…/stage=…``,
    ``sra/catalog.py:63-78``; ``year=/month=`` ``geo/extract.py:93-95``).
    Partition values become directories, enabling partition pruning on
    read (P8)."""
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def write_sorted_single_file(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """S9 — ordered single-file parquet sink (``COPY (… ORDER BY key) TO
    'x.parquet'``, ``sql/010_raw_to_parquet.sql:8-12``): clustering for
    range-read locality. coalesce(1) funnels through one task — correct
    for the reference's single-file contract, a deliberate non-goal at
    100 TB where the equivalent is a range-partitioned sort
    (``orderBy`` alone) + table sort order; use this only for
    small compat exports."""
    df.orderBy(*[F.col(c) for c in order_cols]).coalesce(1).write.mode(
        mode
    ).option("compression", compression).parquet(path)
