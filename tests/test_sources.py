"""Sources/sinks (SURVEY §2.1): round-trips, sentinel nulls, partition
layout, part-file bounds, and current-batch discovery semantics."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark import sources as S


def test_ndjson_gz_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(doc_id=f"d{i}", n=i, tags=["a", "b"]) for i in range(50)]
    )
    out = str(tmp_path / "nd")
    S.write_ndjson_gz(df, out)
    files = glob.glob(f"{out}/*.json.gz")
    assert files, "expected gzipped part files"
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    back = S.read_ndjson(spark, out, schema=schema)
    assert sorted(r.doc_id for r in back.collect()) == sorted(
        r.doc_id for r in df.collect()
    )
    assert back.filter(F.col("tags")[0] == "a").count() == 50


def test_csv_sentinel_nulls(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("id,val\n1,10\n2,-\n3,30\n")
    df = S.read_csv_sentinel(spark, str(p))
    rows = {r.id: r.val for r in df.collect()}
    assert rows[2] is None and rows[1] == 10 and rows[3] == 30


def test_parquet_chunked_bounds_files(spark, tmp_path):
    df = spark.range(10_000).withColumn("v", F.col("id") * 2).coalesce(1)
    out = str(tmp_path / "chunk")
    S.write_parquet_chunked(df, out, max_records_per_file=1000)
    parts = glob.glob(f"{out}/*.parquet")
    # 10k rows in one task, 1k/file bound -> >= 10 part files
    assert len(parts) >= 10
    assert spark.read.parquet(out).count() == 10_000


def test_hive_partitioned_layout_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [Row(k=i, date=f"2026-0{1 + i % 2}-01", stage="Full") for i in range(20)]
    )
    out = str(tmp_path / "hive")
    S.write_hive_partitioned(df, out, ["date", "stage"])
    assert os.path.isdir(f"{out}/date=2026-01-01/stage=Full")
    pruned = spark.read.parquet(out).filter(F.col("date") == "2026-01-01")
    assert pruned.count() == 10
    # partition filter must reach the scan (no data-file read of the other date)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_sorted_single_file(spark, tmp_path):
    df = spark.range(100).withColumn("k", (99 - F.col("id")).cast("long"))
    out = str(tmp_path / "single")
    S.write_sorted_single_file(df, out, ["k"])
    parts = glob.glob(f"{out}/*.parquet")
    assert len(parts) == 1
    got = [r.k for r in spark.read.parquet(out).collect()]
    assert got == sorted(got)


@pytest.fixture()
def manifest(spark):
    rows = [
        # entity A: Full(d2) supersedes Full(d1); incrementals after d2 in-batch
        Row(entity="A", date="2026-01-01", stage="Full"),
        Row(entity="A", date="2026-01-02", stage="Incremental"),
        Row(entity="A", date="2026-01-03", stage="Full"),
        Row(entity="A", date="2026-01-04", stage="Incremental"),
        Row(entity="A", date="2026-01-05", stage="Incremental"),
        # entity B: only incrementals -> no current batch at all
        Row(entity="B", date="2026-01-02", stage="Incremental"),
    ]
    return spark.createDataFrame(rows)


def test_current_change_batch(spark, manifest):
    got = S.current_change_batch(manifest).collect()
    a = sorted((r.date, r.stage, r.is_full) for r in got if r.entity == "A")
    assert a == [
        ("2026-01-03", "Full", True),
        ("2026-01-04", "Incremental", False),
        ("2026-01-05", "Incremental", False),
    ]
    # deliberate divergence from mirror.py:119-128 (which marks base-less
    # incrementals in-batch): without a Full base the entity is dropped
    assert not [r for r in got if r.entity == "B"]
