"""Metadata tables: snapshots/files/refs exposed as DataFrames (Iceberg's
``tbl.snapshots`` / ``tbl.files`` / ``tbl.refs``) — O(metadata) driver-side
relations, never a data scan, so operators can monitor commits, file
layout, and branch heads with plain SQL."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from omicidx_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
    ]
)

CH_SCHEMA = "doc_id string, n_tok int, seq long, op string"


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4)
    t.merge(spark.createDataFrame([("a", 1, 10, "U")], CH_SCHEMA), mode="mor")
    t.merge(spark.createDataFrame([("b", 2, 11, "U")], CH_SCHEMA), mode="cow")
    return t


def test_meta_snapshots_reflects_history(spark, table):
    rows = {r["snapshot_id"]: r for r in table.meta_snapshots().collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["operation"] == "create" and rows[0]["parent_id"] is None
    assert rows[2]["parent_id"] == 1
    assert json.loads(rows[2]["summary"])["mode"] == "cow"
    # seq ceiling is the monotone high-water mark
    assert rows[2]["seq_ceiling"] == 11


def test_meta_files_base_vs_delta_and_stats(spark, table):
    files = table.meta_files().collect()
    # sid1's MOR delta survives under sid2 (COW rewrote only b's bucket)
    kinds = {(r["is_delta"]) for r in files}
    assert kinds == {True, False}
    for r in files:
        stats = json.loads(r["stats"])
        assert stats is None or "__seq" in stats
    # pinned to the first merge, only the delta exists
    old = table.meta_files(as_of=1).collect()
    assert all(r["is_delta"] for r in old)


def test_meta_refs_lists_main_and_branches(spark, table):
    table.merge(
        spark.createDataFrame([("c", 3, 12, "U")], CH_SCHEMA),
        mode="mor", branch="audit",
    )
    refs = {r["name"]: r["snapshot_id"] for r in table.meta_refs().collect()}
    assert refs["main"] == 2
    assert refs["audit"] == 3
    # files visible through the branch include the staged delta
    n_branch = table.meta_files(branch="audit").count()
    assert n_branch == table.meta_files().count() + 1


def test_meta_constraints_and_blooms(spark, table):
    assert table.meta_constraints().count() == 0
    table.add_constraint("tok_pos", "n_tok > 0")
    got = table.meta_constraints().collect()
    assert [(r["name"], r["expression"]) for r in got] == [("tok_pos", "n_tok > 0")]

    assert table.meta_blooms().count() == 0
    table.build_blooms()
    rows = table.meta_blooms().collect()
    assert rows and all(r["live"] for r in rows)
    assert all(r["m_bits"] >= 1024 and r["n_hashes"] == 4 for r in rows)
    # a compaction leaves dead sidecars until the next prune pass
    table.compact()
    table.expire_snapshots(keep_last=1, orphan_grace_s=0)
    assert any(not r["live"] for r in table.meta_blooms().collect())
    table.build_blooms()
    assert all(r["live"] for r in table.meta_blooms().collect())
