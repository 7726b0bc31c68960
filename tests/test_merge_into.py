"""Conditional MERGE INTO clause semantics (lake/merge_into.py): WHEN
MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED THEN INSERT,
compiled to a minimal change set over the versioned lake table. The
reference upserts unconditionally (omicidx_etl/sra/catalog.py:291-320);
these are the general lakehouse clauses layered on the same machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _state(t, **kw):
    return {
        r["doc_id"]: (r["n_tok"], r["source"])
        for r in t.read(**kw).collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4)
    t.overwrite(
        spark.createDataFrame(
            [("a", 10, "web"), ("b", 20, "web"), ("c", 30, "pdf")], SCHEMA
        )
    )
    return t


SRC = "doc_id string, n_tok int, quality double"


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_update_delete_insert_clauses(spark, table, mode):
    src = spark.createDataFrame(
        [("a", 11, 0.9), ("b", 0, 0.1), ("d", 44, 0.8)], SRC
    )
    table.merge_into(
        src,
        update_set={"n_tok": "source.n_tok"},
        update_condition="source.quality >= 0.5",
        delete_condition="source.quality < 0.2",
        insert_values={"n_tok": "source.n_tok", "source": F.lit("new")},
        mode=mode,
    )
    # a: matched+quality ok -> updated (source col untouched); b: matched
    # low quality -> deleted; c: not in source -> untouched; d: inserted
    assert _state(table) == {
        "a": (11, "web"),
        "c": (30, "pdf"),
        "d": (44, "new"),
    }


def test_star_update_and_default_insert(spark, table):
    src = spark.createDataFrame([("a", 99, 0.9), ("e", 5, 0.5)], SRC)
    table.merge_into(src, update_set="*", insert_values="*")
    st = _state(table)
    assert st["a"] == (99, "web")  # '*' maps only same-named source cols
    assert st["e"] == (5, None)  # unmapped target col null-fills
    assert st["b"] == (20, "web") and st["c"] == (30, "pdf")


def test_update_only_no_insert(spark, table):
    src = spark.createDataFrame([("a", 1, 0.9), ("zz", 2, 0.9)], SRC)
    table.merge_into(src, update_set={"n_tok": "source.n_tok"})
    st = _state(table)
    assert st["a"] == (1, "web")
    assert "zz" not in st  # no insert clause -> not-matched rows dropped


def test_insert_resurrects_tombstoned_key(spark, table):
    # delete 'a' via the CDC path, then MERGE-insert it back: the insert's
    # seq must exceed the tombstone's or the old delete would win forever
    table.merge(
        spark.createDataFrame([("a", 0, "x", 100, "D")],
                              "doc_id string, n_tok int, source string, seq long, op string"),
        mode="mor",
    )
    assert "a" not in _state(table)
    src = spark.createDataFrame([("a", 7, 0.9)], SRC)
    table.merge_into(src, insert_values="*")
    assert _state(table)["a"] == (7, None)


def test_conditions_with_null_source_values_are_false(spark, table):
    src = spark.createDataFrame([("a", 5, None)], SRC)
    table.merge_into(
        src,
        update_set={"n_tok": "source.n_tok"},
        update_condition="source.quality >= 0.5",  # NULL -> no update
        delete_condition="source.quality < 0.2",  # NULL -> no delete
    )
    assert _state(table)["a"] == (10, "web")


def test_exactly_once_batch_skip(spark, table):
    src = spark.createDataFrame([("a", 1, 0.9)], SRC)
    s1 = table.merge_into(src, update_set="*", app_id="m", batch_id=3)
    s2 = table.merge_into(
        spark.createDataFrame([("a", 777, 0.9)], SRC),
        update_set="*", app_id="m", batch_id=3,
    )
    assert s2["summary"]["skipped"] is True
    assert s2["snapshot_id"] == s1["snapshot_id"]
    assert _state(table)["a"] == (1, "web")


def test_branch_merge_into_publish(spark, table):
    src = spark.createDataFrame([("a", 1, 0.9), ("d", 4, 0.9)], SRC)
    table.merge_into(src, update_set="*", insert_values="*", branch="audit")
    assert _state(table)["a"] == (10, "web")  # main unaffected pre-publish
    assert _state(table, branch="audit")["a"] == (1, "web")
    table.publish("audit")
    st = _state(table)
    assert st["a"] == (1, "web") and st["d"] == (4, None)


def test_summary_records_merge_into(spark, table):
    src = spark.createDataFrame([("a", 1, 0.9)], SRC)
    snap = table.merge_into(src, update_set="*")
    assert snap["summary"]["operation"] == "merge_into"
    assert snap["summary"]["rows_written"] == 1  # minimal change set


def test_needs_a_clause(spark, table):
    src = spark.createDataFrame([("a", 1, 0.9)], SRC)
    with pytest.raises(ValueError, match="at least one clause"):
        table.merge_into(src)


def test_key_not_assignable(spark, table):
    src = spark.createDataFrame([("a", 1, 0.9)], SRC)
    with pytest.raises(ValueError, match="cannot be assigned"):
        table.merge_into(src, update_set={"doc_id": "source.doc_id"})
