"""Predicate deletes (DELETE FROM ... WHERE) and snapshot rollback —
Iceberg-parity row-level delete + rollback_to_snapshot over the lake table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest
from omicidx_etl_spark.lake import LakeTable
from omicidx_etl_spark.lake.table import DELETED_COL

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _mk(spark, tmp_path, n=300, buckets=8):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=buckets
    )
    t.overwrite(datagen.gen_sequences(spark, n, seed=7))
    return t


def test_delete_where_removes_matching_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t.read()
    doomed = before.filter(F.col("n_tok") > 1024).count()
    assert 0 < doomed < before.count()
    snap = t.delete_where([("n_tok", ">", 1024)])
    assert snap["summary"]["tombstone_rows"] == doomed
    assert snap["summary"]["delete_where"] == [["n_tok", ">", 1024]]
    after = t.read()
    assert after.count() == before.count() - doomed
    assert after.filter(F.col("n_tok") > 1024).count() == 0
    # tombstones persist (MOR) until purged
    dead = t.read(include_deleted=True, include_system=True).filter(
        F.col(DELETED_COL)
    )
    assert dead.count() == doomed


def test_delete_where_supersedes_all_versions_but_not_future(spark, tmp_path):
    """The delete's seq sits above every stored version; an older replayed
    event must NOT resurrect the key, a newer genuine event must."""
    t = _mk(spark, tmp_path)
    victim = t.read().select("doc_id").first()["doc_id"]
    t.delete_where([("doc_id", "=", victim)])
    del_seq = t.snapshot()["seq_ceiling"]

    def _event(seq):
        return dedup_latest(
            spark.createDataFrame(
                [(seq, "U", victim, [9], 1, "web")],
                "seq long, op string, doc_id string, tokens array<int>, "
                "n_tok int, source string",
            )
        )

    t.merge(_event(del_seq - 1))  # stale replay: no-op
    assert t.read().filter(F.col("doc_id") == victim).count() == 0
    t.merge(_event(del_seq + 1))  # genuine later insert: resurrects
    assert t.read().filter(F.col("doc_id") == victim).count() == 1


def test_delete_where_exactly_once(spark, tmp_path):
    t = _mk(spark, tmp_path)
    n0 = t.read().count()
    t.delete_where([("n_tok", "<", 1024)], app_id="job", batch_id=3)
    n1 = t.read().count()
    assert n1 < n0
    skipped = t.delete_where([("n_tok", "<", 1024)], app_id="job", batch_id=3)
    assert skipped["summary"]["skipped"] is True
    assert t.read().count() == n1


def test_delete_where_prunes_scan_by_bounds(spark, tmp_path):
    """Finding the doomed keys must ride the manifest bounds pruning: a
    predicate on the bucket key scans only the buckets that can match."""
    t = _mk(spark, tmp_path, n=400, buckets=8)
    victim = t.read().select("doc_id").first()["doc_id"]
    t.delete_where([("doc_id", "=", victim)])
    scan = t.last_scan
    assert scan["buckets_skipped"], scan  # most buckets provably excluded
    assert t.read().filter(F.col("doc_id") == victim).count() == 0


def test_rollback_restores_prior_state(spark, tmp_path):
    t = _mk(spark, tmp_path)
    good_sid = t.snapshot()["snapshot_id"]
    good = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    bad = spark.createDataFrame(
        [(10_000, "U", d, [1], 1, "bad") for d in list(good)[:20]],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t.merge(dedup_latest(bad))
    assert t.read().filter(F.col("source") == "bad").count() == 20
    snap = t.rollback(good_sid)
    assert snap["summary"]["operation"] == "rollback"
    assert snap["summary"]["rolled_back_to"] == good_sid
    restored = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    assert restored == good
    # history is append-only: the bad commit is still inspectable
    ops = [s["summary"].get("operation") for s in t.history()]
    assert ops.count("rollback") == 1
    assert t.read(as_of=snap["parent_id"]).filter(
        F.col("source") == "bad"
    ).count() == 20


def test_rollback_rejects_non_ancestor(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_branch("audit")
    t.merge(
        dedup_latest(
            spark.createDataFrame(
                [(50_000, "U", "doc_x", [1], 1, "b")],
                "seq long, op string, doc_id string, tokens array<int>, "
                "n_tok int, source string",
            )
        ),
        branch="audit",
    )
    branch_sid = t.branches()["audit"]
    with pytest.raises(ValueError, match="not an ancestor"):
        t.rollback(branch_sid)


def test_changes_raises_across_rollback(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sid0 = t.snapshot()["snapshot_id"]
    t.merge(
        dedup_latest(
            spark.createDataFrame(
                [(60_000, "U", "doc_y", [1], 1, "b")],
                "seq long, op string, doc_id string, tokens array<int>, "
                "n_tok int, source string",
            )
        )
    )
    t.rollback(sid0)
    with pytest.raises(ValueError, match="rollback"):
        t.changes(sid0).count()
