"""Write-audit-publish branches: merge(branch=) stages snapshots on a named
ref invisible to main readers; read(branch=) audits them; publish()
fast-forwards main only when main is still an ancestor of the branch head
(Iceberg wap.branch + fast_forward semantics). The reference's analogue is
the scratch-dir staging + marker promotion in omicidx_etl/sra/catalog.py:
291-320, which is neither atomic nor auditable with query semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from omicidx_etl_spark.lake import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
    ]
)

CH_SCHEMA = "doc_id string, n_tok int, seq long, op string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _state(t, **kw):
    return {
        r["doc_id"]: r["n_tok"]
        for r in t.read(**kw).select("doc_id", "n_tok").collect()
    }


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4)
    t.merge(_mk(spark, [("a", 1, 10, "U"), ("b", 2, 11, "U")]), mode="mor")
    return t


def test_wap_roundtrip(spark, table):
    # W: the branch auto-forks from main on first write
    table.merge(_mk(spark, [("b", 20, 12, "U"), ("c", 3, 13, "U")]),
                mode="mor", branch="audit")
    # main is oblivious...
    assert _state(table) == {"a": 1, "b": 2}
    # A: ...while the branch read sees the staged batch
    assert _state(table, branch="audit") == {"a": 1, "b": 20, "c": 3}
    assert table.branches().keys() == {"audit"}
    # P: O(1) pointer fast-forward, branch dropped by default
    table.publish("audit")
    assert _state(table) == {"a": 1, "b": 20, "c": 3}
    assert table.branches() == {}


def test_branch_accumulates_multiple_commits(spark, table):
    table.merge(_mk(spark, [("c", 3, 12, "U")]), mode="mor", branch="audit")
    table.merge(_mk(spark, [("d", 4, 13, "U")]), mode="cow", branch="audit")
    assert _state(table, branch="audit") == {"a": 1, "b": 2, "c": 3, "d": 4}
    assert _state(table) == {"a": 1, "b": 2}
    table.publish("audit")
    assert _state(table) == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_publish_conflicts_when_main_advanced(spark, table):
    table.merge(_mk(spark, [("c", 3, 12, "U")]), mode="mor", branch="audit")
    # a commit lands on main after the fork: the audited state is stale
    table.merge(_mk(spark, [("z", 9, 14, "U")]), mode="mor")
    with pytest.raises(CommitConflict, match="not an ancestor"):
        table.publish("audit")
    # nothing was published; the branch survives for re-fork/re-apply
    assert _state(table) == {"a": 1, "b": 2, "z": 9}
    assert "audit" in table.branches()


def test_abandoned_branch_never_leaks_into_main(spark, table):
    table.merge(_mk(spark, [("bad", -1, 12, "U")]), mode="mor", branch="audit")
    table.drop_branch("audit")
    assert table.branches() == {}
    # main never saw the batch, and later main commits are unaffected
    table.merge(_mk(spark, [("c", 3, 13, "U")]), mode="mor")
    assert _state(table) == {"a": 1, "b": 2, "c": 3}


def test_branch_commit_is_idempotent_per_batch(spark, table):
    s1 = table.merge(_mk(spark, [("c", 3, 12, "U")]), mode="mor",
                     app_id="app", batch_id=7, branch="audit")
    s2 = table.merge(_mk(spark, [("c", 999, 12, "U")]), mode="mor",
                     app_id="app", batch_id=7, branch="audit")
    assert s2["summary"]["skipped"] is True
    assert s2["snapshot_id"] == s1["snapshot_id"]
    table.publish("audit")
    assert _state(table)["c"] == 3
    # the txn high-water travels with the published snapshot (exactly-once
    # survives the publish)
    assert table.committed_batch("app") == 7


def test_snapshot_ids_unique_across_forks(spark, table):
    table.merge(_mk(spark, [("c", 3, 12, "U")]), mode="mor", branch="audit")
    table.merge(_mk(spark, [("d", 4, 13, "U")]), mode="mor")  # main fork
    table.add_column("extra", T.StringType())  # schema evolution on main
    sids = [s["snapshot_id"] for s in table.history()]
    assert len(sids) == len(set(sids))
    # both lineages intact
    assert _state(table, branch="audit") == {"a": 1, "b": 2, "c": 3}
    assert _state(table) == {"a": 1, "b": 2, "d": 4}


def test_expire_keeps_branch_head_and_publish_path(spark, table):
    table.merge(_mk(spark, [("c", 3, 12, "U")]), mode="mor", branch="audit")
    table.merge(_mk(spark, [("d", 4, 13, "U")]), mode="mor", branch="audit")
    # aggressive retention on main must not reclaim the branch lineage
    table.expire_snapshots(keep_last=1)
    assert _state(table, branch="audit") == {"a": 1, "b": 2, "c": 3, "d": 4}
    table.publish("audit")
    assert _state(table) == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_unknown_branch_read_raises(spark, table):
    with pytest.raises(KeyError, match="nope"):
        table.read(branch="nope")
    with pytest.raises(KeyError, match="nope"):
        table.publish("nope")


def test_replay_batch_stages_on_branch_then_publishes(spark, table):
    """The WAP pipeline at the replay-job level: a micro-batch lands on the
    audit branch, a validation query inspects it, publish exposes it."""
    from omicidx_etl_spark.cdc.replay import replay_batch

    ch = _mk(spark, [("c", 3, 12, "U"), ("a", 0, 13, "D")])
    replay_batch(table, ch, batch_id=0, app_id="wap", mode="mor",
                 branch="audit")
    assert _state(table) == {"a": 1, "b": 2}  # unaudited => invisible
    audit = _state(table, branch="audit")
    assert audit == {"b": 2, "c": 3}  # delete applied on the branch
    table.publish("audit")
    assert _state(table) == {"b": 2, "c": 3}
    # replaying the same batch after publish is the idempotent no-op
    snap = replay_batch(table, ch, batch_id=0, app_id="wap", mode="mor")
    assert snap["summary"]["skipped"] is True


def test_tags_are_immutable_named_snapshots(spark, table):
    sid = table.snapshot()["snapshot_id"]
    assert table.create_tag("v1") == sid
    table.merge(_mk(spark, [("z", 9, 14, "U")]), mode="mor")
    # the tag still reads the pinned state after later commits
    assert _state(table, tag="v1") == {"a": 1, "b": 2}
    assert table.tags() == {"v1": sid}
    with pytest.raises(ValueError, match="already exists"):
        table.create_tag("v1")
    with pytest.raises(KeyError, match="nope"):
        table.read(tag="nope")
    # names are one namespace: a tag can't shadow a branch or vice versa
    table.create_branch("audit2")
    with pytest.raises(ValueError, match="already a branch"):
        table.create_tag("audit2")
    with pytest.raises(ValueError, match="already a tag"):
        table.create_branch("v1")


def test_expire_keeps_tagged_snapshot(spark, table):
    table.create_tag("rel", at=table.snapshot()["snapshot_id"])
    for i in range(3):
        table.merge(_mk(spark, [(f"k{i}", i, 20 + i, "U")]), mode="cow")
    table.expire_snapshots(keep_last=1)
    # the tagged snapshot and its data survive aggressive retention
    assert _state(table, tag="rel") == {"a": 1, "b": 2}
    table.drop_tag("rel")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(KeyError):
        table.read(tag="rel")


def test_meta_refs_types(spark, table):
    table.create_tag("v1")
    table.merge(_mk(spark, [("c", 3, 12, "U")]), mode="mor", branch="audit")
    rows = {r["name"]: (r["snapshot_id"], r["type"])
            for r in table.meta_refs().collect()}
    assert rows["main"][1] == "main"
    assert rows["audit"][1] == "branch"
    assert rows["v1"][1] == "tag"


def test_create_branch_pins_time_travel_fork(spark, table):
    fork = table.snapshot()["snapshot_id"]
    table.create_branch("pinned")
    table.merge(_mk(spark, [("z", 9, 14, "U")]), mode="mor")
    # the explicit branch still reads the fork-time state
    assert _state(table, branch="pinned") == {"a": 1, "b": 2}
    assert table.branches()["pinned"] == fork
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("pinned")
