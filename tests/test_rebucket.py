"""Bucket-layout evolution (LakeTable.rebucket): atomic re-cluster into a
new bucket count, state-preserving across tombstones/time-travel/changelog,
with spec_id guards so in-flight commits planned under the old layout
conflict out instead of stranding rows in wrong buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.lake import CommitConflict, LakeTable
from omicidx_etl_spark.lake.table import BUCKET_COL, bucket_expr

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
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=2)
    t.merge(
        _mk(spark, [(f"d{i}", i, 10 + i, "U") for i in range(20)] + [("dead", 0, 99, "D")]),
        mode="mor",
    )
    return t


def test_rebucket_preserves_state_and_layout_works(spark, table):
    before = _state(table)
    snap = table.rebucket(8)
    assert snap["summary"]["operation"] == "rebucket"
    assert table.n_buckets == 8
    assert _state(table) == before
    # physical layout really is 8-way: the new snapshot's entries cover
    # buckets the 2-way layout never had
    dirs = {int(b) for b, e in snap["buckets"].items() if e["base"]}
    assert max(dirs) > 1
    # subsequent writes land in the new layout and reconcile correctly
    table.merge(_mk(spark, [("d3", 333, 100, "U")]), mode="mor")
    assert _state(table)["d3"] == 333
    # point lookup uses the new bucket transform
    assert table.lookup(["d5"]).collect()[0]["n_tok"] == 5


def test_rebucket_keeps_tombstones_effective(spark, table):
    table.rebucket(8)
    assert "dead" not in _state(table)
    # a LATE event older than the tombstone still cannot resurrect the key
    table.merge(_mk(spark, [("dead", 7, 50, "U")]), mode="mor")
    assert "dead" not in _state(table)


def test_rebucket_time_travel_and_changelog(spark, table):
    pre = table.snapshot()["snapshot_id"]
    before = _state(table)
    snap = table.rebucket(4)
    # pinned readers still see (and can scan) the old layout
    assert _state(table, as_of=pre) == before
    # the rewrite carries only pre-existing seqs -> no phantom changes
    assert table.changes(pre, snap["snapshot_id"]).count() == 0


def test_rebucket_shrink(spark, table):
    before = _state(table)
    table.rebucket(1)
    assert table.n_buckets == 1
    assert _state(table) == before


def test_same_count_is_noop_and_bad_count_raises(spark, table):
    sid = table.snapshot()["snapshot_id"]
    assert table.rebucket(2)["snapshot_id"] == sid
    with pytest.raises(ValueError):
        table.rebucket(0)


def test_inflight_mor_merge_conflicts_with_rebucket(spark, tmp_path):
    """A merge that planned bucket placements under the old layout must
    NOT rebase onto a rebucketed snapshot — its delta files would sit in
    buckets their keys no longer hash to."""
    from tests.test_concurrency import _stale_once

    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=2)
    t1.merge(_mk(spark, [("a", 1, 10, "U")]), mode="mor")
    t2 = LakeTable.load(spark, root)

    _stale_once(t2)
    t1.rebucket(8)  # wins the race while t2's merge is in flight
    with pytest.raises(CommitConflict, match="layout changed"):
        t2.merge(_mk(spark, [("b", 2, 11, "U")]), mode="mor")
    # the loser's staged files are orphans; state is the rebucketed one
    assert _state(t1) == {"a": 1}


def test_spec_id_increments(spark, table):
    assert table.snapshot()["table"].get("spec_id", 0) == 0
    table.rebucket(4)
    assert table.snapshot()["table"]["spec_id"] == 1
    table.rebucket(16)
    assert table.snapshot()["table"]["spec_id"] == 2
