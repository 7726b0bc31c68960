"""Optimistic-concurrency commit protocol: concurrent writers must never
silently lose a commit (the pre-OCC pointer swap was last-writer-wins).
Merge-on-read delta appends rebase automatically; overlapping rewrites
raise CommitConflict; disjoint rewrites rebase; exactly-once batch guards
hold across rebases."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.lake import CommitConflict, LakeTable
from omicidx_etl_spark.lake.table import bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
    ]
)

CH_SCHEMA = "doc_id string, n_tok int, seq long, op string"


def _mk(spark, rows):
    return spark.createDataFrame(rows, CH_SCHEMA)


def _ids_for_buckets(spark, n_buckets, want):
    """Pick doc_ids that land in specific buckets of the table transform."""
    cand = spark.range(0, 500).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id")
    )
    rows = cand.withColumn("b", bucket_expr("doc_id", n_buckets)).collect()
    out = {}
    for r in rows:
        if r["b"] in want and r["b"] not in out:
            out[r["b"]] = r["doc_id"]
    assert set(out) == set(want)
    return out


def _stale_once(table):
    """Make the NEXT snapshot() call on ``table`` return the current
    snapshot even after another writer commits — simulating the race where
    an operation plans against a snapshot that goes stale before its
    commit. _commit's own validate read (under the lock) sees the truth."""
    stale = table.snapshot()
    real = table.snapshot
    state = {"used": False}

    def fake():
        if not state["used"]:
            state["used"] = True
            return dict(stale)
        return real()

    table.snapshot = fake
    return stale


def test_mor_append_rebases_onto_concurrent_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    t2 = LakeTable.load(spark, root)

    stale = _stale_once(t2)
    # t1 wins the race while t2's merge is "in flight"
    t1.merge(_mk(spark, [("a", 1, 10, "U")]), mode="mor")
    snap = t2.merge(_mk(spark, [("b", 2, 11, "U")]), mode="mor")

    assert snap["summary"]["rebased_from"] == stale["snapshot_id"]
    got = {
        r["doc_id"]: r["n_tok"]
        for r in t1.read().select("doc_id", "n_tok").collect()
    }
    assert got == {"a": 1, "b": 2}  # NEITHER commit was lost
    parents = [s["parent_id"] for s in t1.history() if s["parent_id"] is not None]
    assert len(parents) == len(set(parents))  # linear history, no fork


def test_cow_overlapping_rewrite_conflicts(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    t2 = LakeTable.load(spark, root)

    _stale_once(t2)
    t1.merge(_mk(spark, [("x", 1, 10, "U")]), mode="cow")
    with pytest.raises(CommitConflict, match="bucket"):
        # same key -> same bucket -> t2's rewrite was computed from a state
        # that no longer exists; adopting it would drop t1's row
        t2.merge(_mk(spark, [("x", 99, 5, "U")]), mode="cow")

    got = t1.read().select("doc_id", "n_tok").collect()
    assert [(r["doc_id"], r["n_tok"]) for r in got] == [("x", 1)]


def test_cow_disjoint_rewrite_rebases(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    t2 = LakeTable.load(spark, root)
    ids = _ids_for_buckets(spark, 4, {0, 1})

    _stale_once(t2)
    t1.merge(_mk(spark, [(ids[0], 1, 10, "U")]), mode="cow")
    snap = t2.merge(_mk(spark, [(ids[1], 2, 11, "U")]), mode="cow")

    assert snap["summary"]["rebased_from"] >= 0
    got = {
        r["doc_id"]: r["n_tok"]
        for r in t1.read().select("doc_id", "n_tok").collect()
    }
    assert got == {ids[0]: 1, ids[1]: 2}


def test_compact_conflicts_with_concurrent_delta(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    t1.merge(_mk(spark, [("x", 1, 10, "U")]), mode="mor")
    t2 = LakeTable.load(spark, root)

    _stale_once(t2)
    # a delta lands on x's bucket while t2's compaction of that bucket is
    # in flight: folding the stale read would lose seq=11
    t1.merge(_mk(spark, [("x", 2, 11, "U")]), mode="mor")
    with pytest.raises(CommitConflict, match="bucket"):
        t2.compact()

    rows = t1.read().select("doc_id", "n_tok").collect()
    assert [(r["doc_id"], r["n_tok"]) for r in rows] == [("x", 2)]
    t1.compact()  # fresh attempt sees both deltas and succeeds
    rows = t1.read().select("doc_id", "n_tok").collect()
    assert [(r["doc_id"], r["n_tok"]) for r in rows] == [("x", 2)]


def test_exactly_once_guard_survives_rebase_race(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    t2 = LakeTable.load(spark, root)

    _stale_once(t2)
    t1.merge(_mk(spark, [("a", 1, 10, "U")]), mode="mor", app_id="s", batch_id=0)
    # redelivery of the SAME batch planned against a stale snapshot must be
    # recognized as already-committed at validate time, not re-applied
    snap = t2.merge(
        _mk(spark, [("a", 1, 10, "U")]), mode="mor", app_id="s", batch_id=0
    )
    assert snap["summary"]["skipped"] is True
    assert t1.read().count() == 1


def test_schema_evolution_conflict_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    t2 = LakeTable.load(spark, root)

    _stale_once(t2)
    t1.merge(_mk(spark, [("a", 1, 10, "U")]), mode="mor")
    with pytest.raises(CommitConflict):
        t2.add_column("extra", T.StringType())
    t1.add_column("extra", T.StringType())  # retry on fresh snapshot works
    assert "extra" in [f.name for f in t1.current_schema().fields]


def test_threaded_mor_writers_all_commit(spark, tmp_path):
    """Real concurrent writers (threads + flock): every merge must land and
    the final state must equal last-seq-wins over the union of batches."""
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, SCHEMA, key="doc_id", n_buckets=4)
    n_writers = 4
    errs = []
    barrier = threading.Barrier(n_writers)

    def work(w):
        try:
            t = LakeTable.load(spark, root)
            rows = [(f"doc{w}_{i}", w, 100 + w, "U") for i in range(5)]
            rows.append(("shared", w, 100 + w, "U"))  # contended key
            barrier.wait()
            t.merge(_mk(spark, rows), mode="mor", app_id=f"w{w}", batch_id=0)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=work, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []

    t = LakeTable.load(spark, root)
    merges = [s for s in t.history() if s["summary"].get("operation") == "merge"]
    assert len(merges) == n_writers
    got = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    assert len(got) == n_writers * 5 + 1
    assert got["shared"] == n_writers - 1  # highest seq wins on the hot key
