"""In-place corpus canonicalization (cdc/canonicalize.py): duplicate
clusters → tombstone deletes through LakeTable.merge, with exactly-once /
re-insert / time-travel semantics intact."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.cdc import canonicalize
from omicidx_etl_spark.cdc.canonicalize import token_shingles
from omicidx_etl_spark.lake import LakeTable


def _schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )


def _table(spark, tmp_path, rows):
    t = LakeTable.create(
        spark, str(tmp_path / "corpus"), _schema(), key="doc_id", n_buckets=4
    )
    ch = spark.createDataFrame(
        [(i, "U", d, toks, len(toks), "web") for i, (d, toks) in enumerate(rows)],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t.merge(ch, app_id="seed", batch_id=0, mode="mor")
    return t


def test_token_shingles_guard(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4],), ([7, 8],), ([],), (None,)], "toks array<int>"
    )
    got = [r[0] for r in df.select(token_shingles(F.col("toks"), 3)).collect()]
    assert got[0] == ["1|2|3", "2|3|4"]
    assert got[1] == [] and got[2] == [] and got[3] == []


def test_exact_canonicalize_keeps_min_key(spark, tmp_path):
    t = _table(
        spark,
        tmp_path,
        [
            ("d1", [1, 2, 3]),
            ("d2", [1, 2, 3]),       # exact dup of d1
            ("d3", [9, 9, 9]),
            ("d4", [9, 9, 9]),       # exact dup of d3
            ("d5", [5]),             # unique
        ],
    )
    res = canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert res["deleted"] == 2 and res["clusters"] == 2
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["d1", "d3", "d5"]


def test_minhash_canonicalize_transitive(spark, tmp_path):
    base = list(range(100))
    near_a = base[:-1] + [999]        # ~2 shingles differ from base
    near_b = [888] + base[1:]         # ~2 shingles differ from base, 4 from near_a
    t = _table(
        spark,
        tmp_path,
        [
            ("d1", base),
            ("d2", near_a),
            ("d3", near_b),
            ("d4", [7, 7]),           # shorter than n → no shingles → survives
            ("d5", list(range(500, 560))),  # unrelated → survives
        ],
    )
    res = canonicalize(t, method="minhash", n=3, k=8, bands=4, app_id="c", batch_id=0)
    survivors = sorted(r["doc_id"] for r in t.read().collect())
    # d1/d2/d3 form one cluster (d2~d1 and d3~d1 at least; closure collapses
    # all three even if (d2, d3) was never a candidate pair)
    assert survivors == ["d1", "d4", "d5"]
    assert res["deleted"] == 2 and res["clusters"] == 1


def test_canonicalize_idempotent_and_reinsertable(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", [1, 2, 3]), ("b", [1, 2, 3])])
    res1 = canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert res1["deleted"] == 1
    # same (app_id, batch_id) → exactly-once skip, no new commit
    res2 = canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert res2["commit"]["summary"].get("skipped") is True
    # a NEW batch finds nothing left to delete
    res3 = canonicalize(t, method="exact", app_id="c", batch_id=1)
    assert res3["deleted"] == 0
    # a later genuine change event (higher seq) re-inserts the deleted key
    seq = t.snapshot()["seq_ceiling"] + 1
    ch = spark.createDataFrame(
        [(seq, "U", "b", [4, 5], 2, "web")],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t.merge(ch, app_id="seed", batch_id=1, mode="mor")
    rows = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert rows == {"a": [1, 2, 3], "b": [4, 5]}


def test_canonicalize_time_travel_sees_pre_delete_state(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", [1, 2, 3]), ("b", [1, 2, 3])])
    sid = t.snapshot()["snapshot_id"]
    canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert t.read().count() == 1
    assert t.read(as_of=sid).count() == 2
    # the canonicalize commit is self-describing in history
    ops = [h["summary"].get("operation") for h in t.history()]
    assert "canonicalize" in ops


def _merge(t, rows, seq0, app, bid):
    spark = t.spark
    ch = spark.createDataFrame(
        [(seq0 + i, op, d, toks, len(toks or []), "web")
         for i, (op, d, toks) in enumerate(rows)],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t.merge(ch, app_id=app, batch_id=bid, mode="mor")


def test_incremental_canonicalize_end_to_end(spark, tmp_path):
    from omicidx_etl_spark.cdc import (
        build_sig_index, canonicalize_incremental, create_sig_index,
    )

    base = list(range(60))
    t = _table(spark, tmp_path, [("a", base), ("b", [7] * 30), ("c", [9] * 30)])
    idx = create_sig_index(spark, str(tmp_path / "sigs"), t)
    build_sig_index(t, idx)
    assert sorted(r["doc_id"] for r in idx.read().collect()) == ["a", "b", "c"]
    sid0 = t.snapshot()["snapshot_id"]

    # batch: d is a near-dup of a (never re-shingles a — matches via index);
    # e is unique
    _merge(t, [("U", "d", base[:-1] + [999]), ("U", "e", list(range(500, 560)))],
           seq0=100, app="feed", bid=1)
    res = canonicalize_incremental(t, idx, sid0, app_id="ci", batch_id=0)
    assert res["deleted"] == 1
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "b", "c", "e"]
    # index in sync: survivors only among batch docs; loser d absent
    assert sorted(r["doc_id"] for r in idx.read().collect()) == ["a", "b", "c", "e"]
    # exactly-once: rerun with the same ids is a no-op on both tables
    res2 = canonicalize_incremental(t, idx, sid0, app_id="ci", batch_id=0)
    assert res2["commit"]["summary"].get("skipped") is True
    assert res2["index_commit"]["summary"].get("skipped") is True
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "b", "c", "e"]


def test_incremental_stale_ghost_never_canonical(spark, tmp_path):
    """A signature row whose doc is no longer live (crash between corpus
    and index commits) must not become a cluster canonical — that would
    delete live docs in favor of a ghost."""
    from omicidx_etl_spark.cdc import (
        build_sig_index, canonicalize_incremental, create_sig_index,
    )

    base = list(range(60))
    # the ghost sorts FIRST ('0-ghost' < 'm') so a missing live-filter
    # would elect it canonical and delete every live member
    t = _table(spark, tmp_path, [("m", base), ("0-ghost", base)])
    idx = create_sig_index(spark, str(tmp_path / "sigs"), t)
    build_sig_index(t, idx)
    # simulate the crash window: ghost deleted from the corpus, index stale
    _merge(t, [("D", "0-ghost", None)], seq0=50, app="fix", bid=0)
    sid0 = t.snapshot()["snapshot_id"]

    _merge(t, [("U", "y", base[:-1] + [999])], seq0=100, app="feed", bid=1)
    res = canonicalize_incremental(t, idx, sid0, app_id="ci", batch_id=0)
    # cluster {y, m} with canonical m — the ghost was filtered out
    assert res["deleted"] == 1
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["m"]


def test_incremental_interval_delete_drops_index_row(spark, tmp_path):
    from omicidx_etl_spark.cdc import (
        build_sig_index, canonicalize_incremental, create_sig_index,
    )

    content = [7] * 40
    t = _table(spark, tmp_path, [("a", list(range(60))), ("b", content)])
    idx = create_sig_index(spark, str(tmp_path / "sigs"), t)
    build_sig_index(t, idx)
    sid0 = t.snapshot()["snapshot_id"]

    _merge(t, [("D", "b", None)], seq0=100, app="feed", bid=1)
    res = canonicalize_incremental(t, idx, sid0, app_id="ci", batch_id=0)
    assert res["deleted"] == 0
    assert sorted(r["doc_id"] for r in idx.read().collect()) == ["a"]
    sid1 = t.snapshot()["snapshot_id"]
    # b's content re-arrives under a new id: nothing to match — it survives
    _merge(t, [("U", "c", content)], seq0=200, app="feed", bid=2)
    res = canonicalize_incremental(t, idx, sid1, app_id="ci", batch_id=1)
    assert res["deleted"] == 0
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "c"]


def test_incremental_update_uses_fresh_signature(spark, tmp_path):
    """An updated doc's OLD index signature must not create edges: the
    batch carries its new content, and its stale index row is excluded."""
    from omicidx_etl_spark.cdc import (
        build_sig_index, canonicalize_incremental, create_sig_index,
    )

    old = list(range(60))
    t = _table(spark, tmp_path, [("a", old)])
    idx = create_sig_index(spark, str(tmp_path / "sigs"), t)
    build_sig_index(t, idx)
    sid0 = t.snapshot()["snapshot_id"]

    # a's content changes completely; w arrives with a's OLD content
    _merge(t, [("U", "a", list(range(900, 960))), ("U", "w", old)],
           seq0=100, app="feed", bid=1)
    res = canonicalize_incremental(t, idx, sid0, app_id="ci", batch_id=0)
    assert res["deleted"] == 0
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "w"]


def test_replay_with_inflight_canonicalize(spark, tmp_path):
    """replay_log(canonicalize_every=1): a batch that lands an exact dup
    is deduped in-flight, and kill/resume never double-runs the dedup
    commit (batch-id-keyed idempotency)."""
    from omicidx_etl_spark.cdc import replay_log

    base = [1, 2, 3, 4, 5]
    rows = [
        (1, "U", "a", base), (2, "U", "b", [9] * 5),        # batch 0
        (11, "U", "c", base),                                 # batch 1: dup of a
    ]
    log = str(tmp_path / "log")
    spark.createDataFrame(
        [(s, op, d, tk, len(tk), "web") for s, op, d, tk in rows],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    ).coalesce(1).write.parquet(log)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), _schema(), key="doc_id", n_buckets=4
    )
    replay_log(spark, t, log, chunk_events=10, mode="mor",
               canonicalize_every=1)
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "b"]
    # resume from scratch state: everything (replay + canonicalize commits)
    # is watermarked, so a rerun is a full no-op
    before = t.snapshot()["snapshot_id"]
    replay_log(spark, t, log, chunk_events=10, mode="mor",
               canonicalize_every=1)
    assert t.snapshot()["snapshot_id"] == before
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "b"]
