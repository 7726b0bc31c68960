"""jobs/maintain_job.py: one-shot compaction + tombstone retention +
snapshot expiry CLI — contents invariant, deltas folded, history trimmed."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest
from omicidx_etl_spark.lake import LakeTable


def test_maintain_job_end_to_end(spark, tmp_path, monkeypatch, capsys):
    root = str(tmp_path / "t")
    ch = datagen.gen_changes(spark, 4000, 400, seed=7)
    schema = ch.drop("seq", "op", "event_ts").schema
    t = LakeTable.create(spark, root, schema, key="doc_id", n_buckets=8)
    # two MOR batches + a delete so there are deltas AND tombstones
    t.merge(dedup_latest(ch.filter("seq < 2000").drop("event_ts")))
    t.merge(dedup_latest(ch.filter("seq >= 2000").drop("event_ts")))
    victim = t.read().select("doc_id").first()["doc_id"]
    t.delete_where([("doc_id", "=", victim)])

    before = sorted(
        (r["doc_id"], r["n_tok"]) for r in t.read().select("doc_id", "n_tok").collect()
    )
    snap = t.snapshot()
    assert any(
        (e.get("deltas") if isinstance(e, dict) else None)
        for e in snap["buckets"].values()
    )
    max_seq = int(
        t.read(include_deleted=True, include_system=True)
        .agg(F.max("__seq"))
        .first()[0]
    )

    import jobs.maintain_job as MJ

    monkeypatch.setattr(
        "sys.argv",
        [
            "maintain_job.py",
            "--table", root,
            "--compact-group", "4",
            "--purge-before-seq", str(max_seq + 1),
            "--keep-last", "2",
            "--orphan-grace-s", "0",
            "--build-blooms",
            "--fsck", "deep",
        ],
    )
    MJ.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted_buckets"] > 0
    assert out["rows_after"] == len(before)
    assert out["blooms"]["built"] > 0
    assert out["fsck"]["ok"] and out["fsck"]["errors"] == 0

    t2 = LakeTable.load(spark, root)
    after = sorted(
        (r["doc_id"], r["n_tok"]) for r in t2.read().select("doc_id", "n_tok").collect()
    )
    assert after == before
    # deltas folded, tombstones purged
    snap2 = t2.snapshot()
    assert not any(
        (e.get("deltas") if isinstance(e, dict) else None)
        for e in snap2["buckets"].values()
    )
    assert (
        t2.read(include_deleted=True).count() == t2.read().count()
    )  # no tombstone rows remain
    # history trimmed to keep_last
    assert len(t2.history()) <= 2 + 1  # keep_last + the purge commit margin
