"""jobs/replicate_job.py: one-shot changelog-replication CLI — bootstrap
creates the replica, successive runs drain exactly the new interval."""

from __future__ import annotations

import json

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest
from omicidx_etl_spark.lake import LakeTable


def _run(monkeypatch, capsys, argv):
    import jobs.replicate_job as RJ

    monkeypatch.setattr("sys.argv", ["replicate_job.py", *argv])
    rc = RJ.main()
    out = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    return rc, out


def test_replicate_job_end_to_end(spark, tmp_path, monkeypatch, capsys):
    src_root = str(tmp_path / "src")
    dst_root = str(tmp_path / "dst")
    ckpt = str(tmp_path / "offsets")
    ch = datagen.gen_changes(spark, 2000, 200, seed=3)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)
    src.merge(dedup_latest(ch.filter("seq < 1000").drop("event_ts")))

    argv = [
        "--src", src_root, "--dst", dst_root, "--checkpoint", ckpt,
        "--create-dst", "--mode", "mor", "--verify-count",
    ]
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out[-1]["applied"]
    dst = LakeTable.load(spark, dst_root)
    a = sorted((r["doc_id"], r["n_tok"]) for r in src.read().collect())
    b = sorted((r["doc_id"], r["n_tok"]) for r in dst.read().collect())
    assert a == b and len(a) > 0

    # second run with no new source commits: applied=False, replica stable
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out[-1]["applied"] is False

    # new interval (updates + deletes) drains incrementally
    src.merge(dedup_latest(ch.filter("seq >= 1000").drop("event_ts")))
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out[-1]["applied"]
    a = sorted((r["doc_id"], r["n_tok"]) for r in src.read().collect())
    b = sorted((r["doc_id"], r["n_tok"]) for r in dst.read().collect())
    assert a == b
    assert out[-1]["rows_replica"] == len(b)
