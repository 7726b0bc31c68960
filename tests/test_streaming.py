"""Structured Streaming replay tests: checkpointed exactly-once resume
(T1), rate-limited micro-batches (T4), crash-replay dedup."""

from __future__ import annotations

import duckdb

from omicidx_etl_spark import datagen
from omicidx_etl_spark.lake import LakeTable
from omicidx_etl_spark.streaming import stream_replay


def _mk_log(spark, path, n_events, n_docs, seed, files):
    ch = datagen.gen_changes(spark, n_events, n_docs, seed=seed)
    datagen.write_change_log(ch, path, files=files)
    return ch.drop("seq", "op", "event_ts").schema


def _oracle(log_path):
    return duckdb.sql(
        f"""
        SELECT doc_id, n_tok FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) rn
          FROM read_parquet('{log_path}/*.parquet', union_by_name=true)
        ) WHERE rn = 1 AND op <> 'D' ORDER BY doc_id
        """
    ).df()


def test_stream_replay_and_resume(spark, tmp_path):
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "t")
    schema = _mk_log(spark, log, 4000, 300, seed=21, files=4)
    table = LakeTable.create(spark, root, schema, key="doc_id", n_buckets=8)

    committed = stream_replay(
        spark, table, log, ckpt, max_files_per_trigger=2, app_id="s1"
    )
    assert len(committed) == 2  # 4 files / 2 per trigger
    got = table.read().select("doc_id", "n_tok").orderBy("doc_id").toPandas()
    exp = _oracle(log)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tok"].tolist() == exp["n_tok"].tolist()

    # no new files → restart is a no-op
    again = stream_replay(spark, table, log, ckpt, app_id="s1")
    assert again == []

    # append new change files → only they are processed on resume
    more = datagen.gen_changes(spark, 1000, 300, seed=22, full_prefix=False)
    more = more.withColumn("seq", more["seq"] + 4000)
    more.coalesce(1).write.mode("append").parquet(log)
    resumed = stream_replay(spark, table, log, ckpt, app_id="s1")
    assert len(resumed) == 1

    got2 = table.read().select("doc_id", "n_tok").orderBy("doc_id").toPandas()
    exp2 = _oracle(log)
    assert got2["doc_id"].tolist() == exp2["doc_id"].tolist()
    assert got2["n_tok"].tolist() == exp2["n_tok"].tolist()


def test_crash_between_merge_and_checkpoint(spark, tmp_path):
    """If the table commit lands but the checkpoint doesn't (crash between),
    the replayed batch must be skipped by the (app_id, batch_id) watermark."""
    log = str(tmp_path / "log")
    root = str(tmp_path / "t")
    schema = _mk_log(spark, log, 1000, 100, seed=23, files=2)
    table = LakeTable.create(spark, root, schema, key="doc_id", n_buckets=4)

    # first run with checkpoint A processes batch 0 (all files)
    stream_replay(spark, table, log, str(tmp_path / "ckptA"), app_id="s2")
    sid = table.snapshot()["snapshot_id"]
    n = table.read().count()

    # "crash": checkpoint lost entirely; restart from fresh checkpoint B.
    # The stream re-delivers batch 0 — the table watermark must no-op it.
    replayed = stream_replay(spark, table, log, str(tmp_path / "ckptB"), app_id="s2")
    assert all(s["summary"].get("skipped") for s in replayed)
    assert table.snapshot()["snapshot_id"] == sid
    assert table.read().count() == n
