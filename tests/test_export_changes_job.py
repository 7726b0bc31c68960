"""jobs/export_changes_job.py: CDC out-feed — versioned NDJSON.gz drops
with done-markers, exactly-once per interval."""

from __future__ import annotations

import json
import os

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest
from omicidx_etl_spark.lake import LakeTable


def _run(monkeypatch, capsys, argv):
    import jobs.export_changes_job as EJ

    monkeypatch.setattr("sys.argv", ["export_changes_job.py", *argv])
    rc = EJ.main()
    out = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    return rc, out[-1]


def test_export_changes_end_to_end(spark, tmp_path, monkeypatch, capsys):
    src_root = str(tmp_path / "src")
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "offsets")
    ch = datagen.gen_changes(spark, 1500, 150, seed=4)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)
    src.merge(dedup_latest(ch.filter("seq < 700").drop("event_ts")))

    argv = ["--src", src_root, "--out", feed, "--checkpoint", ckpt]
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out["applied"] and out["rows"] > 0
    drop = out["dir"]
    assert os.path.exists(os.path.join(drop, "_DONE"))
    marker = json.load(open(os.path.join(drop, "_DONE")))
    assert marker["rows"] == out["rows"]
    # drop contents match the table state keyed rows (first interval =
    # everything), with _change_type/_seq attached
    feed_df = spark.read.json(drop)
    assert set(feed_df.columns) >= {"doc_id", "_change_type", "_seq"}
    upserts = feed_df.filter("_change_type = 'upsert'").count()
    assert upserts == src.read().count()

    # caught up: second run exports nothing and creates no new dir
    dirs_before = set(os.listdir(feed))
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out["applied"] is False
    assert set(os.listdir(feed)) == dirs_before

    # new interval: incremental drop with only the delta keys
    src.merge(dedup_latest(ch.filter("seq >= 700").drop("event_ts")))
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out["applied"]
    inc = spark.read.json(out["dir"])
    touched = ch.filter("seq >= 700").select("doc_id").distinct().count()
    assert inc.count() == touched  # net per-key: one row per touched key
    assert os.path.exists(os.path.join(out["dir"], "_DONE"))


def test_feed_round_trip_apply(spark, tmp_path, monkeypatch, capsys):
    """Cross-system replication over files: export src's changelog to a
    feed dir, apply_feed into a fresh table on 'the other cluster' —
    replica equals source; re-apply skips every drop; an unmarked
    (in-flight) drop dir is ignored."""
    from omicidx_etl_spark.cdc import apply_feed

    src_root = str(tmp_path / "s2")
    feed = str(tmp_path / "feed2")
    ckpt = str(tmp_path / "off2")
    ch = datagen.gen_changes(spark, 1200, 120, seed=6)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)
    src.merge(dedup_latest(ch.filter("seq < 600").drop("event_ts")))
    argv = ["--src", src_root, "--out", feed, "--checkpoint", ckpt]
    _run(monkeypatch, capsys, argv)
    src.merge(dedup_latest(ch.filter("seq >= 600").drop("event_ts")))
    _run(monkeypatch, capsys, argv)  # two drops now

    dst = LakeTable.create(
        spark, str(tmp_path / "d2"), schema, key="doc_id", n_buckets=8
    )
    # an in-flight (unmarked) dir must be ignored
    os.makedirs(os.path.join(feed, "interval-999-1000"))
    out = apply_feed(dst, feed)
    assert [r["applied"] for r in out] == [True, True]
    a = sorted((r["doc_id"], r["n_tok"]) for r in src.read().collect())
    b = sorted((r["doc_id"], r["n_tok"]) for r in dst.read().collect())
    assert a == b and a
    # exactly-once: re-apply skips both drops, table unchanged
    sid = dst.snapshot()["snapshot_id"]
    out = apply_feed(dst, feed)
    assert [r["applied"] for r in out] == [False, False]
    assert dst.snapshot()["snapshot_id"] == sid


def test_feed_deletes_only_drop_applies(spark, tmp_path, monkeypatch, capsys):
    """A drop containing ONLY deletes (all-null payload) must apply —
    the explicit read schema prevents null-column inference breaking the
    merge casts."""
    from omicidx_etl_spark.cdc import apply_feed

    src_root = str(tmp_path / "s3")
    feed = str(tmp_path / "feed3")
    ckpt = str(tmp_path / "off3")
    ch = datagen.gen_changes(spark, 600, 60, seed=8)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)
    src.merge(dedup_latest(ch.filter("op <> 'D'").drop("event_ts")))
    argv = ["--src", src_root, "--out", feed, "--checkpoint", ckpt]
    _run(monkeypatch, capsys, argv)
    victim = src.read().select("doc_id").first()["doc_id"]
    src.merge(
        dedup_latest(
            spark.createDataFrame(
                [(10_000, "D", victim, None, None, None)],
                "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
            )
        )
    )
    _run(monkeypatch, capsys, argv)  # deletes-only drop
    dst = LakeTable.create(
        spark, str(tmp_path / "d3"), schema, key="doc_id", n_buckets=4
    )
    apply_feed(dst, feed)
    assert dst.read().filter(f"doc_id = '{victim}'").count() == 0
    a = sorted(r["doc_id"] for r in src.read().collect())
    b = sorted(r["doc_id"] for r in dst.read().collect())
    assert a == b


def test_feed_gap_raises_instead_of_silent_skip(spark, tmp_path):
    """A misordered file transfer can deliver interval-5-8 before
    interval-begin-5 ('b' sorts after '5'); the high-water txn watermark
    would then skip the begin drop FOREVER. apply_feed must refuse to
    create the hole: an incremental drop whose from_sid is not covered by
    what this consumer has applied raises instead of applying."""
    import pytest

    from omicidx_etl_spark.cdc import apply_feed

    src_root = str(tmp_path / "s4")
    feed = str(tmp_path / "feed4")
    ch = datagen.gen_changes(spark, 900, 90, seed=11)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)
    src.merge(dedup_latest(ch.filter("seq < 450").drop("event_ts")))
    s1 = src.snapshot()["snapshot_id"]
    src.merge(dedup_latest(ch.filter("seq >= 450").drop("event_ts")))
    s2 = src.snapshot()["snapshot_id"]

    # simulate the partial transfer: ONLY the incremental drop arrived
    from omicidx_etl_spark.sources.io import write_ndjson_gz

    inc, frm, to = src.changes(s1, include_seq=True), s1, s2
    drop = os.path.join(feed, f"interval-{frm}-{to}")
    write_ndjson_gz(inc, drop)
    with open(os.path.join(drop, "_DONE"), "w") as f:
        f.write(json.dumps({"from_sid": frm, "to_sid": to}))

    dst = LakeTable.create(
        spark, str(tmp_path / "d4"), schema, key="doc_id", n_buckets=4
    )
    with pytest.raises(ValueError, match="feed gap"):
        apply_feed(dst, feed)
    # nothing committed
    assert dst.read().count() == 0

    # the missing begin drop arrives (exported via a fresh subscription)
    from omicidx_etl_spark.cdc import ChangelogSubscription

    sub = ChangelogSubscription(src, str(tmp_path / "off4"), consumer_id="gap")
    bdf, bfrm, bto = sub.poll()  # full bootstrap (from table birth)
    assert bfrm in (None, 0) and bto == s2
    bname = f"interval-{'begin' if bfrm is None else bfrm}-{bto}"
    bdrop = os.path.join(feed, bname)
    write_ndjson_gz(bdf, bdrop)
    with open(os.path.join(bdrop, "_DONE"), "w") as f:
        f.write(json.dumps({"from_sid": bfrm, "to_sid": bto}))
    out = apply_feed(dst, feed)
    # the bootstrap drop (self-contained) applies first at the tied
    # to_sid; the s1->s2 drop is then below the watermark and skips as
    # already-covered
    by_dir = {os.path.basename(r["dir"]): r["applied"] for r in out}
    assert by_dir[bname] is True
    assert by_dir[f"interval-{frm}-{to}"] is False
    a = sorted((r["doc_id"], r["n_tok"]) for r in src.read().collect())
    b = sorted((r["doc_id"], r["n_tok"]) for r in dst.read().collect())
    assert a == b and a


def test_zero_row_interval_exports_and_applies(spark, tmp_path, monkeypatch, capsys):
    """A metadata-only commit (add_constraint) advances the snapshot but
    nets zero changelog rows. The export job must not crash on JSON
    inference over the empty drop (counts the polled frame directly), the
    drop still lands (contiguity: consumers validate from_sid), and
    apply_feed applies the empty drop as a watermark-advancing no-op."""
    from omicidx_etl_spark.cdc import apply_feed

    src_root = str(tmp_path / "s5")
    feed = str(tmp_path / "feed5")
    ckpt = str(tmp_path / "off5")
    ch = datagen.gen_changes(spark, 600, 60, seed=13)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)
    src.merge(dedup_latest(ch.drop("event_ts")))
    argv = ["--src", src_root, "--out", feed, "--checkpoint", ckpt]
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out["rows"] > 0

    src.add_constraint("nn", "n_tok >= 0")  # metadata-only interval
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out["applied"] and out["rows"] == 0
    assert os.path.exists(os.path.join(out["dir"], "_DONE"))

    # rerun: caught up, no crash, no new dir
    dirs_before = set(os.listdir(feed))
    rc, out = _run(monkeypatch, capsys, argv)
    assert rc == 0 and out["applied"] is False
    assert set(os.listdir(feed)) == dirs_before

    dst = LakeTable.create(
        spark, str(tmp_path / "d5"), schema, key="doc_id", n_buckets=4
    )
    res = apply_feed(dst, feed)
    assert [r["applied"] for r in res] == [True, True]
    a = sorted(r["doc_id"] for r in src.read().collect())
    b = sorted(r["doc_id"] for r in dst.read().collect())
    assert a == b


def test_bootstrap_over_stale_consumer_removes_ghost_rows(spark, tmp_path):
    """ADVICE r5 (medium): a full-state bootstrap drop applied over a
    consumer that already holds OLDER state (re-subscription after a lost
    incremental drop) must behave as snapshot-REPLACE: keys deleted
    upstream between the consumer's watermark and the bootstrap sid must
    not survive as ghost rows. A later legitimate re-insert (source seq
    above the upstream delete seq) must still win over the synthesized
    tombstone."""
    from omicidx_etl_spark.cdc import apply_feed
    from omicidx_etl_spark.sources.io import write_ndjson_gz
    from pyspark.sql import functions as F

    src_root = str(tmp_path / "s5")
    feed = str(tmp_path / "feed5")
    ch = datagen.gen_changes(spark, 900, 60, seed=13)
    schema = ch.drop("seq", "op", "event_ts").schema
    src = LakeTable.create(spark, src_root, schema, key="doc_id", n_buckets=4)

    def bootstrap_df():
        live = src.read(include_system=True)
        return live.select(
            *[f.name for f in schema.fields],
            F.lit("upsert").alias("_change_type"),
            F.col("__seq").alias("_seq"),
        )

    def write_drop(df, name, frm, to):
        drop = os.path.join(feed, name)
        write_ndjson_gz(df, drop)
        with open(os.path.join(drop, "_DONE"), "w") as f:
            f.write(json.dumps({"from_sid": frm, "to_sid": to}))

    # epoch 1: consumer bootstraps from the first snapshot
    src.merge(dedup_latest(ch.filter("seq < 450").drop("event_ts")))
    s1 = src.snapshot()["snapshot_id"]
    write_drop(bootstrap_df(), f"interval-begin-{s1}", None, s1)
    dst = LakeTable.create(
        spark, str(tmp_path / "d5"), schema, key="doc_id", n_buckets=8
    )
    assert [r["applied"] for r in apply_feed(dst, feed)] == [True]

    # upstream: delete one live key and update the rest; the incremental
    # drop for this interval is LOST — only a fresh bootstrap arrives
    victim = src.read().select("doc_id").first()["doc_id"]
    upd = dedup_latest(ch.filter("seq >= 450").drop("event_ts"))
    kill = upd.limit(0).unionByName(
        spark.createDataFrame(
            [(victim,)], "doc_id string"
        ).select(
            F.lit(901).cast("long").alias("seq"),
            F.lit("D").alias("op"),
            "doc_id",
            F.lit(None).cast("array<int>").alias("tokens"),
            F.lit(None).cast("int").alias("n_tok"),
            F.lit(None).cast("string").alias("source"),
        )
    )
    src.merge(dedup_latest(upd.filter(F.col("doc_id") != victim).unionByName(kill)))
    s2 = src.snapshot()["snapshot_id"]
    write_drop(bootstrap_df(), f"interval-begin-{s2}", None, s2)

    out = apply_feed(dst, feed)
    assert [r["applied"] for r in out] == [False, True]
    assert dst.read().filter(F.col("doc_id") == victim).count() == 0  # no ghost
    a = sorted((r["doc_id"], r["n_tok"]) for r in src.read().collect())
    b = sorted((r["doc_id"], r["n_tok"]) for r in dst.read().collect())
    assert a == b and a

    # re-insert the victim upstream at a higher source seq; incremental
    # drop must beat the synthesized tombstone on the consumer
    reins = kill.select(
        F.lit(950).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        "doc_id",
        F.expr("array(1,2,3)").alias("tokens"),
        F.lit(3).alias("n_tok"),
        F.lit("reins").alias("source"),
    )
    src.merge(reins)
    s3 = src.snapshot()["snapshot_id"]
    write_drop(
        reins.select(
            "doc_id", "tokens", "n_tok", "source",
            F.lit("upsert").alias("_change_type"),
            F.col("seq").alias("_seq"),
        ),
        f"interval-{s2}-{s3}", s2, s3,
    )
    out = apply_feed(dst, feed)
    assert out[-1]["applied"] is True
    assert dst.read().filter(F.col("doc_id") == victim).count() == 1
