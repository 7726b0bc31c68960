"""Changelog subscriptions + table-to-table incremental replication:
the lake table as a SOURCE for downstream exactly-once consumers."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import ChangelogSubscription, dedup_latest, replicate
from omicidx_etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _changes_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )


def _sorted_rows(t):
    return sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in t.read().collect()
    )


@pytest.fixture()
def src(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "src"), SCHEMA, key="doc_id", n_buckets=4
    )
    t.overwrite(datagen.gen_sequences(spark, 60, seed=7))
    return t


@pytest.fixture()
def dst(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "dst"), SCHEMA, key="doc_id", n_buckets=4
    )


def test_bootstrap_then_incremental(spark, tmp_path, src, dst):
    sub = ChangelogSubscription(src, str(tmp_path / "ckpt"))
    # bootstrap: start_from="begin" replays the initial overwrite
    out = replicate(sub, dst)
    assert out["applied"] and _sorted_rows(dst) == _sorted_rows(src)
    # caught up: nothing to do, offset unchanged
    assert replicate(sub, dst) == {"applied": False}
    # incremental: update + delete + insert flow through
    src.merge(
        dedup_latest(
            _changes_df(
                spark,
                [
                    (105, "U", "doc_00000001", [9, 9], 2, "web"),
                    (106, "D", "doc_00000002", None, None, None),
                    (107, "U", "doc_brandnew", [1], 1, "pdf"),
                ],
            )
        )
    )
    out = replicate(sub, dst)
    assert out["applied"]
    assert _sorted_rows(dst) == _sorted_rows(src)
    assert dst.read().filter("doc_id = 'doc_00000002'").count() == 0


def test_crash_between_apply_and_ack_is_exactly_once(spark, tmp_path, src, dst):
    """If the consumer dies after the merge commits but before ack, the
    re-poll re-applies the same interval; the (app_id, batch_id) watermark
    skips the duplicate commit and the replica is unchanged."""
    sub = ChangelogSubscription(src, str(tmp_path / "ckpt"))
    polled = sub.poll()
    assert polled is not None
    df, _, to_sid = polled
    # simulate the apply half of replicate() without the ack
    from pyspark.sql import functions as F

    batch = df.select(
        F.when(F.col("_change_type") == "delete", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("_seq").alias("seq"),
        *[c for c in df.columns if c not in ("_change_type", "_seq")],
    )
    dst.merge(batch, app_id=f"replicate:{sub.consumer_id}", batch_id=to_sid)
    sid_after_apply = dst.snapshot()["snapshot_id"]
    # crash + restart: offset still at begin, full replicate re-runs
    sub2 = ChangelogSubscription(src, str(tmp_path / "ckpt"))
    out = replicate(sub2, dst)
    assert out["applied"] and (out.get("summary") or {}).get("skipped")  # watermark skip
    assert dst.snapshot()["snapshot_id"] == sid_after_apply
    assert _sorted_rows(dst) == _sorted_rows(src)
    assert sub2.offset() == to_sid  # ack advanced despite the skip


def test_retry_over_grown_interval_converges(spark, tmp_path, src, dst):
    """Crash before ack, then MORE source commits land: the re-poll covers
    a larger interval with a new batch_id, so the merge runs — the overlap
    re-applies as per-row seq no-ops and the replica converges."""
    sub = ChangelogSubscription(src, str(tmp_path / "ckpt"))
    replicate(sub, dst)
    src.merge(
        dedup_latest(_changes_df(spark, [(105, "U", "doc_00000003", [5], 1, "web")]))
    )
    polled = sub.poll()  # interval A, never acked
    assert polled is not None
    src.merge(
        dedup_latest(_changes_df(spark, [(106, "U", "doc_00000004", [6], 1, "web")]))
    )
    out = replicate(sub, dst)  # interval A+B
    assert out["applied"] and not (out.get("summary") or {}).get("skipped")
    assert _sorted_rows(dst) == _sorted_rows(src)


def test_start_from_current_skips_history(spark, tmp_path, src, dst):
    sub = ChangelogSubscription(
        src, str(tmp_path / "ckpt"), start_from="current"
    )
    assert sub.poll() is None
    src.merge(
        dedup_latest(_changes_df(spark, [(105, "U", "doc_00000005", [5], 1, "web")]))
    )
    df, _, _ = sub.poll()
    assert [r["doc_id"] for r in df.collect()] == ["doc_00000005"]


def test_ack_backwards_raises(tmp_path, src):
    sub = ChangelogSubscription(src, str(tmp_path / "ckpt"), start_from="current")
    with pytest.raises(ValueError, match="below current offset"):
        sub.ack(sub.offset() - 1)


def test_lossy_interval_raises_not_silently_skips(spark, tmp_path, src, dst):
    """purge_tombstones inside the un-acked interval must raise from
    poll()/replicate() — a replica must never silently miss deletes."""
    sub = ChangelogSubscription(src, str(tmp_path / "ckpt"))
    replicate(sub, dst)
    src.merge(
        dedup_latest(_changes_df(spark, [(105, "D", "doc_00000006", None, None, None)]))
    )
    src.purge_tombstones(before_seq=10**9)
    with pytest.raises(ValueError, match="lossy"):
        replicate(sub, dst)


def test_subscription_with_pre_images(spark, tmp_path, src):
    sub = ChangelogSubscription(
        src, str(tmp_path / "ckpt"), start_from="current", include_before=True
    )
    old = src.read().filter("doc_id = 'doc_00000007'").first()
    src.merge(
        dedup_latest(_changes_df(spark, [(105, "U", "doc_00000007", [7], 1, "web")]))
    )
    df, _, _ = sub.poll()
    row = df.first()
    assert row["_before"]["tokens"] == list(old["tokens"])


# --------------------------------------------------------------- property
def test_replication_converges_under_random_crashes(spark, tmp_path):
    """Property-style: a random multi-commit source history drained by a
    consumer that randomly crashes between apply and ack (the worst spot)
    still converges to source == replica once a final clean replicate
    runs. Deterministic seed; exercises overlapping-interval re-applies
    and watermark skips together."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(1234)
    src = LakeTable.create(
        spark, str(tmp_path / "psrc"), SCHEMA, key="doc_id", n_buckets=4
    )
    dst = LakeTable.create(
        spark, str(tmp_path / "pdst"), SCHEMA, key="doc_id", n_buckets=4
    )
    sub = ChangelogSubscription(src, str(tmp_path / "pckpt"))
    seq = 0
    for _ in range(6):
        rows = []
        for _ in range(rng.randint(1, 5)):
            seq += 1
            doc = f"doc{rng.randint(0, 9)}"
            if rng.random() < 0.3:
                rows.append((seq, "D", doc, None, None, None))
            else:
                rows.append((seq, "U", doc, [seq], 1, "web"))
        src.merge(dedup_latest(_changes_df(spark, rows)), mode="mor")
        roll = rng.random()
        if roll < 0.4:
            continue  # consumer lagging: next poll covers several commits
        if roll < 0.7:
            # crash AFTER apply, BEFORE ack
            polled = sub.poll()
            if polled is None:
                continue
            df, _, to_sid = polled
            batch = df.select(
                F.when(F.col("_change_type") == "delete", F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.col("_seq").alias("seq"),
                *[c for c in df.columns if c not in ("_change_type", "_seq")],
            )
            dst.merge(
                batch, app_id=f"replicate:{sub.consumer_id}", batch_id=to_sid,
                mode="mor",
            )
            # no ack: offset still points at the old sid
        else:
            replicate(sub, dst, mode="mor")
    # final clean drain
    replicate(sub, dst, mode="mor")
    assert _sorted_rows(dst) == _sorted_rows(src)


def test_begin_after_retention_bootstraps_full_image(spark, tmp_path):
    """Once expire_snapshots truncates history, start_from='begin' must
    NOT silently replay from the oldest retained snapshot (keys last
    modified at or before it would never appear) — the first poll
    delivers a full-state image instead, and the replica is complete."""
    src = LakeTable.create(
        spark, str(tmp_path / "rsrc"), SCHEMA, key="doc_id", n_buckets=4
    )
    src.overwrite(datagen.gen_sequences(spark, 50, seed=21))
    src.merge(
        dedup_latest(_changes_df(spark, [(105, "U", "doc_00000001", [9], 1, "web")]))
    )
    src.merge(
        dedup_latest(_changes_df(spark, [(106, "U", "doc_00000002", [8], 1, "web")]))
    )
    src.expire_snapshots(keep_last=1, orphan_grace_s=0)
    assert src.history()[0].get("parent_id") is not None  # truncated
    dst = LakeTable.create(
        spark, str(tmp_path / "rdst"), SCHEMA, key="doc_id", n_buckets=4
    )
    sub = ChangelogSubscription(src, str(tmp_path / "rckpt"))
    assert sub.bootstrap_pending()
    out = replicate(sub, dst)
    assert out["applied"] and out["from_sid"] is None  # image, not interval
    assert _sorted_rows(dst) == _sorted_rows(src)  # ALL 50 keys, not just 2
    assert not sub.bootstrap_pending()
    # increments flow normally afterwards
    src.merge(
        dedup_latest(_changes_df(spark, [(107, "U", "late", [1], 1, "web")]))
    )
    out = replicate(sub, dst)
    assert out["applied"] and out["from_sid"] is not None
    assert _sorted_rows(dst) == _sorted_rows(src)
