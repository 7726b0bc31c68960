"""Schema-evolution tests (SURVEY.md §5): add column + widen int32→int64
mid-replay; old data files are never rewritten; reads align all schema
generations; replay continues with the evolved change feed."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import replay_log
from omicidx_etl_spark.lake import LakeTable


def test_evolution_mid_replay(spark, tmp_path):
    root = str(tmp_path / "t")
    log1 = str(tmp_path / "log1")
    log2 = str(tmp_path / "log2")
    n_docs = 300

    ch1 = datagen.gen_changes(spark, 3000, n_docs, seed=11)
    datagen.write_change_log(ch1, log1, files=2)
    ch2 = datagen.gen_changes_v2(spark, 2000, n_docs, seed=12, seq_start=3001)
    datagen.write_change_log(ch2, log2, files=2)

    schema = ch1.drop("seq", "op", "event_ts").schema
    t = LakeTable.create(spark, root, schema, key="doc_id", n_buckets=8)
    replay_log(spark, t, log1, chunk_events=1500, app_id="phase1")

    # --- evolve: widen n_tok int->long, add quality double (A3 fixture) ---
    t.widen_column("n_tok", T.LongType())
    t.add_column("quality", T.DoubleType())
    cur = t.current_schema()
    assert cur["n_tok"].dataType == T.LongType()
    assert "quality" in cur.fieldNames()

    # old rows readable through the new schema, quality null
    pre = t.read()
    assert pre.schema["n_tok"].dataType == T.LongType()
    assert pre.filter(F.col("quality").isNotNull()).count() == 0

    replay_log(spark, t, log2, chunk_events=1000, app_id="phase2")

    # oracle: apply both logs by seq; schema-align log1 (no quality)
    exp = duckdb.sql(
        f"""
        WITH all_events AS (
          SELECT seq, op, doc_id, tokens, CAST(n_tok AS BIGINT) n_tok, source,
                 CAST(NULL AS DOUBLE) AS quality
          FROM read_parquet('{log1}/*.parquet')
          UNION ALL
          SELECT seq, op, doc_id, tokens, n_tok, source, quality
          FROM read_parquet('{log2}/*.parquet')
        )
        SELECT doc_id, tokens, n_tok, source, quality FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) rn
          FROM all_events
        ) WHERE rn = 1 AND op <> 'D' ORDER BY doc_id
        """
    ).df()
    got = (
        t.read()
        .select("doc_id", "tokens", "n_tok", "source", "quality")
        .orderBy("doc_id")
        .toPandas()
    )
    assert len(got) == len(exp)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tok"].tolist() == exp["n_tok"].tolist()
    for g, e in zip(got["tokens"].tolist(), exp["tokens"].tolist()):
        assert list(g) == list(e)
    gq, eq = got["quality"].tolist(), exp["quality"].tolist()
    for a, b in zip(gq, eq):
        assert (a is None or a != a) and (b is None or b != b) or a == b


def test_illegal_widen_rejected(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=2)
    with pytest.raises(ValueError):
        t.widen_column("n", T.IntegerType())  # narrowing


def test_evolution_is_idempotent(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("n", T.IntegerType())]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=2)
    t.add_column("q", T.DoubleType())
    sid = t.snapshot()["snapshot_id"]
    t.add_column("q", T.DoubleType())  # no-op
    t.widen_column("n", T.LongType())
    t.widen_column("n", T.LongType())  # no-op
    assert t.snapshot()["snapshot_id"] == sid + 1


def _mk(spark, tmp_path, rows):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=2)
    t.overwrite(spark.createDataFrame(rows, schema))
    return t


def test_rename_column_remaps_old_files(spark, tmp_path):
    t = _mk(spark, tmp_path, [("d1", 1, "a"), ("d2", 2, "b")])
    t.rename_column("tag", "label")
    assert t.current_schema().fieldNames() == ["doc_id", "n", "label"]
    # old files (written as `tag`) read back under the new name
    rows = {r["doc_id"]: r["label"] for r in t.read().collect()}
    assert rows == {"d1": "a", "d2": "b"}
    # merges after the rename use the new name; both generations reconcile
    ch = spark.createDataFrame(
        [(5, "U", "d1", 9, "z")],
        "seq long, op string, doc_id string, n int, label string",
    )
    from omicidx_etl_spark.cdc import dedup_latest

    t.merge(dedup_latest(ch), mode="mor")
    rows = {r["doc_id"]: (r["n"], r["label"]) for r in t.read().collect()}
    assert rows == {"d1": (9, "z"), "d2": (2, "b")}


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path, [("d1", 1, "a")])
    with pytest.raises(ValueError, match="bucket key"):
        t.rename_column("doc_id", "id")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("tag", "n")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """Iceberg drop semantics: a re-added column with the same name is a
    NEW field id — values from pre-drop files must stay null."""
    t = _mk(spark, tmp_path, [("d1", 1, "old_a"), ("d2", 2, "old_b")])
    t.drop_column("tag")
    assert t.current_schema().fieldNames() == ["doc_id", "n"]
    assert "tag" not in t.read().columns
    t.add_column("tag", T.StringType())
    vals = {r["doc_id"]: r["tag"] for r in t.read().collect()}
    assert vals == {"d1": None, "d2": None}  # no resurrection
    # new writes under the re-added field land normally
    from omicidx_etl_spark.cdc import dedup_latest

    ch = spark.createDataFrame(
        [(7, "U", "d1", 1, "new_a")],
        "seq long, op string, doc_id string, n int, tag string",
    )
    t.merge(dedup_latest(ch), mode="mor")
    vals = {r["doc_id"]: r["tag"] for r in t.read().collect()}
    assert vals == {"d1": "new_a", "d2": None}


def test_rename_visible_in_time_travel_and_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, [("d1", 1, "a")])
    sid0 = t.snapshot()["snapshot_id"]
    t.rename_column("tag", "label")
    from omicidx_etl_spark.cdc import dedup_latest

    ch = spark.createDataFrame(
        [(9, "U", "d1", 3, "c")],
        "seq long, op string, doc_id string, n int, label string",
    )
    t.merge(dedup_latest(ch), mode="mor")
    # as-of the pre-rename snapshot: old name
    assert "tag" in t.read(as_of=sid0).columns
    # changelog since then: new name, remapped values
    chg = t.changes(sid0).collect()
    assert len(chg) == 1 and chg[0]["label"] == "c"


def _strip_field_ids(t):
    """Simulate a pre-field-id ('legacy') table: rewrite every snapshot
    json without the field_ids block, as tables created before the feature
    carry none."""
    import glob
    import json as _json
    import os

    for p in glob.glob(os.path.join(t.root, "_meta", "snapshot-*.json")):
        with open(p) as f:
            snap = _json.load(f)
        snap.pop("field_ids", None)
        with open(p, "w") as f:
            _json.dump(snap, f)
    t.snapshot()  # drop the cached copy


def test_rename_on_legacy_table_backfills_field_ids(spark, tmp_path):
    """A rename on a table whose snapshots predate field_ids must backfill
    positional ids for every historical schema id (names were positionally
    stable pre-feature) so old files re-map instead of reading back NULL."""
    t = _mk(spark, tmp_path, [("d1", 1, "a"), ("d2", 2, "b")])
    t.add_column("q", T.DoubleType())  # a second legacy schema generation
    _strip_field_ids(t)
    t.rename_column("tag", "label")
    rows = {r["doc_id"]: r["label"] for r in t.read().collect()}
    assert rows == {"d1": "a", "d2": "b"}  # not {None, None}
    # the backfill covers every schema id referenced by the snapshot
    fids = t.snapshot()["field_ids"]
    assert set(fids) == set(t.snapshot()["schemas"])


def test_auto_evolve_applies_drift_mid_replay(spark, tmp_path):
    """replay_batch(auto_evolve=True): a drifted batch (new column, widened
    type) evolves the table THROUGH the schema-update APIs before merging —
    no manual add_column/widen_column calls, incompatible drift still
    raises (Delta mergeSchema / Iceberg schema.auto-evolve analogue)."""
    from omicidx_etl_spark.cdc.replay import replay_batch

    n_docs = 200
    ch1 = datagen.gen_changes(spark, 1000, n_docs, seed=21).drop("event_ts")
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        ch1.drop("seq", "op").schema,
        key="doc_id",
        n_buckets=4,
    )
    replay_batch(t, ch1, batch_id=0, app_id="drift", auto_evolve=True, mode="mor")
    assert "quality" not in t.current_schema().fieldNames()

    ch2 = datagen.gen_changes_v2(spark, 800, n_docs, seed=22, seq_start=1001).drop(
        "event_ts"
    )
    snap = replay_batch(
        t, ch2, batch_id=1, app_id="drift", auto_evolve=True, mode="mor"
    )
    assert snap["summary"]["schema_evolved"] == [
        "widen n_tok int->bigint",
        "add quality double",
    ]
    cur = {f.name: f.dataType for f in t.current_schema().fields}
    assert cur["quality"] == T.DoubleType()
    assert cur["n_tok"] == T.LongType()
    out = t.read()
    # rows only touched in phase 1 read back NULL quality; evolved rows carry it
    assert out.filter(F.col("quality").isNotNull()).count() > 0
    assert out.filter(F.col("quality").isNull()).count() > 0
    # idempotent: replaying the same evolved batch is a no-op for schema too
    again = replay_batch(
        t, ch2, batch_id=1, app_id="drift", auto_evolve=True, mode="mor"
    )
    assert again["summary"]["skipped"] is True


def test_auto_evolve_rejects_incompatible_drift(spark, tmp_path):
    from omicidx_etl_spark.cdc.replay import replay_batch

    ch = datagen.gen_changes(spark, 200, 50, seed=23).drop("event_ts")
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        ch.drop("seq", "op").schema,
        key="doc_id",
        n_buckets=4,
    )
    bad = ch.withColumn("n_tok", F.col("n_tok").cast("string"))
    with pytest.raises(ValueError, match="incompatible schema drift"):
        replay_batch(t, bad, batch_id=0, app_id="bad", auto_evolve=True, mode="mor")
    # nothing committed
    assert t.snapshot()["snapshot_id"] == 0


def test_stream_auto_evolve_across_deploys(spark, tmp_path):
    """A file-source stream has one fixed schema per run, so drift arrives
    as a NEW stream deployment over the evolved feed; auto_evolve lets the
    new deployment evolve the table on its first batch."""
    from omicidx_etl_spark.streaming import stream_replay

    n_docs = 150
    log1, log2 = str(tmp_path / "log1"), str(tmp_path / "log2")
    ch1 = datagen.gen_changes(spark, 1000, n_docs, seed=31).drop("event_ts")
    datagen.write_change_log(ch1, log1, files=2)
    ch2 = datagen.gen_changes_v2(spark, 600, n_docs, seed=32, seq_start=1001).drop(
        "event_ts"
    )
    datagen.write_change_log(ch2, log2, files=2)

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        ch1.drop("seq", "op").schema,
        key="doc_id",
        n_buckets=4,
    )
    stream_replay(spark, t, log1, str(tmp_path / "ck1"), app_id="v1", mode="mor")
    stream_replay(
        spark, t, log2, str(tmp_path / "ck2"), app_id="v2", mode="mor",
        auto_evolve=True,
    )
    cur = {f.name: f.dataType for f in t.current_schema().fields}
    assert cur["quality"] == T.DoubleType() and cur["n_tok"] == T.LongType()
    assert t.read().filter(F.col("quality").isNotNull()).count() > 0
