"""Bucket-incremental materialized aggregates (plans/incremental.py):
the O(changed-buckets) refresh must produce exactly the same aggregate as
a full GROUP BY recompute, across upserts, deletes, and no-op refreshes —
the reference's full view rebuild (``build_db.py``) made incremental."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest, replay_log
from omicidx_etl_spark.lake import LakeTable
from omicidx_etl_spark.plans.incremental import MaterializedAggregate

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
        "seq long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )


def _full_recompute(table):
    return (
        table.read()
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_tok").alias("sum_n_tok"),
            F.min("n_tok").alias("min_n_tok"),
            F.max("n_tok").alias("max_n_tok"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def seeded(spark, tmp_path):
    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, n_events=3000, n_docs=300, seed=21)
    datagen.write_change_log(ch, log, files=4)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=8
    )
    # first half of the log builds the initial state
    replay_log(spark, table, log, chunk_events=1500, max_batches=1)
    return table, log


def test_incremental_refresh_matches_full_recompute(spark, seeded, tmp_path):
    table, log = seeded
    mv = MaterializedAggregate.create(
        table,
        str(tmp_path / "mv"),
        group_cols=["source"],
        sum_cols=["n_tok"],
        min_cols=["n_tok"],
        max_cols=["n_tok"],
    )
    assert _rows(mv.read()) == _rows(_full_recompute(table))

    # replay the rest of the log (updates + deletes across many buckets)
    replay_log(spark, table, log, chunk_events=1500)
    res = mv.refresh()
    assert not res.get("full_rebuild")
    assert res["changed_buckets"]
    assert _rows(mv.read()) == _rows(_full_recompute(table))

    # no-op refresh: nothing changed, nothing recomputed
    res2 = mv.refresh()
    assert res2["changed_buckets"] == [] and res2.get("skipped")


def test_single_key_change_touches_single_bucket(spark, seeded, tmp_path):
    """The refresh cost model: one changed key => exactly one recomputed
    bucket (constructional pruning through changes() + read(buckets=...))."""
    table, _ = seeded
    mv = MaterializedAggregate.create(
        table, str(tmp_path / "mv"), group_cols=["source"], sum_cols=["n_tok"]
    )
    doc = table.read().select("doc_id").first()["doc_id"]
    table.merge(
        dedup_latest(
            _changes_df(spark, [(10**9, "U", doc, [1, 2, 3], 3, "patched")])
        )
    )
    res = mv.refresh()
    assert len(res["changed_buckets"]) == 1
    assert _rows(mv.read()) == _rows(
        _full_recompute(table).select("source", "cnt", "sum_n_tok")
    )
    got = {r["source"]: r["cnt"] for r in mv.read().collect()}
    assert got["patched"] == 1


def test_min_max_correct_under_delete(spark, tmp_path):
    """MIN/MAX stay exact when the extreme row is deleted — the classic
    IVM failure mode, solved here by whole-bucket recompute (no
    pre-images needed)."""
    table = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4
    )
    rows = [(i, "U", f"d{i}", [1], 100 + i, "s") for i in range(10)]
    table.merge(dedup_latest(_changes_df(spark, rows)))
    mv = MaterializedAggregate.create(
        table, str(tmp_path / "mv"), group_cols=["source"],
        min_cols=["n_tok"], max_cols=["n_tok"],
    )
    assert mv.read().first()["max_n_tok"] == 109
    # delete the max row; a patch-based IVM would have to guess the new max
    table.merge(dedup_latest(_changes_df(spark, [(11, "D", "d9", None, None, None)])))
    mv.refresh()
    r = mv.read().first()
    assert r["max_n_tok"] == 108 and r["min_n_tok"] == 100
    assert r["cnt"] == 9


def test_lossy_interval_falls_back_to_full_rebuild(spark, seeded, tmp_path):
    table, _ = seeded
    mv = MaterializedAggregate.create(
        table, str(tmp_path / "mv"), group_cols=["source"]
    )
    doc = table.read().select("doc_id").first()["doc_id"]
    table.merge(
        dedup_latest(_changes_df(spark, [(10**9, "D", doc, None, None, None)]))
    )
    table.purge_tombstones(before_seq=10**9 + 1)  # makes the interval lossy
    res = mv.refresh()
    assert res.get("full_rebuild")
    assert _rows(mv.read()) == _rows(
        table.read().groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    )
