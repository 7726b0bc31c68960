"""Debezium/WAL JSON envelope normalizer (sources/debezium.py): decode of
the standard before/after/op/ts_ms/source.lsn envelope into the engine's
change-set contract, Kafka-Connect framing, seq derivation, and the
end-to-end feed → LakeTable path. The reference normalizes change records
per-record in Python (omicidx_etl/sra/catalog.py:141-210); this is the
same contract as pure column expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.sources.debezium import (
    debezium_changes,
    envelope_schema,
    to_debezium_json,
)

ROW = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
    ]
)


def _feed(spark, lines):
    return spark.createDataFrame([(x,) for x in lines], "value string")


def test_decode_ops_and_images(spark):
    lines = [
        # insert: image in after
        '{"before": null, "after": {"doc_id": "a", "n_tok": 3}, "op": "c", "ts_ms": 10, "source": {"lsn": 100}}',
        # update
        '{"before": {"doc_id": "b", "n_tok": 1}, "after": {"doc_id": "b", "n_tok": 2}, "op": "u", "ts_ms": 11, "source": {"lsn": 101}}',
        # snapshot read (initial load) counts as upsert
        '{"before": null, "after": {"doc_id": "c", "n_tok": 9}, "op": "r", "ts_ms": 12, "source": {"lsn": 102}}',
        # delete: image only in before
        '{"before": {"doc_id": "a", "n_tok": 3}, "after": null, "op": "d", "ts_ms": 13, "source": {"lsn": 103}}',
    ]
    out = debezium_changes(_feed(spark, lines), ROW).orderBy("seq").collect()
    assert [(r["doc_id"], r["n_tok"], r["seq"], r["op"]) for r in out] == [
        ("a", 3, 100, "U"),
        ("b", 2, 101, "U"),
        ("c", 9, 102, "U"),
        ("a", 3, 103, "D"),
    ]


def test_seq_falls_back_to_ts_ms_without_lsn(spark):
    lines = [
        '{"after": {"doc_id": "a", "n_tok": 1}, "op": "c", "ts_ms": 777}',
    ]
    out = debezium_changes(_feed(spark, lines), ROW).collect()
    assert out[0]["seq"] == 777


def test_wrapped_kafka_connect_framing(spark):
    lines = [
        '{"schema": {"ignored": true}, "payload": {"after": {"doc_id": "k", "n_tok": 5}, "op": "c", "ts_ms": 1, "source": {"lsn": 9}}}',
    ]
    out = debezium_changes(_feed(spark, lines), ROW, wrapped=True).collect()
    assert (out[0]["doc_id"], out[0]["n_tok"], out[0]["seq"], out[0]["op"]) == (
        "k", 5, 9, "U",
    )


def test_unknown_op_yields_null_op_for_quarantine(spark):
    lines = [
        '{"after": {"doc_id": "a", "n_tok": 1}, "op": "x", "source": {"lsn": 1}}',
        'not json at all',
    ]
    out = debezium_changes(_feed(spark, lines), ROW).collect()
    assert all(r["op"] is None for r in out)


def test_encode_decode_roundtrip_exact(spark):
    df = spark.createDataFrame(
        [("a", 1, 0.1 + 0.2), ("b", 2, 1e-300), ("c", 3, None)],
        "doc_id string, n_tok int, value double",
    )
    row = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    feed = to_debezium_json(
        df, ["doc_id", "n_tok", "value"],
        op=F.when(F.col("n_tok") == 2, F.lit("d")).otherwise(F.lit("u")),
        lsn=F.col("n_tok"),
    )
    back = {
        r["doc_id"]: (r["n_tok"], r["value"], r["seq"], r["op"])
        for r in debezium_changes(feed, row).collect()
    }
    # doubles survive JSON bit-for-bit (shortest-roundtrip encoding)
    assert back["a"] == (1, 0.1 + 0.2, 1, "U")
    assert back["b"] == (2, 1e-300, 2, "D")  # delete image from `before`
    assert back["c"] == (3, None, 3, "U")


def test_feed_to_lake_table_end_to_end(spark, tmp_path):
    from omicidx_etl_spark.cdc import dedup_latest
    from omicidx_etl_spark.lake import LakeTable

    lines = [
        '{"after": {"doc_id": "a", "n_tok": 1}, "op": "c", "source": {"lsn": 1}}',
        '{"after": {"doc_id": "a", "n_tok": 2}, "op": "u", "source": {"lsn": 2}}',
        '{"after": {"doc_id": "b", "n_tok": 7}, "op": "r", "source": {"lsn": 3}}',
        '{"before": {"doc_id": "b", "n_tok": 7}, "op": "d", "source": {"lsn": 4}}',
    ]
    ch = debezium_changes(_feed(spark, lines), ROW)
    t = LakeTable.create(spark, str(tmp_path / "t"), ROW, key="doc_id", n_buckets=4)
    t.merge(dedup_latest(ch, "doc_id", "seq"), mode="mor")
    assert {
        (r["doc_id"], r["n_tok"]) for r in t.read().collect()
    } == {("a", 2)}


def test_stream_replay_tails_envelope_feed(spark, tmp_path):
    """End-to-end streaming tail of a Debezium envelope feed: readStream
    over raw JSON-line envelopes, per-micro-batch ``transform`` decodes to
    the change contract, merge applies last-LSN-wins. The binlog→lake path
    with no intermediate landing table."""
    import json
    import os

    from omicidx_etl_spark.lake import LakeTable
    from omicidx_etl_spark.streaming import stream_replay

    feed = tmp_path / "feed"
    feed.mkdir()
    # two files => two availableNow micro-batches with maxFilesPerTrigger=1
    f1 = [
        {"after": {"doc_id": "a", "n_tok": 1}, "op": "c", "ts_ms": 1, "source": {"lsn": 1}},
        {"after": {"doc_id": "b", "n_tok": 2}, "op": "c", "ts_ms": 2, "source": {"lsn": 2}},
    ]
    f2 = [
        {"after": {"doc_id": "a", "n_tok": 7}, "op": "u", "ts_ms": 3, "source": {"lsn": 3}},
        {"before": {"doc_id": "b", "n_tok": 2}, "after": None, "op": "d", "ts_ms": 4, "source": {"lsn": 4}},
        {"after": {"doc_id": "c", "n_tok": 5}, "op": "r", "ts_ms": 5, "source": {"lsn": 5}},
    ]
    for name, rows in (("000.json", f1), ("001.json", f2)):
        with open(feed / name, "w") as fh:
            fh.write("\n".join(json.dumps(r) for r in rows))

    t = LakeTable.create(spark, str(tmp_path / "t"), ROW, key="doc_id", n_buckets=4)
    snaps = stream_replay(
        spark,
        t,
        str(feed),
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
        schema=T.StructType([T.StructField("value", T.StringType())]),
        source_format="text",
        transform=lambda df: debezium_changes(df, ROW),
        mode="mor",
    )
    assert len(snaps) == 2
    state = {r.doc_id: r.n_tok for r in t.read().collect()}
    assert state == {"a": 7, "c": 5}  # b deleted, a updated at lsn 3
