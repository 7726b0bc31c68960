"""Operator-library unit tests: strategy equivalences and edge semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest
from omicidx_etl_spark.operators import relational as R
from omicidx_etl_spark.functions import multimodal as M


def test_dedup_strategies_agree(spark):
    ch = datagen.gen_changes(spark, 5000, 200, seed=31)
    outs = {
        m: dedup_latest(ch, method=m).orderBy("doc_id").collect()
        for m in ["max_by", "window", "salted_window", "prefilter"]
    }
    assert (
        outs["max_by"] == outs["window"] == outs["salted_window"] == outs["prefilter"]
    )


def test_surrogate_ids_scalable_equals_window(spark):
    df = datagen.gen_sequences(spark, 1000, seed=32).select("doc_id")
    a = R.surrogate_ids(df, "doc_id").orderBy("doc_id").collect()
    b = R.scalable_surrogate_ids(df, "doc_id", partitions=7).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["row_id"]) for r in a] == [
        (r["doc_id"], r["row_id"]) for r in b
    ]


def test_union_discriminated_schema(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([(2,)], "x int")
    out = R.union_discriminated([(a, "a"), (b, "b")], "kind").collect()
    assert sorted((r["x"], r["kind"]) for r in out) == [(1, "a"), (2, "b")]


def test_exists_flag_null_safe(spark):
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1,)], "k int")
    out = {r["k"]: r["flag"] for r in R.exists_flag(left, right, "k", "flag").collect()}
    assert out == {1: True, 2: False}


def test_multimodal_stub_raises_without_fake(spark):
    d = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    bin_df = M.to_binary_payload(d, "doc_id", "text")
    import pytest

    with pytest.raises(Exception):
        M.extract_features(bin_df, fake=False).collect()
    ok = M.extract_features(bin_df, fake=True).first()
    assert ok["n_bytes"] == 5 and ok["head_hex"] == "68656c6c"


def test_datagen_deterministic(spark):
    a = datagen.gen_changes(spark, 500, 50, seed=42).collect()
    b = datagen.gen_changes(spark, 500, 50, seed=42).collect()
    assert a == b
    c = datagen.gen_changes(spark, 500, 50, seed=43).collect()
    assert a != c


def test_datagen_invariants(spark):
    ch = datagen.gen_changes(spark, 2000, 100, seed=1)
    bad = ch.filter(
        ((F.col("op") == "D") & F.col("tokens").isNotNull())
        | ((F.col("op") != "D") & (F.size("tokens") != F.col("n_tok")))
    )
    assert bad.count() == 0
    # full-snapshot prefix: first n_docs events insert each doc once
    prefix = ch.filter(F.col("seq") <= 100)
    assert prefix.filter(F.col("op") != "I").count() == 0
    assert prefix.select("doc_id").distinct().count() == 100


def test_fix_encoding_drops_invalid_utf8(spark):
    """D4: lossy utf-8 re-encode equals Python's decode(errors='ignore')."""
    from omicidx_etl_spark.functions.text import fix_encoding

    raw = [
        b"plain ascii",
        b"caf\xc3\xa9 utf8 ok",        # valid multibyte passes through
        b"caf\xe9 broken latin1",       # lone continuation byte dropped
        b"\xff\xfe garbage \x80 mid",   # several invalid sequences
        b"",
    ]
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raw)], "id long, payload binary")
    got = {r.id: r.text for r in fix_encoding(df, "payload").collect()}
    for i, r in enumerate(raw):
        assert got[i] == r.decode("utf-8", errors="ignore"), (i, r)


def test_asof_join_semantics(spark):
    """Inclusive-tie, carry-latest, and no-preceding-version-null semantics
    of the union+window as-of join (mirrors DuckDB ASOF LEFT JOIN >=)."""
    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 10, "b"), ("u1", 20, "c"), ("u2", 7, "d")],
        "k string, ts long, ev string",
    )
    right = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 15, 150), ("u3", 1, 999)],
        "k string, valid_from long, attr int",
    )
    got = {
        (r.k, r.ts): r.attr
        for r in R.asof_join(left, right, key="k", left_ts="ts",
                             right_ts="valid_from").collect()
    }
    assert got[("u1", 5)] is None          # before any version
    assert got[("u1", 10)] == 100          # tie is inclusive (>=)
    assert got[("u1", 20)] == 150          # latest preceding, not first
    assert got[("u2", 7)] is None          # key with no versions at all
