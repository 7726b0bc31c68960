"""Token-array normalization (D2): the JVM expression path and the
Arrow-batched mapInPandas path must be semantically identical, and the
normalizer must hold its invariants on the CDC change-log fixture
(nulls preserved, out-of-vocab dropped, truncation, n_tok recount)."""

from __future__ import annotations

from pyspark.sql import functions as F

from omicidx_etl_spark import datagen
from omicidx_etl_spark.functions.tokens import (
    normalize_tokens_arrow,
    normalize_tokens_expr,
)

VOCAB, MAX_LEN = 1000, 16


def _fixture(spark):
    """Change events whose token arrays contain out-of-vocab ids and nulls
    (delete events carry null tokens)."""
    ch = datagen.gen_changes(spark, 500, 50, seed=13)
    # push some ids out of vocab deterministically
    return ch.withColumn(
        "tokens",
        F.transform(
            "tokens", lambda t: F.when(t % 7 == 0, t + F.lit(60000)).otherwise(t % 1500)
        ),
    )


def _collect(df):
    rows = df.select("seq", "tokens", "n_tok").orderBy("seq").collect()
    return [
        (r["seq"], None if r["tokens"] is None else list(r["tokens"]), r["n_tok"])
        for r in rows
    ]


def test_expr_and_arrow_paths_identical(spark):
    src = _fixture(spark)
    a = _collect(normalize_tokens_expr(src, vocab_size=VOCAB, max_len=MAX_LEN))
    b = _collect(normalize_tokens_arrow(src, vocab_size=VOCAB, max_len=MAX_LEN))
    assert a == b


def test_normalizer_invariants(spark):
    src = _fixture(spark)
    out = normalize_tokens_expr(src, vocab_size=VOCAB, max_len=MAX_LEN)
    rows = out.select("op", "tokens", "n_tok").collect()
    assert any(r["op"] == "D" for r in rows)
    for r in rows:
        if r["op"] == "D":
            assert r["tokens"] is None and r["n_tok"] is None
        else:
            toks = list(r["tokens"])
            assert len(toks) <= MAX_LEN
            assert r["n_tok"] == len(toks)
            assert all(0 <= t < VOCAB for t in toks)


def test_normalize_preserves_order(spark):
    df = spark.createDataFrame(
        [("a", [5, 99999, 3, -1, 7])],
        "doc_id string, tokens array<int>",
    ).withColumn("n_tok", F.size("tokens"))
    got = normalize_tokens_expr(df, vocab_size=100, max_len=2).collect()[0]
    assert list(got["tokens"]) == [5, 3]
    assert got["n_tok"] == 2
