"""SCD2 history, sequence packing, incremental dedup — operator semantics.

The registry-level value parity vs DuckDB is covered by
tests/test_oracle_parity.py; these tests pin the structural invariants the
oracle can't see (interval chaining, scalable-vs-window equivalence across
a multi-partition layout, bucket-pruned corpus lookup).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from omicidx_etl_spark.functions.packing import (
    pack_sequences,
    scalable_pack_sequences,
)
from omicidx_etl_spark.operators.cdc_ops import scd2_history


def test_scd2_intervals_chain(spark):
    rows = [
        ("a", 1, "v1"),
        ("a", 2, "v2"),
        ("a", 5, "v3"),
        ("b", 3, "w1"),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, val string")
    out = scd2_history(df, ["k"], ["seq"]).collect()
    by_key: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r.k, r.seq)):
        by_key.setdefault(r.k, []).append(r)
    # every key has exactly one open (current) version: the last one
    for k, versions in by_key.items():
        assert [v.is_current for v in versions] == [False] * (len(versions) - 1) + [True]
        # intervals chain: valid_to of version i == valid_from of i+1
        for cur, nxt in zip(versions, versions[1:]):
            assert cur.valid_to_seq == nxt.seq
        assert versions[-1].valid_to_seq is None
    assert len(by_key["a"]) == 3 and len(by_key["b"]) == 1


def test_scalable_packing_matches_window_packing(spark):
    # deliberately multi-partition, unsorted input with skewed token counts
    df = (
        spark.range(0, 5000, 1, 16)
        .select(
            F.col("id").alias("doc_id"),
            ((F.col("id") * 37) % 991 + 1).cast("bigint").alias("n_tok"),
        )
        .repartition(16)
    )
    a = pack_sequences(df, "n_tok", "doc_id", ctx_len=2048).collect()
    b = scalable_pack_sequences(df, "n_tok", "doc_id", ctx_len=2048, partitions=8).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    # packing invariant: bins are dense 0..max and every offset < ctx
    bins = {r.bin_id for r in a}
    assert bins == set(range(max(bins) + 1))
    assert all(0 <= r.bin_offset < 2048 for r in a)


def test_pack_sequences_grouped(spark):
    df = spark.createDataFrame(
        [("s1", 1, 1000), ("s1", 2, 1500), ("s2", 1, 100)],
        "src string, doc_id int, n_tok int",
    )
    out = {
        (r.src, r.doc_id): (r.bin_id, r.bin_offset)
        for r in pack_sequences(df, "n_tok", "doc_id", 2048, part_cols=("src",)).collect()
    }
    assert out[("s1", 1)] == (0, 0)
    assert out[("s1", 2)] == (0, 1000)  # starts mid-bin-0, chops into bin 1
    assert out[("s2", 1)] == (0, 0)  # independent stream per source


def test_incremental_dedup_prunes_corpus_buckets(spark, tmp_path):
    """When the corpus fingerprints live in a LakeTable keyed by
    content_hash, the anti-join collapses to a bucket-pruned lookup: only
    the buckets the batch's hashes land in are read."""
    from omicidx_etl_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("content_hash", T.StringType())])
    idx = LakeTable.create(
        spark, str(tmp_path / "fp"), schema, key="content_hash", n_buckets=16
    )
    corpus_texts = [(f"corpus doc {i}",) for i in range(50)]
    corpus = spark.createDataFrame(corpus_texts, "text string").select(
        F.md5("text").alias("content_hash")
    )
    idx.overwrite(corpus)

    batch = spark.createDataFrame(
        [(1, "corpus doc 7"), (2, "fresh doc"), (3, "fresh doc"), (4, "corpus doc 8")],
        "doc_id int, text string",
    ).withColumn("content_hash", F.md5("text"))

    # prune: hash the batch's fingerprints to bucket ids, read only those
    hashes = [r.content_hash for r in batch.select("content_hash").distinct().collect()]
    seen: dict[str, object] = {}
    orig = LakeTable.read

    def spy(self, buckets=None, **kw):
        seen["buckets"] = buckets
        return orig(self, buckets=buckets, **kw)

    import pytest

    monkey = pytest.MonkeyPatch()
    monkey.setattr(LakeTable, "read", spy)
    try:
        corpus_slice = idx.lookup(hashes)
    finally:
        monkey.undo()
    assert seen["buckets"] is not None and len(seen["buckets"]) <= 3

    from omicidx_etl_spark.functions.dedup import incremental_exact_dedup

    # dedup against the pruned slice only (its column already holds hashes)
    survivors = incremental_exact_dedup(
        batch.select("doc_id", "text"),
        corpus_slice,
        "doc_id",
        corpus_col="content_hash",
        corpus_hashed=True,
    ).collect()
    assert sorted(r.doc_id for r in survivors) == [2]
    # and the full-corpus path agrees
    full = incremental_exact_dedup(
        batch.select("doc_id", "text"),
        spark.createDataFrame(corpus_texts, "text string"),
        "doc_id",
    ).collect()
    assert sorted(r.doc_id for r in full) == [2]
