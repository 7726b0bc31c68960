"""In-place corpus canonicalization (cdc/canonicalize.py): duplicate
clusters → tombstone deletes through LakeTable.merge, with exactly-once /
re-insert / time-travel semantics intact."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.cdc import canonicalize
from omicidx_etl_spark.cdc.canonicalize import token_shingles
from omicidx_etl_spark.lake import LakeTable


def _schema():
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )


def _table(spark, tmp_path, rows):
    t = LakeTable.create(
        spark, str(tmp_path / "corpus"), _schema(), key="doc_id", n_buckets=4
    )
    ch = spark.createDataFrame(
        [(i, "U", d, toks, len(toks), "web") for i, (d, toks) in enumerate(rows)],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t.merge(ch, app_id="seed", batch_id=0, mode="mor")
    return t


def test_token_shingles_guard(spark):
    df = spark.createDataFrame(
        [([1, 2, 3, 4],), ([7, 8],), ([],), (None,)], "toks array<int>"
    )
    got = [r[0] for r in df.select(token_shingles(F.col("toks"), 3)).collect()]
    assert got[0] == ["1|2|3", "2|3|4"]
    assert got[1] == [] and got[2] == [] and got[3] == []


def test_exact_canonicalize_keeps_min_key(spark, tmp_path):
    t = _table(
        spark,
        tmp_path,
        [
            ("d1", [1, 2, 3]),
            ("d2", [1, 2, 3]),       # exact dup of d1
            ("d3", [9, 9, 9]),
            ("d4", [9, 9, 9]),       # exact dup of d3
            ("d5", [5]),             # unique
        ],
    )
    res = canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert res["deleted"] == 2 and res["clusters"] == 2
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["d1", "d3", "d5"]


def test_minhash_canonicalize_transitive(spark, tmp_path):
    base = list(range(100))
    near_a = base[:-1] + [999]        # ~2 shingles differ from base
    near_b = [888] + base[1:]         # ~2 shingles differ from base, 4 from near_a
    t = _table(
        spark,
        tmp_path,
        [
            ("d1", base),
            ("d2", near_a),
            ("d3", near_b),
            ("d4", [7, 7]),           # shorter than n → no shingles → survives
            ("d5", list(range(500, 560))),  # unrelated → survives
        ],
    )
    res = canonicalize(t, method="minhash", n=3, k=8, bands=4, app_id="c", batch_id=0)
    survivors = sorted(r["doc_id"] for r in t.read().collect())
    # d1/d2/d3 form one cluster (d2~d1 and d3~d1 at least; closure collapses
    # all three even if (d2, d3) was never a candidate pair)
    assert survivors == ["d1", "d4", "d5"]
    assert res["deleted"] == 2 and res["clusters"] == 1


def test_canonicalize_idempotent_and_reinsertable(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", [1, 2, 3]), ("b", [1, 2, 3])])
    res1 = canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert res1["deleted"] == 1
    # same (app_id, batch_id) → exactly-once skip, no new commit
    res2 = canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert res2["commit"]["summary"].get("skipped") is True
    # a NEW batch finds nothing left to delete
    res3 = canonicalize(t, method="exact", app_id="c", batch_id=1)
    assert res3["deleted"] == 0
    # a later genuine change event (higher seq) re-inserts the deleted key
    seq = t.snapshot()["seq_ceiling"] + 1
    ch = spark.createDataFrame(
        [(seq, "U", "b", [4, 5], 2, "web")],
        "seq long, op string, doc_id string, tokens array<int>, n_tok int, source string",
    )
    t.merge(ch, app_id="seed", batch_id=1, mode="mor")
    rows = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert rows == {"a": [1, 2, 3], "b": [4, 5]}


def test_canonicalize_time_travel_sees_pre_delete_state(spark, tmp_path):
    t = _table(spark, tmp_path, [("a", [1, 2, 3]), ("b", [1, 2, 3])])
    sid = t.snapshot()["snapshot_id"]
    canonicalize(t, method="exact", app_id="c", batch_id=0)
    assert t.read().count() == 1
    assert t.read(as_of=sid).count() == 2
    # the canonicalize commit is self-describing in history
    ops = [h["summary"].get("operation") for h in t.history()]
    assert "canonicalize" in ops
