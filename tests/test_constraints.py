"""CHECK constraints: write-time data-quality enforcement (Delta
ADD CONSTRAINT semantics — violation iff the expression is FALSE;
NULL/unknown passes; delete events exempt)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from omicidx_etl_spark import datagen
from omicidx_etl_spark.cdc import dedup_latest
from omicidx_etl_spark.lake import ConstraintViolation, LakeTable

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


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="doc_id", n_buckets=4)
    t.overwrite(datagen.gen_sequences(spark, 40, seed=9))
    return t


def test_violating_merge_fails_atomically(spark, table):
    table.add_constraint("n_tok_nonneg", "n_tok >= 0")
    sid = table.snapshot()["snapshot_id"]
    before = table.read().count()
    with pytest.raises(ConstraintViolation, match="n_tok_nonneg.*1 row"):
        table.merge(
            dedup_latest(
                _changes_df(
                    spark,
                    [
                        (100, "U", "ok_doc", [1], 1, "web"),
                        (101, "U", "bad_doc", [1], -5, "web"),
                    ],
                )
            )
        )
    # nothing staged became visible
    assert table.snapshot()["snapshot_id"] == sid
    assert table.read().count() == before


def test_on_violation_drop_filters_and_reports(spark, table):
    table.add_constraint("n_tok_nonneg", "n_tok >= 0")
    out = table.merge(
        dedup_latest(
            _changes_df(
                spark,
                [
                    (100, "U", "ok_doc", [1], 1, "web"),
                    (101, "U", "bad_doc", [1], -5, "web"),
                ],
            )
        ),
        on_violation="drop",
    )
    assert out["summary"]["constraint_dropped_rows"] == 1
    got = {r["doc_id"] for r in table.lookup(["ok_doc", "bad_doc"]).collect()}
    assert got == {"ok_doc"}


def test_deletes_exempt_and_nulls_pass(spark, table):
    table.add_constraint("n_tok_nonneg", "n_tok >= 0")
    # a delete (NULL payload) and an upsert with NULL n_tok both pass:
    # CHECK is violated only by FALSE, and deletes are exempt entirely
    table.merge(
        dedup_latest(
            _changes_df(
                spark,
                [
                    (100, "D", "doc_00000001", None, None, None),
                    (101, "U", "nullish", [1], None, "web"),
                ],
            )
        )
    )
    assert table.read().filter("doc_id = 'doc_00000001'").count() == 0


def test_add_constraint_validates_existing_rows(spark, table):
    table.merge(
        dedup_latest(_changes_df(spark, [(100, "U", "neg", [1], -1, "web")]))
    )
    with pytest.raises(ConstraintViolation, match="existing"):
        table.add_constraint("n_tok_nonneg", "n_tok >= 0")
    # validate=False registers anyway (known-clean / backfill-later path)
    table.add_constraint("n_tok_nonneg", "n_tok >= 0", validate=False)
    assert "n_tok_nonneg" in table.constraints()


def test_constraint_persists_and_drops(spark, tmp_path, table):
    table.add_constraint("src_known", "source in ('web','books','code','wiki')")
    t2 = LakeTable.load(spark, table.root)
    assert t2.constraints() == {"src_known": "source in ('web','books','code','wiki')"}
    with pytest.raises(ConstraintViolation):
        t2.merge(
            dedup_latest(
                _changes_df(spark, [(100, "U", "x", [1], 1, "martian")])
            )
        )
    t2.drop_constraint("src_known")
    t2.merge(
        dedup_latest(_changes_df(spark, [(100, "U", "x", [1], 1, "martian")]))
    )
    assert t2.lookup(["x"]).count() == 1


def test_bad_expression_fails_at_add_time(table):
    with pytest.raises(Exception):
        table.add_constraint("typo", "no_such_column > 0")
    assert "typo" not in table.constraints()


def test_overwrite_enforces(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "o"), SCHEMA, key="doc_id", n_buckets=2
    )
    t.add_constraint("n_tok_nonneg", "n_tok >= 0")
    bad = spark.createDataFrame(
        [("a", [1], -1, "web")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    with pytest.raises(ConstraintViolation):
        t.overwrite(bad)
    out = t.overwrite(bad, on_violation="drop")
    assert out["summary"]["constraint_dropped_rows"] == 1
    assert t.read().count() == 0


def test_streaming_violating_batch_quarantined(spark, tmp_path):
    """Integration with stream_replay: a micro-batch violating a table
    CHECK constraint routes to _quarantine (data landed, error names the
    constraint) while clean batches commit — constraints compose with the
    T6 poison-batch machinery instead of wedging the stream."""
    import json as _json
    import os

    from omicidx_etl_spark import datagen
    from omicidx_etl_spark.streaming import stream_replay

    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 3000, 200, seed=13)
    # poison the rows of one seq slice: negative n_tok on non-deletes
    from pyspark.sql import functions as F

    poisoned = ch.withColumn(
        "n_tok",
        F.when(
            (F.col("seq") >= 1000) & (F.col("seq") < 2000) & (F.col("op") != "D"),
            F.lit(-1),
        ).otherwise(F.col("n_tok")),
    )
    datagen.write_change_log(poisoned, log, files=3)
    schema = ch.drop("seq", "op", "event_ts").schema
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=4
    )
    t.add_constraint("n_tok_nonneg", "n_tok >= 0")
    committed = stream_replay(
        spark, t, log, str(tmp_path / "ckpt"), app_id="cq",
        max_files_per_trigger=1,
    )
    quar = [c for c in committed if c.get("quarantined")]
    good = [c for c in committed if not c.get("quarantined")]
    # the poisoned seq slice may span file boundaries: >=1 quarantined,
    # every other batch committed
    assert len(quar) >= 1 and len(good) == 3 - len(quar) and good
    assert "n_tok_nonneg" in quar[0]["error"]
    qdir = os.path.join(
        str(tmp_path / "t"), "_quarantine", f"batch-{quar[0]['batch_id']:09d}"
    )
    with open(os.path.join(qdir, "error.json")) as f:
        assert "ConstraintViolation" in _json.load(f)["error"]
    # no committed row violates
    assert t.read().filter("n_tok < 0").count() == 0


def test_schema_evolution_rejects_breaking_constraint(spark, table):
    """drop/rename of a column referenced by a CHECK constraint must fail
    AT EVOLUTION TIME (not wedge every later write with an unresolved-
    column error); unrelated evolution still works."""
    table.add_constraint("n_tok_nonneg", "n_tok >= 0")
    with pytest.raises(ValueError, match="n_tok_nonneg"):
        table.drop_column("n_tok")
    with pytest.raises(ValueError, match="n_tok_nonneg"):
        table.rename_column("n_tok", "tok_n")
    # unrelated columns evolve fine, and writes keep working
    table.rename_column("source", "origin")
    table.merge(
        dedup_latest(
            _changes_df(spark, [(100, "U", "ok", [1], 1, "web")]).withColumnRenamed(
                "source", "origin"
            )
        )
    )
    assert table.lookup(["ok"]).count() == 1
    # after dropping the constraint, the evolution goes through
    table.drop_constraint("n_tok_nonneg")
    table.drop_column("n_tok")


def test_replay_quarantined_after_fix(spark, tmp_path):
    """T6 second half: a constraint-quarantined batch replays exactly
    once after the operator's transform fixes the rows; rerun is a no-op;
    the quarantine dir keeps the audit data with a _RESOLVED marker."""
    import os

    from pyspark.sql import functions as F

    from omicidx_etl_spark import datagen
    from omicidx_etl_spark.streaming import stream_replay
    from omicidx_etl_spark.streaming.replay import replay_quarantined

    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 3000, 200, seed=17)
    poisoned = ch.withColumn(
        "n_tok",
        F.when(
            (F.col("seq") >= 1000) & (F.col("seq") < 2000) & (F.col("op") != "D"),
            F.lit(-1),
        ).otherwise(F.col("n_tok")),
    )
    datagen.write_change_log(poisoned, log, files=3)
    schema = ch.drop("seq", "op", "event_ts").schema
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key="doc_id", n_buckets=4
    )
    t.add_constraint("n_tok_nonneg", "n_tok >= 0")
    committed = stream_replay(
        spark, t, log, str(tmp_path / "ckpt"), app_id="rq",
        max_files_per_trigger=1,
    )
    n_quar = sum(1 for c in committed if c.get("quarantined"))
    assert n_quar >= 1

    # fix: clamp negatives to 0, then replay the parked batches
    fix = lambda df: df.withColumn(  # noqa: E731
        "n_tok", F.greatest(F.col("n_tok"), F.lit(0))
    )
    out = replay_quarantined(t, app_id="rq", transform=fix)
    assert len(out) == n_quar and all(r["replayed"] for r in out)
    assert t.read().filter("n_tok < 0").count() == 0
    # the fixed rows are actually IN the table now (latest-per-key of the
    # full log with the clamp)
    import duckdb

    exp = duckdb.sql(
        f"""SELECT count(*) FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) rn
          FROM read_parquet('{log}/*.parquet', union_by_name=true))
          WHERE rn = 1 AND op <> 'D'"""
    ).fetchone()[0]
    assert t.read().count() == exp
    # idempotent: nothing left unresolved, rerun visits nothing
    assert replay_quarantined(t, app_id="rq", transform=fix) == []
    qroot = os.path.join(t.root, "_quarantine")
    assert all(
        os.path.exists(os.path.join(qroot, d, "_RESOLVED"))
        for d in os.listdir(qroot)
        if d.startswith("batch-")
    )
