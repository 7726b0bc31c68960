"""Deep clone: an independent table materialized from one snapshot.

Independence is the contract under test: after clone() returns, nothing the
source does (merges, compaction, retention, deletion) may change the clone,
and vice versa — while the clone must preserve the table's identity
(schema versions + field ids, key/buckets, txn watermarks, constraints,
bounds stats) so every engine feature keeps working on it.
"""

from __future__ import annotations

import shutil

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


def _rows(t, **kw):
    return sorted(
        (r["doc_id"], tuple(r["tokens"] or []), r["n_tok"], r["source"])
        for r in t.read(**kw).collect()
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="doc_id", n_buckets=4)
    t.overwrite(datagen.gen_sequences(spark, 60, seed=11))
    # MOR deltas: an update, a delete, an insert — clone must carry deltas too
    t.merge(
        dedup_latest(
            _changes_df(
                spark,
                [
                    (100, "U", "doc_00000003", [9, 9], 2, "web"),
                    (101, "D", "doc_00000007", None, None, None),
                    (102, "I", "doc_99999999", [1, 2, 3], 3, "books"),
                ],
            )
        ),
        mode="mor",
        app_id="appA",
        batch_id=7,
    )
    return t


def test_clone_equals_source_and_is_independent(spark, table, tmp_path):
    dst_root = str(tmp_path / "dst")
    c = table.clone(dst_root)
    assert _rows(c) == _rows(table)
    src_rows_at_clone = _rows(table)

    # source moves on -> clone unchanged
    table.merge(
        dedup_latest(_changes_df(spark, [(200, "U", "doc_00000001", [5], 1, "web")])),
        mode="mor",
    )
    assert _rows(c) == src_rows_at_clone
    # clone moves on -> source unchanged (beyond its own edit)
    c.merge(
        dedup_latest(_changes_df(spark, [(300, "I", "doc_c", [7], 1, "web")])),
        mode="mor",
    )
    assert ("doc_c", (7,), 1, "web") not in _rows(table)
    assert ("doc_c", (7,), 1, "web") in _rows(c)


def test_clone_survives_source_destruction(spark, table, tmp_path):
    """Deep means deep: compact + expire + rm -rf the source; the clone,
    including its MOR delta chain, still reads byte-identical rows."""
    dst_root = str(tmp_path / "dst2")
    c = table.clone(dst_root)
    want = _rows(table)
    table.compact()
    table.expire_snapshots(keep_last=1, orphan_grace_s=0)
    shutil.rmtree(table.root)
    assert _rows(c) == want
    # the clone's manifest stats survived too: compaction works standalone
    c.compact()
    assert _rows(c) == want


def test_clone_at_historical_snapshot(spark, table, tmp_path):
    """clone(at=sid) == read(as_of=sid): the pre-merge state, not current."""
    sids = [s["snapshot_id"] for s in table.history()]
    base_sid = sorted(sids)[-2]  # snapshot before the MOR merge
    c = table.clone(str(tmp_path / "dst3"), at=base_sid)
    assert _rows(c) == _rows(table, as_of=base_sid)
    assert _rows(c) != _rows(table)


def test_clone_preserves_txn_watermarks_and_constraints(spark, table, tmp_path):
    """An at-most-once producer switching to the clone must not double-apply
    a batch the source absorbed; constraints keep enforcing."""
    table.add_constraint("nonneg", "n_tok >= 0")
    c = table.clone(str(tmp_path / "dst4"))
    want = _rows(c)

    # same (app_id, batch_id) the source already committed -> skipped
    s = c.merge(
        dedup_latest(_changes_df(spark, [(100, "U", "doc_00000003", [0], 1, "web")])),
        mode="mor",
        app_id="appA",
        batch_id=7,
    )
    assert s["summary"].get("skipped") is True
    assert _rows(c) == want

    with pytest.raises(ConstraintViolation):
        c.merge(
            dedup_latest(_changes_df(spark, [(400, "I", "bad", [1], -5, "web")])),
            mode="mor",
        )
    assert _rows(c) == want


def test_clone_refuses_existing_and_double_pin(spark, table, tmp_path):
    dst_root = str(tmp_path / "dst5")
    table.clone(dst_root)
    with pytest.raises(ValueError):
        table.clone(dst_root)
    with pytest.raises(ValueError):
        table.clone(str(tmp_path / "dst6"), at=0, as_of_ts=0.0)


def test_clone_history_is_reset_and_blooms_rebuild(spark, table, tmp_path):
    c = table.clone(str(tmp_path / "dst7"))
    h = c.history()
    assert len(h) == 1 and h[0]["snapshot_id"] == 0
    assert h[0]["summary"]["operation"] == "clone"
    # bloom sidecars were NOT copied (derived artifacts) but rebuild cleanly
    out = c.build_blooms()
    assert out["built"] > 0
    a = sorted(r["doc_id"] for r in c.lookup(["doc_00000003"]).collect())
    assert a == ["doc_00000003"]


def test_clone_job_cli(spark, table, tmp_path, monkeypatch, capsys):
    """jobs/clone_job.py: one JSON line; rerun against the same dest exits
    nonzero without touching the committed clone."""
    import json

    import jobs.clone_job as CJ

    dest = str(tmp_path / "cli_clone")
    monkeypatch.setattr(
        "sys.argv",
        ["clone_job.py", "--src", table.root, "--dest", dest, "--verify-count"],
    )
    assert CJ.main() == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == table.read().count()
    assert out["n_files_copied"] > 0
    assert out["source_snapshot_id"] == table.snapshot()["snapshot_id"]

    assert CJ.main() == 1  # dest exists -> refuse
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "already a table" in err["error"]
    assert _rows(LakeTable.load(spark, dest)) == _rows(table)


def test_clone_job_expired_snapshot_keeps_json_contract(
    spark, table, tmp_path, monkeypatch, capsys
):
    """Review-fix regression: --at pointing at a nonexistent snapshot must
    print the one-line JSON error and exit 1, not traceback."""
    import json

    import jobs.clone_job as CJ

    monkeypatch.setattr(
        "sys.argv",
        ["clone_job.py", "--src", table.root,
         "--dest", str(tmp_path / "nope"), "--at", "999"],
    )
    assert CJ.main() == 1
    err = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in err
