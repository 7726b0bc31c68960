"""Multi-entity orchestration (reference ``SRACatalog.process``,
``omicidx_etl/sra/catalog.py:322-371``): N entity replays, per-entity
failure isolation, raise-at-end summary."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from omicidx_etl_spark import datagen
from omicidx_etl_spark.lineage import LineageLog
from omicidx_etl_spark.orchestrate import (
    EntityBatchError,
    EntitySpec,
    process_entities,
)


def _spec(spark, tmp_path, name, poison=False):
    log = str(tmp_path / f"log_{name}")
    if poison:
        # unreadable change log: the entity's replay must fail outright
        import os

        os.makedirs(log, exist_ok=True)
        with open(f"{log}/part-0.parquet", "wb") as f:
            f.write(b"this is not parquet")
    else:
        ch = datagen.gen_changes(spark, 500, 100, seed=hash(name) % 1000)
        datagen.write_change_log(ch, log, files=2)
    return EntitySpec(
        name=name,
        log_path=log,
        table_root=str(tmp_path / f"table_{name}"),
        n_buckets=4,
        chunk_events=300,
    )


def test_poisoned_entity_does_not_block_batch(spark, tmp_path):
    specs = [
        _spec(spark, tmp_path, "study"),
        _spec(spark, tmp_path, "sample", poison=True),
        _spec(spark, tmp_path, "run"),
    ]
    with pytest.raises(EntityBatchError) as exc:
        process_entities(spark, specs)
    summary = exc.value.summary
    assert summary["total"] == 3
    assert summary["succeeded"] == 2
    assert [f["entity"] for f in summary["failures"]] == ["sample"]
    assert "sample" in str(exc.value)
    # the two healthy entities committed real tables
    from omicidx_etl_spark.lake import LakeTable

    for name in ("study", "run"):
        t = LakeTable.load(spark, str(tmp_path / f"table_{name}"))
        assert t.read().count() > 0
    # the failure is auditable in the failed entity's own lineage
    lin = LineageLog(str(tmp_path / "table_sample")).read(spark)
    fail_rows = lin.filter(F.col("operation") == "entity_failure").collect()
    assert len(fail_rows) == 1
    assert "sample" == fail_rows[0]["app_id"]


def test_all_green_returns_summary(spark, tmp_path):
    specs = [_spec(spark, tmp_path, n) for n in ("a", "b")]
    summary = process_entities(spark, specs)
    assert summary["failed"] == 0
    assert {r["entity"] for r in summary["results"]} == {"a", "b"}
    assert all(r["events"] == 500 for r in summary["results"])


def test_lineage_file_checksums_match_recomputed(spark, tmp_path):
    """checksums=True records (path, bytes, md5) per written data file;
    they must equal an independent re-hash of the files on disk."""
    import hashlib
    import os

    from omicidx_etl_spark.cdc import replay_log
    from omicidx_etl_spark.lake import LakeTable

    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 400, 80, seed=7)
    datagen.write_change_log(ch, log, files=2)
    root = str(tmp_path / "t")
    schema = ch.drop("seq", "op", "event_ts").schema
    t = LakeTable.create(spark, root, schema, key="doc_id", n_buckets=4)
    lin = LineageLog(root, checksums=True)
    replay_log(spark, t, log, chunk_events=200, app_id="ck", lineage=lin)

    rows = lin.read(spark).filter(F.col("files_json").isNotNull()).collect()
    assert rows, "no lineage rows carry file checksums"
    n_files = 0
    for r in rows:
        for e in json.loads(r["files_json"]):
            full = os.path.join(root, e["path"])
            data = open(full, "rb").read()
            assert len(data) == e["bytes"]
            assert hashlib.md5(data).hexdigest() == e["md5"]
            n_files += 1
    assert n_files > 0
