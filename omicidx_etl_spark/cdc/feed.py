"""Apply an exported CDC feed (``jobs/export_changes_job.py`` drops) to a
lake table — the inbound half of file-based cross-system replication:
two clusters that share no storage exchange changelogs as NDJSON.gz
interval drops (export on one side, ``apply_feed`` on the other), each
drop applied exactly once.

Contract consumed: ``<feed>/interval-<from>-<to>/`` dirs with a
``_DONE`` marker (dirs without one are in-flight exports — skipped,
never half-read), rows carrying ``_change_type`` ∈ {upsert, delete} and
``_seq`` (the SOURCE's per-key version). Applying re-uses the versioned
``merge``: each drop commits under ``(app_id=feed:<name>, batch_id=
to_sid)``, so re-running over the whole feed dir skips already-applied
drops wholesale, and out-of-order / overlapping drops converge via
per-row seq no-ops — the same exactly-once argument as
``cdc.replicate`` (tests/test_subscribe.py), transported over files.
"""

from __future__ import annotations

import os
import re
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql import types as T

from omicidx_etl_spark.lake.table import LakeTable

_DIR_RE = re.compile(r"^interval-(begin|\d+)-(\d+)$")


def list_drops(feed_dir: str) -> "list[tuple[int, str]]":
    """Completed (``_DONE``-marked) interval drops, ordered by to_sid."""
    out: list[tuple[int, str]] = []
    if not os.path.isdir(feed_dir):
        return out
    for name in os.listdir(feed_dir):
        m = _DIR_RE.match(name)
        path = os.path.join(feed_dir, name)
        if m and os.path.exists(os.path.join(path, "_DONE")):
            out.append((int(m.group(2)), path))
    return sorted(out)


def apply_feed(
    table: LakeTable,
    feed_dir: str,
    consumer_id: str = "import",
    mode: str = "mor",
) -> "list[dict[str, Any]]":
    """Apply every completed drop not yet applied; returns one record per
    drop: {"to_sid", "dir", "applied"(False = watermark skip)}."""
    results: list[dict[str, Any]] = []
    app_id = f"feed:{consumer_id}"
    # explicit read schema (table payload + feed columns): inference on a
    # deletes-only drop would type the all-null payload columns as string
    # and the merge's cast to array/struct types would fail; `_before`
    # (pre-image exports) is simply not projected
    snap = table.snapshot()
    read_schema = T.StructType(
        list(table.current_schema(snap).fields)
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_seq", T.LongType()),
        ]
    )
    for to_sid, path in list_drops(feed_dir):
        df = table.spark.read.schema(read_schema).json(path)
        batch = df.select(
            F.when(F.col("_change_type") == "delete", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("_seq").cast("long").alias("seq"),
            *[
                c
                for c in df.columns
                if c not in ("_change_type", "_seq", "_before")
            ],
        )
        commit = table.merge(batch, app_id=app_id, batch_id=to_sid, mode=mode)
        summ = commit.get("summary") or {}
        results.append(
            {
                "to_sid": to_sid,
                "dir": path,
                "applied": not summ.get("skipped"),
            }
        )
    return results
