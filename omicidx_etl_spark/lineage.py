"""Per-commit lineage/metrics log — the engine's AssetMetadata analogue.

The reference persists per-asset metadata (row_count, checksum,
upstream_assets, runtime_seconds — ``omicidx_etl/biosample/asset_metadata.py:8-45``)
and done-marker payloads (completed_at, parts_written —
``omicidx_etl/sra/catalog.py:310-318``). Here every commit appends one row to
a parquet ``_lineage`` log next to the table (FIXTURES.md §A4), written
driver-side (one tiny row per commit; no Spark job needed).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = pa.schema(
    [
        ("app_id", pa.string()),
        ("batch_id", pa.int64()),
        ("snapshot_id", pa.int64()),
        ("operation", pa.string()),
        ("seq_lo", pa.int64()),
        ("seq_hi", pa.int64()),
        ("event_count", pa.int64()),
        ("delete_events", pa.int64()),
        ("rows_written", pa.int64()),
        ("upserted_rows", pa.int64()),
        ("touched_buckets", pa.int64()),
        ("skipped", pa.bool_()),
        ("duration_s", pa.float64()),
        ("events_per_s", pa.float64()),
        ("committed_at", pa.timestamp("us", tz="UTC")),
        ("summary_json", pa.string()),
    ]
)


class LineageLog:
    def __init__(self, root: str):
        self.dir = os.path.join(root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def record(
        self,
        app_id: str,
        batch_id: int,
        snapshot: dict[str, Any],
        duration_s: float,
    ) -> None:
        s = snapshot.get("summary", {})
        ev = s.get("event_count")
        row = {
            "app_id": app_id,
            "batch_id": batch_id,
            "snapshot_id": snapshot.get("snapshot_id"),
            "operation": s.get("operation"),
            "seq_lo": s.get("seq_lo"),
            "seq_hi": s.get("seq_hi"),
            "event_count": ev,
            "delete_events": s.get("delete_events"),
            "rows_written": s.get("rows_written"),
            "upserted_rows": s.get("upserted_rows"),
            "touched_buckets": s.get("touched_buckets"),
            "skipped": bool(s.get("skipped", False)),
            "duration_s": duration_s,
            "events_per_s": (ev / duration_s) if ev and duration_s > 0 else None,
            "committed_at": int(time.time() * 1e6),
            "summary_json": json.dumps(s),
        }
        table = pa.Table.from_pylist([row], schema=LINEAGE_SCHEMA)
        pq.write_table(
            table, os.path.join(self.dir, f"commit-{uuid.uuid4().hex}.parquet")
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.dir)
