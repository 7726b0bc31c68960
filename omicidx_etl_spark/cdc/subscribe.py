"""Changelog subscriptions: the lake table as a SOURCE for downstream
incremental consumers (Delta CDF / Iceberg incremental-read streaming,
reference's daily consolidation-consumer shape
`omicidx_etl/sql/020_consolidate.sql:1-12` — each run picks up exactly the
records landed since the previous run).

A :class:`ChangelogSubscription` is a durable consumer offset (acked
snapshot id) over :meth:`LakeTable.changes`; :func:`replicate` composes it
with a versioned ``merge`` into a second table for exactly-once
table-to-table incremental replication:

- **at-least-once poll**: ``poll()`` returns the net per-key changes in
  ``(acked_sid, current]``; the offset advances only on ``ack()``, so a
  consumer that crashes mid-apply re-reads the same interval.
- **exactly-once apply**: the replica merge is (a) watermarked by
  ``(app_id=replicate:<consumer>, batch_id=to_sid)`` — an identical retry
  of the same interval skips the commit wholesale — and (b) seq-versioned
  per key, so a retry over a *grown* interval re-applies the overlap as
  per-row no-ops. Either way the replica converges to the source.
- **lossiness guards propagate**: a ``purge_tombstones`` or ``rollback``
  inside the un-acked interval raises from ``changes()`` (never a silently
  incomplete replica).

Scale: each poll costs O(changes in the interval) — the changelog scan
reads only dirs added since the acked snapshot — and the replica merge
rewrites only touched buckets. A 10^10-row source with a 10^6-row daily
delta replicates in delta time, never table time.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omicidx_etl_spark.lake.table import LakeTable


class ChangelogSubscription:
    """A named, durable consumer offset over a table's changelog.

    The offset (last acked snapshot id) lives in
    ``<checkpoint_dir>/<consumer_id>.json``, written atomically
    (tmp + rename) so a crash mid-ack leaves the previous offset intact.

    ``start_from``: ``"begin"`` (default) replays history from the
    table's first snapshot — the bootstrap path for a new consumer;
    ``"current"`` subscribes to future changes only; an ``int`` pins an
    explicit snapshot id (e.g. resuming a consumer whose offset store
    moved).
    """

    def __init__(
        self,
        table: LakeTable,
        checkpoint_dir: str,
        consumer_id: str = "default",
        start_from: "str | int" = "begin",
        include_before: bool = False,
    ) -> None:
        self.table = table
        self.consumer_id = consumer_id
        self.include_before = include_before
        self._path = os.path.join(checkpoint_dir, f"{consumer_id}.json")
        os.makedirs(checkpoint_dir, exist_ok=True)
        if not os.path.exists(self._path):
            if start_from == "begin":
                sid = self.table.history()[0]["snapshot_id"]
            elif start_from == "current":
                sid = self.table.snapshot()["snapshot_id"]
            else:
                sid = int(start_from)
            self._write_offset(sid)

    # ------------------------------------------------------------- offsets
    def offset(self) -> int:
        with open(self._path) as f:
            return int(json.load(f)["acked_sid"])

    def _write_offset(self, sid: int) -> None:
        tmp = f"{self._path}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump({"acked_sid": sid, "consumer_id": self.consumer_id}, f)
        os.replace(tmp, self._path)

    def ack(self, to_sid: int) -> None:
        """Advance the durable offset. Call only after the polled interval
        is fully applied downstream; monotonicity is enforced (acking
        backwards would re-deliver already-applied changes to a consumer
        that believes them new)."""
        cur = self.offset()
        if to_sid < cur:
            raise ValueError(f"ack({to_sid}) below current offset {cur}")
        self._write_offset(to_sid)

    # --------------------------------------------------------------- polling
    def poll(self) -> "tuple[DataFrame, int, int] | None":
        """Net per-key changes in ``(offset, current]`` as
        ``(df, from_sid, to_sid)``, or ``None`` when the consumer is
        caught up. ``df`` carries ``_change_type`` and ``_seq`` (the
        source's per-key version — what makes downstream applies
        order-independent), plus ``_before`` when subscribed with
        pre-images."""
        from_sid = self.offset()
        to_sid = self.table.snapshot()["snapshot_id"]
        if to_sid == from_sid:
            return None
        df = self.table.changes(
            from_sid,
            to_sid=to_sid,
            include_seq=True,
            include_before=self.include_before,
        )
        return df, from_sid, to_sid


def replicate(
    sub: ChangelogSubscription,
    dst: LakeTable,
    mode: str = "mor",
) -> "dict[str, Any]":
    """Apply one polled interval of ``sub`` to ``dst`` and ack — incremental
    table-to-table replication (one call = one consumer run; loop it for a
    daemon). Returns ``{"applied": bool, "from_sid", "to_sid", ...merge
    summary}``.

    The changelog rows become a merge batch directly: ``_change_type``
    maps to the op column, the source ``_seq`` is reused as the version —
    so replica rows carry the SOURCE's versions and replication commutes
    with (and is idempotent under) retries, late polls, and overlapping
    intervals. The merge watermark ``(replicate:<consumer>, to_sid)``
    makes the exact-retry case skip without scanning."""
    polled = sub.poll()
    if polled is None:
        return {"applied": False}
    df, from_sid, to_sid = polled
    batch = df.select(
        F.when(F.col("_change_type") == "delete", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("_seq").alias("seq"),
        *[c for c in df.columns if c not in ("_change_type", "_seq", "_before")],
    )
    summary = dst.merge(
        batch,
        app_id=f"replicate:{sub.consumer_id}",
        batch_id=to_sid,
        mode=mode,
    )
    sub.ack(to_sid)
    return {"applied": True, "from_sid": from_sid, "to_sid": to_sid, **summary}
