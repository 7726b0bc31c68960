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
- **retention-safe bootstrap**: ``start_from="begin"`` replays the
  changelog only when the table's CREATION snapshot is still retained;
  once ``expire_snapshots`` has truncated history, the changelog can no
  longer prove completeness from the oldest retained snapshot (keys last
  modified at or before it would silently never appear), so the first
  poll instead delivers a FULL-STATE image of the current snapshot as
  upserts carrying the stored per-row seqs (the Delta CDF
  "initial snapshot then changes" semantics) and increments follow.

Scale: each poll costs O(changes in the interval) — the changelog scan
reads only dirs added since the acked snapshot — and the replica merge
rewrites only touched buckets. A 10^10-row source with a 10^6-row daily
delta replicates in delta time, never table time (the snapshot-image
bootstrap is the one intentionally O(table) poll).
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from omicidx_etl_spark.lake.table import (
    DELETED_COL,
    SEQ_COL,
    LakeTable,
    atomic_write_json,
)


class ChangelogSubscription:
    """A named, durable consumer offset over a table's changelog.

    The offset (last acked snapshot id) lives in
    ``<checkpoint_dir>/<consumer_id>.json``, written atomically
    (tmp + rename) so a crash mid-ack leaves the previous offset intact.

    ``start_from``: ``"begin"`` (default) bootstraps a new consumer —
    changelog replay from the creation snapshot when retention still
    holds it, otherwise a full-state snapshot image first (see module
    docstring); ``"current"`` subscribes to future changes only; an
    ``int`` pins an explicit snapshot id (e.g. resuming a consumer whose
    offset store moved — the caller asserts that id's changelog suffix
    is sufficient).
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
            pending = False
            if start_from == "begin":
                first = self.table.history()[0]
                if first.get("parent_id") is None:
                    sid = first["snapshot_id"]
                else:
                    # retention truncated history: changelog replay from
                    # the oldest RETAINED snapshot would silently miss
                    # every key last modified at or before it — deliver a
                    # snapshot image first instead
                    sid = None
                    pending = True
            elif start_from == "current":
                sid = self.table.snapshot()["snapshot_id"]
            else:
                sid = int(start_from)
            self._write_offset(sid, pending)

    # ------------------------------------------------------------- offsets
    def _state(self) -> dict[str, Any]:
        with open(self._path) as f:
            return json.load(f)

    def offset(self) -> "int | None":
        """Last acked snapshot id (None while a snapshot-image bootstrap
        is still pending its first ack)."""
        return self._state()["acked_sid"]

    def bootstrap_pending(self) -> bool:
        return bool(self._state().get("bootstrap_pending"))

    def _write_offset(self, sid: "int | None", pending: bool = False) -> None:
        atomic_write_json(
            self._path,
            {
                "acked_sid": sid,
                "bootstrap_pending": pending,
                "consumer_id": self.consumer_id,
            },
        )

    def ack(self, to_sid: int) -> None:
        """Advance the durable offset. Call only after the polled interval
        (or bootstrap image) is fully applied downstream; monotonicity is
        enforced (acking backwards would re-deliver already-applied
        changes to a consumer that believes them new)."""
        cur = self.offset()
        if cur is not None and to_sid < cur:
            raise ValueError(f"ack({to_sid}) below current offset {cur}")
        self._write_offset(to_sid, pending=False)

    # --------------------------------------------------------------- polling
    def poll(self) -> "tuple[DataFrame, int | None, int] | None":
        """Changes since the offset as ``(df, from_sid, to_sid)``, or
        ``None`` when caught up. ``df`` carries ``_change_type`` and
        ``_seq`` (the source's per-key version — what makes downstream
        applies order-independent), plus ``_before`` when subscribed with
        pre-images. A pending snapshot-image bootstrap returns the full
        current state as upserts with ``from_sid=None`` (no pre-images —
        every row is an initial load)."""
        st = self._state()
        to_sid = self.table.snapshot()["snapshot_id"]
        if st.get("bootstrap_pending"):
            full = self.table.read(include_system=True)
            cols = [c for c in full.columns if c not in (SEQ_COL, DELETED_COL)]
            df = full.select(
                *cols,
                F.lit("upsert").alias("_change_type"),
                F.col(SEQ_COL).alias("_seq"),
            )
            return df, None, to_sid
        from_sid = st["acked_sid"]
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
    daemon). Returns ``{"applied": bool, "from_sid", "to_sid", "summary":
    <merge commit summary>}`` — a compact record safe to log/JSON-encode
    every run (never the replica's full snapshot manifest).

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
    commit = dst.merge(
        batch,
        app_id=f"replicate:{sub.consumer_id}",
        batch_id=to_sid,
        mode=mode,
    )
    sub.ack(to_sid)
    return {
        "applied": True,
        "from_sid": from_sid,
        "to_sid": to_sid,
        "summary": commit.get("summary"),
    }
