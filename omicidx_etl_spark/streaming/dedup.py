"""Ingest-edge deduplication of redelivered change events.

An at-least-once feed (the reference's retried HTTP fetches —
``omicidx_etl/ebi_biosample/extract.py:58-64`` retries a page up to 10
times, and a crash between land and marker re-lands the whole page,
``omicidx_etl/sra/catalog.py:291-320``) can deliver the same change event
twice. The replay merge is idempotent to exact redelivery (latest-per-key
wins either way), but every duplicate still costs shuffle + merge work
downstream — at 10^10 events a 1% redelivery rate is 10^8 wasted rows per
replay. The right place to drop them is the ingest edge, with *bounded*
state: ``dropDuplicatesWithinWatermark`` keeps a key's dedup state only
until the watermark passes it, so state is O(events within the delay
horizon), not O(all history) — the scalable contrast to a global
``dropDuplicates`` whose state grows forever.

Batch and streaming share one logical definition (the batch path is the
oracle for the streaming path in tests), mirroring ``windows.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_redelivered(
    events: DataFrame,
    keys: Sequence[str] = ("doc_id", "seq"),
    ts_col: str = "event_ts",
    within: str | None = None,
) -> DataFrame:
    """Drop redelivered copies of the same change event.

    ``(doc_id, seq)`` identifies an event in the log contract (same
    upstream change, same payload), so "duplicate" is exact redelivery,
    and keeping an arbitrary copy is correct.

    ``within`` (streaming only): the redelivery horizon. Events are
    deduplicated against copies whose event time falls inside the
    watermark delay; state for older keys is evicted. Omit for batch use
    (plain ``dropDuplicates`` — exact, but unbounded state if used on a
    stream, hence never used there).
    """
    if within is not None:
        return events.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))


def stream_dedup_events(
    spark,
    log_path: str,
    checkpoint_dir: str,
    out_path: str,
    keys: Sequence[str] = ("doc_id", "seq"),
    within: str = "30 minutes",
    timeout_s: float | None = None,
):
    """availableNow stream: read the (possibly redelivered) change log,
    drop duplicate deliveries within the watermark horizon, append the
    cleaned feed to parquet.

    Dedup is BEST-EFFORT beyond the watermark horizon: a copy delivered
    after the watermark has passed its event time is emitted, not dropped
    (``dropDuplicatesWithinWatermark`` evicts key state at the horizon —
    verified empirically under multi-batch maxFilesPerTrigger runs and
    checkpoint restarts). No event is ever lost, but consumers of the feed
    must either tolerate residual duplicates (``stream_replay``'s
    idempotent merge does) or run a batch ``dedup_redelivered`` pass
    before non-idempotent use."""
    schema = spark.read.parquet(log_path).schema
    src = spark.readStream.schema(schema).parquet(log_path)
    clean = dedup_redelivered(src, keys=keys, within=within)
    q = (
        clean.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=timeout_s)
    return q
