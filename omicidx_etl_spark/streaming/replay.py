"""Structured Streaming replay: tail the change-log directory as a file
stream and apply each micro-batch to the LakeTable exactly once.

Exactly-once story (replaces the reference's done-markers,
``omicidx_etl/sra/catalog.py:291-320``, and fixes their marker-after-data
race): the streaming checkpoint assigns every micro-batch a stable
``batch_id``; ``foreachBatch`` merges with that id and the LakeTable commit
records it atomically in the snapshot (`txn` watermark). A crash between
merge-commit and checkpoint-commit replays the batch on restart — and the
table skips it as already-committed. Either side losing the race is a no-op.

Late/duplicate events are no-ops too: the merge's latest-per-seq dedup plus
upsert semantics make event application idempotent per key (the watermark
analogue of T3, ``ebi_biosample/extract.py:238-239``).

Rate limiting (the reference's bounded channels, ``geo/extract.py:296-302``)
maps to ``maxFilesPerTrigger``/``maxBytesPerTrigger``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from omicidx_etl_spark.cdc.replay import replay_batch
from omicidx_etl_spark.lake.table import LakeTable
from omicidx_etl_spark.lineage import LineageLog


def stream_replay(
    spark: SparkSession,
    table: LakeTable,
    log_path: str,
    checkpoint_dir: str,
    app_id: str = "stream",
    seq: str = "seq",
    op_col: str = "op",
    delete_value: str = "D",
    max_files_per_trigger: int | None = None,
    dedup_method: str = "max_by",
    lineage: LineageLog | None = None,
    timeout_s: float | None = None,
    mode: str = "cow",
) -> list[dict[str, Any]]:
    """Run an availableNow streaming replay of the change-log directory.

    Processes all files not yet recorded in the checkpoint, in micro-batches
    (bounded by ``max_files_per_trigger``), then terminates. Restart with
    the same checkpoint_dir to resume; reprocessing after a crash is
    deduplicated by the table's (app_id, batch_id) watermark.

    Returns the snapshot dicts committed during this run.
    """
    schema = spark.read.parquet(log_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(log_path)

    committed: list[dict[str, Any]] = []

    def apply_batch(batch_df, batch_id: int) -> None:
        snap = replay_batch(
            table,
            batch_df,
            batch_id=batch_id,
            app_id=app_id,
            seq=seq,
            op_col=op_col,
            delete_value=delete_value,
            dedup_method=dedup_method,
            lineage=lineage,
            mode=mode,
        )
        committed.append(snap)

    q = (
        src.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=timeout_s)
    return committed
