"""Stream-stream interval join: correlate a change event with the
follow-up events that land on the same key within a time horizon.

The reference correlates feeds only by staging both sides and joining in
DuckDB afterwards (e.g. GEO supplementary files matched to series rows in
``sql/040_geometadb_views.sql``); Structured Streaming can do it online —
two watermarked streams, an equi key plus an event-time range predicate.
The range bound is what makes this scale: each side's state is evicted
once the other side's watermark passes ``ts + horizon``, so state is
O(events in the horizon window), never O(history).

Batch and streaming share the logical definition; the batch path is the
streaming path's oracle in tests (same contract as ``windows.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def followup_join(
    base: DataFrame,
    followups: DataFrame,
    key_col: str = "doc_id",
    ts_col: str = "event_ts",
    horizon: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Inner-join ``base`` events to every ``followups`` event on the same
    key with ``base.ts <= follow.ts <= base.ts + horizon``.

    Output: (key, base_seq, base_op, followup_seq, followup_op, lag_us).
    ``lag_us`` is MICROSECONDS (unix_micros difference) — divide by 1e6
    for seconds.

    ``watermark`` (streaming only): applied to BOTH sides — Spark requires
    watermarks on each stream plus the time-range condition to bound join
    state. Omit for batch use.

    Scale note: the join shuffles both sides on the key; a hot key widens
    one state partition but the range predicate still caps retained rows
    to the horizon window. For severely skewed keys, pre-salt the base
    side the way ``cdc.replay`` salts its merge.
    """
    b, f_ = base, followups
    if watermark is not None:
        b = b.withWatermark(ts_col, watermark)
        f_ = f_.withWatermark(ts_col, watermark)
    b = b.select(
        F.col(key_col).alias("k"),
        F.col("seq").alias("base_seq"),
        F.col("op").alias("base_op"),
        F.col(ts_col).alias("base_ts"),
    )
    f_ = f_.select(
        F.col(key_col).alias("fk"),
        F.col("seq").alias("followup_seq"),
        F.col("op").alias("followup_op"),
        F.col(ts_col).alias("followup_ts"),
    )
    joined = b.join(
        f_,
        (F.col("k") == F.col("fk"))
        & (F.col("followup_ts") >= F.col("base_ts"))
        & (F.col("followup_ts") <= F.col("base_ts") + F.expr(f"interval {horizon}")),
    )
    return joined.select(
        F.col("k").alias(key_col),
        "base_seq",
        "base_op",
        "followup_seq",
        "followup_op",
        (F.unix_micros("followup_ts") - F.unix_micros("base_ts")).alias("lag_us"),
    )


def stream_followup_join(
    spark,
    log_path: str,
    checkpoint_dir: str,
    out_path: str,
    key_col: str = "doc_id",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    timeout_s: float | None = None,
):
    """availableNow stream-stream join over the change log: inserts ('I')
    joined to the updates/deletes that follow them within ``horizon``,
    appended to parquet as matches finalize."""
    schema = spark.read.parquet(log_path).schema
    src = spark.readStream.schema(schema).parquet(log_path)
    base = src.filter(F.col("op") == "I")
    foll = src.filter(F.col("op") != "I")
    out = followup_join(
        base, foll, key_col=key_col, horizon=horizon, watermark=watermark
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=timeout_s)
    return q
