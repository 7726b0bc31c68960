"""Event-time windowed aggregation over the change feed — the reference's
hand-rolled monthly/daily windows (T2, ``omicidx_etl/geo/extract.py:328-353``,
``omicidx_etl/ebi_biosample/extract.py:135-154``) and its "extract up to
yesterday" late-data guard (T3, ``ebi_biosample/extract.py:238-239``),
re-expressed as Structured Streaming tumbling windows with a watermark.

Batch and streaming share one logical definition (``windowed_event_stats``
works on either a static or a streaming DataFrame — the Spark unification
the reference cannot express), so the batch path doubles as the oracle for
the streaming path in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "event_ts",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling- or hopping-window per-source change-rate stats.

    Output: (window_start, window_end, source, n_events, n_deletes,
    n_docs, sum_tokens). Partial aggregation pre-reduces map-side; the
    shuffle key (window, source) is low-cardinality and unskewed by
    construction (windows rotate), so this scales linearly with input.

    ``watermark`` (streaming only): bound state and drop events later than
    the bound — the T3 guard. Omit for batch use.

    ``slide`` (optional): hop interval for overlapping (sliding) windows —
    each event lands in window/slide windows via a narrow Expand (never a
    join against a window dimension); state and output grow by the same
    factor. Omit for tumbling. Batch registry counterpart:
    ``queries.hopping_window_counts``.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide is not None
        else F.window(F.col(ts_col), window)
    )
    return (
        src.groupBy(win.alias("w"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.approx_count_distinct("doc_id").alias("n_docs_approx"),
            F.sum(F.coalesce(F.col("n_tok").cast("long"), F.lit(0))).alias("sum_tokens"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "source",
            "n_events",
            "n_deletes",
            "n_docs_approx",
            "sum_tokens",
        )
    )


def stream_windowed_stats(
    spark,
    log_path: str,
    checkpoint_dir: str,
    out_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    timeout_s: float | None = None,
    slide: str | None = None,
):
    """Run the windowed aggregation as an availableNow stream over the
    change-log directory, appending finalized windows to parquet.

    Append output mode means a window is emitted exactly once, when the
    watermark passes its end — the exactly-once analogue for aggregates
    (complements the LakeTable merge path for row upserts). ``slide``
    makes the windows hopping (overlapping); a window still finalizes
    exactly once, when the watermark passes its own end.
    """
    schema = spark.read.parquet(log_path).schema
    src = spark.readStream.schema(schema).parquet(log_path)
    agg = windowed_event_stats(src, window=window, watermark=watermark, slide=slide)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=timeout_s)
    return q


def session_event_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "event_ts",
    key_col: str = "doc_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows over the change feed: events separated by
    less than ``gap`` merge into one session (``F.session_window`` — the
    variable-length dual of the tumbling T2 windows; SURVEY §2.9).

    Unlike the fixed windows, session state is per-key and unbounded
    without a watermark — streaming callers MUST pass one so closed
    sessions evict. Batch and streaming share this definition, so the
    batch run is the streaming test's oracle. Shuffle key is
    (key, merged-session): map-side partial aggregation applies before the
    merge, and skewed keys split across sessions by construction.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("n_tok").cast("long"), F.lit(0))).alias(
                "sum_tokens"
            ),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_tokens",
        )
    )


def stream_session_stats(
    spark,
    log_path: str,
    checkpoint_dir: str,
    out_path: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "doc_id",
    timeout_s: float | None = None,
):
    """Session aggregation as an availableNow stream: append mode emits a
    session exactly once, when the watermark passes its end."""
    schema = spark.read.parquet(log_path).schema
    src = spark.readStream.schema(schema).parquet(log_path)
    agg = session_event_stats(src, gap=gap, watermark=watermark, key_col=key_col)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=timeout_s)
    return q
