"""Custom stateful streaming operator (applyInPandasWithState): running
per-doc stats must accumulate across micro-batches and equal the batch
groupBy over the full feed; state must survive a query restart from the
same checkpoint."""

from __future__ import annotations

from pyspark.sql import functions as F

from omicidx_etl_spark import datagen
from omicidx_etl_spark.streaming import doc_change_stats


def _run_stream(spark, log, ckpt, out_dir, max_files=None):
    """Drive the stateful operator with availableNow; land every update in
    parquet via foreachBatch (memory sink can't recover from checkpoints).
    Returns a DataFrame of all updates this run emitted."""
    reader = spark.readStream.schema(spark.read.parquet(log).schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    stream = reader.parquet(log)

    def land(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        doc_change_stats(stream)
        .writeStream.foreachBatch(land)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    try:
        return spark.read.parquet(out_dir)
    except Exception:
        return spark.createDataFrame(
            [], "doc_id string, n_events long, n_deletes long, max_seq long"
        )


def test_stateful_running_stats_match_batch(spark, tmp_path):
    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 5000, 300, seed=17)
    datagen.write_change_log(ch, log, files=6)

    updates = _run_stream(
        spark, log, str(tmp_path / "ckpt"), str(tmp_path / "out"), max_files=2
    )

    # update mode emits one row per (batch, doc) update; the LAST update
    # per doc is the running total after the final batch
    got = (
        updates
        .groupBy("doc_id")
        .agg(
            F.max_by(F.struct("n_events", "n_deletes", "max_seq"), "n_events").alias("s")
        )
        .select("doc_id", "s.n_events", "s.n_deletes", "s.max_seq")
    )
    exp = (
        spark.read.parquet(log)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_deletes"),
            F.max("seq").alias("max_seq"),
        )
    )
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_stateful_resumes_from_checkpoint(spark, tmp_path):
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    ch = datagen.gen_changes(spark, 2000, 150, seed=23)
    datagen.write_change_log(ch, log, files=3)

    # first query consumes everything; a restart from the same checkpoint
    # must find no new data AND keep (not reset) its state store
    out1 = str(tmp_path / "o1")
    n1 = _run_stream(spark, log, ckpt, out1, max_files=1).count()
    assert n1 > 0

    out2 = str(tmp_path / "o2")
    assert _run_stream(spark, log, ckpt, out2, max_files=1).count() == 0

    # append more events for a subset of docs -> resumed query continues
    # counting on top of restored state (not from zero)
    extra = (
        spark.read.parquet(log)
        .orderBy(F.desc("seq"))
        .limit(50)
        .withColumn("seq", F.col("seq") + F.lit(10_000_000))
    )
    extra.write.mode("append").parquet(log)
    upd = _run_stream(spark, log, ckpt, str(tmp_path / "o3"), max_files=1)
    assert upd.count() > 0
    full = (
        spark.read.parquet(log)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("seq").alias("max_seq"))
    )
    joined = upd.alias("u").join(full.alias("f"), "doc_id")
    bad = joined.filter(
        (F.col("u.n_events") != F.col("f.n_events"))
        | (F.col("u.max_seq") != F.col("f.max_seq"))
    )
    assert bad.count() == 0
