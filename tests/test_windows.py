"""Windowed event-time aggregation (T2/T3): the streaming path with a
watermark must emit exactly the windows the shared batch definition
computes, and a DuckDB time_bucket oracle must agree with the batch path."""

from __future__ import annotations

import duckdb

from omicidx_etl_spark import datagen
from omicidx_etl_spark.streaming import stream_windowed_stats, windowed_event_stats


def test_batch_windows_match_duckdb(spark, tmp_path):
    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 5000, 300, seed=41)
    datagen.write_change_log(ch, log, files=4)

    got = (
        windowed_event_stats(spark.read.parquet(log), window="10 minutes")
        .select("window_start", "source", "n_events", "n_deletes", "sum_tokens")
        .toPandas()
        .sort_values(["window_start", "source"], na_position="last")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT time_bucket(INTERVAL 10 MINUTE, event_ts) AS window_start,
               source,
               COUNT(*) AS n_events,
               SUM(CASE WHEN op='D' THEN 1 ELSE 0 END) AS n_deletes,
               SUM(COALESCE(n_tok, 0)) AS sum_tokens
        FROM read_parquet('{log}/*.parquet')
        GROUP BY 1, 2
        """
    ).df().sort_values(["window_start", "source"], na_position="last").reset_index(drop=True)
    # D events have null source -> grouped under null on both sides
    assert len(got) == len(exp)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["n_deletes"].astype(int).tolist() == exp["n_deletes"].astype(int).tolist()
    assert got["sum_tokens"].astype(int).tolist() == exp["sum_tokens"].astype(int).tolist()
    assert [str(t) for t in got["window_start"]] == [str(t) for t in exp["window_start"]]


def test_stream_windows_match_batch(spark, tmp_path):
    """availableNow stream with watermark == batch aggregation (all windows
    finalize because the stream ends past the watermark)."""
    log = str(tmp_path / "log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ch = datagen.gen_changes(spark, 5000, 300, seed=42)
    datagen.write_change_log(ch, log, files=4)

    stream_windowed_stats(
        spark, log, ckpt, out, window="10 minutes", watermark="5 minutes"
    )
    got = (
        spark.read.parquet(out)
        .orderBy("window_start", "source")
        .toPandas()
    )
    exp = (
        windowed_event_stats(spark.read.parquet(log), window="10 minutes")
        .orderBy("window_start", "source")
        .toPandas()
    )
    # append mode holds back windows the watermark hasn't passed: up to the
    # last two windows per source (watermark < window here) stay buffered
    assert 0 < len(got) and len(exp) - len(got) <= 2 * len(exp["source"].unique())
    merged = exp.merge(
        got, on=["window_start", "source"], suffixes=("_b", "_s"), how="inner"
    )
    assert len(merged) == len(got)
    for c in ["n_events", "n_deletes", "sum_tokens"]:
        assert merged[f"{c}_b"].tolist() == merged[f"{c}_s"].tolist()


def test_batch_sessions_match_duckdb(spark, tmp_path):
    """session_window semantics vs a lag-gap oracle: merge iff gap < 10min
    (window ends exclusive -> oracle splits on gap >= 10min)."""
    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 4000, 50, seed=43)
    datagen.write_change_log(ch, log, files=4)
    from omicidx_etl_spark.streaming import session_event_stats

    got = (
        session_event_stats(spark.read.parquet(log), gap="10 minutes")
        .orderBy("doc_id", "session_start")
        .toPandas()
    )
    exp = duckdb.sql(
        f"""
        WITH g AS (
          SELECT doc_id, event_ts, n_tok,
                 epoch_us(event_ts) - LAG(epoch_us(event_ts))
                   OVER (PARTITION BY doc_id ORDER BY event_ts, seq) AS gap_us,
                 seq
          FROM read_parquet('{log}/*.parquet')
        ), s AS (
          SELECT doc_id, event_ts, n_tok,
                 SUM(CASE WHEN gap_us IS NULL OR gap_us >= 600000000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY event_ts, seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM g
        )
        SELECT doc_id, MIN(event_ts) AS session_start,
               COUNT(*) AS n_events,
               SUM(COALESCE(n_tok, 0)) AS sum_tokens
        FROM s GROUP BY doc_id, sid
        ORDER BY doc_id, session_start
        """
    ).df()
    assert len(got) == len(exp)
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    assert got["sum_tokens"].astype(int).tolist() == exp["sum_tokens"].astype(int).tolist()
    assert [str(t) for t in got["session_start"]] == [str(t) for t in exp["session_start"]]


def test_stream_sessions_match_batch(spark, tmp_path):
    """availableNow session stream == batch definition for every session
    the watermark finalized (append mode holds back open tails)."""
    log = str(tmp_path / "log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ch = datagen.gen_changes(spark, 4000, 50, seed=44)
    datagen.write_change_log(ch, log, files=4)
    from omicidx_etl_spark.streaming import session_event_stats, stream_session_stats

    stream_session_stats(
        spark, log, ckpt, out, gap="10 minutes", watermark="5 minutes"
    )
    got = spark.read.parquet(out).toPandas()
    exp = (
        session_event_stats(spark.read.parquet(log), gap="10 minutes")
        .toPandas()
    )
    assert 0 < len(got) <= len(exp)
    merged = exp.merge(
        got, on=["doc_id", "session_start"], suffixes=("_b", "_s"), how="inner"
    )
    assert len(merged) == len(got)
    for c in ["n_events", "sum_tokens"]:
        assert merged[f"{c}_b"].tolist() == merged[f"{c}_s"].tolist()


def test_batch_hopping_windows_match_duckdb(spark, tmp_path):
    """slide= makes the windows hopping: every event lands in exactly
    window/slide overlapping windows; DuckDB oracle materializes the same
    epoch-aligned starts arithmetically."""
    log = str(tmp_path / "log")
    ch = datagen.gen_changes(spark, 5000, 300, seed=43)
    datagen.write_change_log(ch, log, files=4)

    got = (
        windowed_event_stats(
            spark.read.parquet(log), window="10 minutes", slide="5 minutes"
        )
        .select("window_start", "source", "n_events", "sum_tokens")
        .toPandas()
        .sort_values(["window_start", "source"], na_position="last")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        WITH e AS (
          SELECT epoch_us(event_ts) AS us, source, COALESCE(n_tok, 0) AS nt
          FROM read_parquet('{log}/*.parquet')),
        w AS (
          SELECT source, nt,
                 unnest([(us // 300000000) * 300000000,
                         (us // 300000000) * 300000000 - 300000000]) AS ws
          FROM e)
        SELECT to_timestamp(ws // 1000000) AT TIME ZONE 'UTC' AS window_start,
               source, COUNT(*) AS n_events, SUM(nt) AS sum_tokens
        FROM w GROUP BY 1, 2
        """
    ).df().sort_values(["window_start", "source"], na_position="last").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["n_events"].tolist() == exp["n_events"].astype(int).tolist()
    assert got["sum_tokens"].astype(int).tolist() == exp["sum_tokens"].astype(int).tolist()
    # every event is counted twice overall vs the tumbling total
    assert int(got["n_events"].sum()) == 2 * 5000


def test_stream_hopping_windows_match_batch(spark, tmp_path):
    """Hopping stream with watermark == the shared batch definition, and
    each finalized window is emitted exactly once (no duplicates across
    the overlap)."""
    log = str(tmp_path / "log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ch = datagen.gen_changes(spark, 5000, 300, seed=44)
    datagen.write_change_log(ch, log, files=4)

    stream_windowed_stats(
        spark, log, ckpt, out,
        window="10 minutes", slide="5 minutes", watermark="5 minutes",
    )
    got = spark.read.parquet(out).orderBy("window_start", "source").toPandas()
    exp = (
        windowed_event_stats(
            spark.read.parquet(log), window="10 minutes", slide="5 minutes"
        )
        .orderBy("window_start", "source")
        .toPandas()
    )
    assert 0 < len(got) <= len(exp)
    assert not got.duplicated(["window_start", "source"]).any()
    merged = exp.merge(
        got, on=["window_start", "source"], suffixes=("_b", "_s"), how="inner"
    )
    assert len(merged) == len(got)
    for c in ["n_events", "n_deletes", "sum_tokens"]:
        assert merged[f"{c}_b"].tolist() == merged[f"{c}_s"].tolist()
