"""CDC replay: ordered, deduplicated, delete-aware application of a
binlog/WAL-style change log onto a LakeTable.

Semantics (transcribed from the reference, re-expressed Spark-first):
- latest event per key wins — the reference's
  ``row_number() OVER (PARTITION BY key ORDER BY recency DESC) … rn=1``
  (``omicidx_etl/sql/010_raw_to_parquet.sql:36-43``);
- deletes are tombstones — ``WHERE delete IS NOT TRUE``
  (``omicidx_etl/sql/010_raw_to_parquet.sql:341``);
- replay is idempotent/resumable — done-marker skip guards
  (``omicidx_etl/sra/catalog.py:291-297``) become the LakeTable's atomic
  per-app batch watermark.

Dedup strategies
----------------
``max_by`` (default): ``groupBy(key).agg(max_by(struct(*), seq))``.
  Hash aggregation with **map-side partial combine** — every hot key is
  pre-reduced inside each input partition before the shuffle, so Zipf-hot
  keys never concentrate on one reducer. This is the skew answer for the
  dedup stage: salting is built into the execution model (partial agg ≡
  per-partition salt + final reduce) without a second shuffle.
``window``: the literal transcription of the reference's W1 (row_number).
  Correct but shuffles *all* events of a hot key to one task — kept for
  parity testing and to demonstrate the skew difference in the bench.
``salted_window``: two-phase explicit salt — window over (key, salt) then
  final max_by over key. Useful when the payload is too wide for an
  aggregation buffer; shown in the bench for the north rule's
  "salted repartitioning" evidence.
``prefilter``: two-pass winner join — a *narrow* aggregation (key, seq
  only; Catalyst prunes the scan to two columns) finds each key's winning
  seq, then the wide rows are inner-joined against the broadcast winner
  set. The wide payload (kB-scale token arrays) never enters an
  aggregation buffer or a shuffle — the cheapest path when the per-batch
  distinct-key set fits a broadcast (~tens of MB; chunk sizes up to a few
  million events). Skew-immune twice over: the narrow agg partial-combines
  hot keys map-side, and a broadcast join has no shuffle to skew. For
  chunks whose winner set exceeds broadcast size, use ``max_by``.
  Precondition: ``seq`` is unique per key within the batch (true for any
  WAL/binlog feed, where seq is the log offset) — a (key, seq) tie would
  surface both rows where the other strategies arbitrarily keep one.
"""

from __future__ import annotations

import os
import time
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from omicidx_etl_spark.progress import LogProgress

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from omicidx_etl_spark.lake.table import _WIDEN_OK, BUCKET_COL, LakeTable, bucket_expr

DEFAULT_SALT = 16


def evolve_to_batch_schema(
    table: LakeTable,
    batch: DataFrame,
    op_col: str = "op",
    seq: str = "seq",
) -> list[str]:
    """Schema-drift handling for a change feed (Delta ``mergeSchema`` /
    Iceberg ``schema.auto-evolve`` analogue): diff the batch's payload
    columns against the table schema and apply the SAFE evolutions through
    the table's schema-update APIs —

    * a column the table lacks → ``add_column`` (nullable; historical rows
      read back NULL);
    * a column whose incoming type is a legal widening of the stored type
      (the Iceberg-compatible ``_WIDEN_OK`` set) → ``widen_column``;
    * incoming NARROWER than stored → no-op (``merge`` casts up);
    * anything else (string→int, narrowing, struct change) → ``ValueError``
      — drift that would lose or reinterpret data is a human decision, the
      poison-batch quarantine path in streaming (reference: the upstream
      schema-change failures the per-day extract loop hits,
      ``omicidx_etl/ebi_biosample/README.md`` §Error Handling).

    Returns the list of applied evolution descriptions (empty = no drift).
    """
    cur = {f.name: f.dataType for f in table.current_schema().fields}
    applied: list[str] = []
    for f in batch.schema.fields:
        if f.name in (op_col, seq) or f.name.startswith("__"):
            continue
        if f.name not in cur:
            table.add_column(f.name, f.dataType)
            applied.append(f"add {f.name} {f.dataType.simpleString()}")
            continue
        have, want = cur[f.name].simpleString(), f.dataType.simpleString()
        if have == want:
            continue
        if (have, want) in _WIDEN_OK:
            table.widen_column(f.name, f.dataType)
            applied.append(f"widen {f.name} {have}->{want}")
        elif (want, have) in _WIDEN_OK:
            pass  # incoming narrower: merge casts it up losslessly
        else:
            raise ValueError(
                f"incompatible schema drift on {f.name!r}: table has {have}, "
                f"batch has {want} — not in the safe evolution set"
            )
    return applied


def _obs_stats(m: dict[str, Any]) -> dict[str, Any]:
    return {
        "event_count": int(m.get("event_count") or 0),
        "seq_lo": int(m["seq_lo"]) if m.get("seq_lo") is not None else None,
        "seq_hi": int(m["seq_hi"]) if m.get("seq_hi") is not None else None,
        "delete_events": int(m.get("delete_events") or 0),
    }


def _obs_stats_safe(obs: Observation) -> dict[str, Any]:
    """Observation fetch that tolerates AQE empty-relation propagation:
    when a batch is empty, AQE can elide the entire map stage (verified on
    Spark 4.1: observe → repartition → write over an empty input never
    runs the observe node), so the metrics row does not exist and the JVM
    side returns null. An elided stage means zero input events — report
    exactly that instead of failing the commit."""
    try:
        return _obs_stats(obs.get)
    except Exception:  # noqa: BLE001 — null metrics row from an elided stage
        return {"event_count": 0, "seq_lo": None, "seq_hi": None, "delete_events": 0}


def dedup_latest(
    changes: DataFrame,
    key: str = "doc_id",
    seq: str = "seq",
    method: str = "max_by",
    n_salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Collapse a change set to the single latest event per key.

    ``seq`` must be a total order (unique); ties are impossible by contract
    (a WAL LSN). Output columns == input columns. ``method="none"`` returns
    the input unchanged — legal only for merge-on-read sinks, whose read
    path reconciles duplicates itself.
    """
    if method == "none":
        return changes
    cols = changes.columns
    payload = [c for c in cols if c != key]
    if method == "max_by":
        row = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq)).alias("__r")
        agg = changes.groupBy(key).agg(row)
        return agg.select(key, *[F.col(f"__r.{c}").alias(c) for c in payload]).select(*cols)
    if method == "window":
        w = Window.partitionBy(key).orderBy(F.col(seq).desc())
        return (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if method == "salted_window":
        salt = F.pmod(F.xxhash64(F.col(seq)), F.lit(n_salt))
        w = Window.partitionBy(key, "__salt").orderBy(F.col(seq).desc())
        local = (
            changes.withColumn("__salt", salt)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__salt")
        )
        return dedup_latest(local, key=key, seq=seq, method="max_by")
    if method == "prefilter":
        winners = changes.select(key, seq).groupBy(key).agg(F.max(seq).alias(seq))
        return changes.join(F.broadcast(winners), [key, seq], "inner").select(*cols)
    raise ValueError(f"unknown dedup method {method!r}")


def replay_batch(
    table: LakeTable,
    changes: DataFrame,
    batch_id: int,
    app_id: str = "replay",
    key: str | None = None,
    seq: str = "seq",
    op_col: str = "op",
    delete_value: str = "D",
    dedup_method: str = "max_by",
    lineage: "LineageLog | None" = None,
    mode: str = "cow",
    fanout: bool = False,
    branch: str | None = None,
    auto_evolve: bool = False,
) -> dict[str, Any]:
    """Apply one micro-batch of change events to the table, exactly once.

    ``auto_evolve=True`` diffs the batch schema against the table first and
    applies safe evolutions (new columns, legal widenings) via
    :func:`evolve_to_batch_schema`; incompatible drift raises before
    anything is staged.

    Returns the committed snapshot dict (or the skipped marker if this
    (app_id, batch_id) is already in the table's transaction watermark).

    ``branch`` stages the batch on a write-audit-publish branch (see
    ``LakeTable.merge``): run validation queries via
    ``table.read(branch=...)``, then ``table.publish(branch)`` — main
    consumers never observe an unaudited batch.
    """
    if dedup_method == "none" and mode != "mor":
        raise ValueError("dedup_method='none' requires mode='mor'")
    key = key or table.key
    t0 = time.time()
    evolved: list[str] = []
    if auto_evolve:
        evolved = evolve_to_batch_schema(table, changes, op_col=op_col, seq=seq)
    # Stats ride the merge's own scan via Observation — no extra pass.
    obs = Observation(f"replay_{app_id}_{batch_id}")
    obs_cols = (
        F.count(F.lit(1)).alias("event_count"),
        F.min(seq).alias("seq_lo"),
        F.max(seq).alias("seq_hi"),
        F.sum(F.when(F.col(op_col) == delete_value, 1).otherwise(0)).alias("delete_events"),
    )
    # Fused single-shuffle path (mor + max_by, opt-in): partition ONCE by
    # the table's bucket transform, then group by (bucket, key) — bucket is
    # a pure function of key, so the groups are identical to groupBy(key),
    # and HashPartitioning(bucket) already satisfies the aggregation's
    # ClusteredDistribution([bucket, key]): Catalyst inserts no second
    # exchange, and the dedup shuffle doubles as the write clustering
    # (merge(pre_bucketed=True) stages without its own repartition). The
    # wide payload crosses the exchange layer once per batch instead of
    # twice (plan locked by tests/test_plans.py::
    # test_fused_replay_single_shuffle).
    #
    # DEFAULT OFF — measured, not assumed: on this single box (tmpfs
    # shuffle = memcpy) interleaved A/B at 500k events ran the fused path
    # ~10-15% SLOWER at both 1 and 4 pinned cores (best-of: 24.3 vs 21.3 s
    # at 1 core, 8.5 vs 7.6 s at 4) — the second exchange it removes
    # carries only the post-dedup winners (~10% of volume, ~free as
    # memcpy), while fusing couples the final aggregation to the
    # bucket-count write stage instead of the cores-sized shuffle. On a
    # REAL cluster, where an exchange is network + disk rather than
    # memcpy, eliminating a full materialized exchange of the winner set
    # is the textbook win — hence kept as an opt-in
    # (SPARK_GRAFT_FUSED_REPLAY=1) rather than deleted.
    fused = (
        mode == "mor"
        and dedup_method == "max_by"
        and not fanout
        and os.environ.get("SPARK_GRAFT_FUSED_REPLAY", "0") == "1"
    )
    if dedup_method == "prefilter":
        # The winner aggregation is a narrow (key, seq, op) scan of its own;
        # hang the observation there so the metrics see every event exactly
        # once (on the wide side they would ride both halves of the
        # self-join). The wide side stays observation-free.
        narrow = changes.select(key, seq, op_col).observe(obs, *obs_cols)
        winners = narrow.groupBy(key).agg(F.max(seq).alias(seq))
        latest = changes.join(F.broadcast(winners), [key, seq], "inner").select(
            *changes.columns
        )
    elif fused:
        nb = table.n_buckets
        cols = changes.columns
        payload = [c for c in cols if c != key]
        pre = (
            changes.withColumn(BUCKET_COL, bucket_expr(key, nb))
            .observe(obs, *obs_cols)
            .repartition(F.col(BUCKET_COL))
        )
        row = F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq)).alias("__r")
        latest = (
            pre.groupBy(BUCKET_COL, key)
            .agg(row)
            .select(BUCKET_COL, key, *[F.col(f"__r.{c}").alias(c) for c in payload])
        )
    else:
        changes = changes.observe(obs, *obs_cols)
        latest = dedup_latest(changes, key=key, seq=seq, method=dedup_method)
    snap = table.merge(
        latest,
        op_col=op_col,
        delete_value=delete_value,
        app_id=app_id,
        batch_id=batch_id,
        mode=mode,
        fanout=fanout,
        branch=branch,
        pre_bucketed=fused,
        extra_summary=lambda: (
            dict(_obs_stats_safe(obs), schema_evolved=evolved)
            if evolved
            else _obs_stats_safe(obs)
        ),
    )
    if lineage is not None:
        lineage.record(
            app_id=app_id,
            batch_id=batch_id,
            snapshot=snap,
            duration_s=time.time() - t0,
            spark=table.spark,
        )
    return snap


def _segment_index(log_path: str, seq: str) -> list[tuple[str, int, int]] | None:
    """Per-file (path, seq_lo, seq_hi) for a parquet WAL directory, from the
    file footers — the segment index every binlog reader keeps (Kafka's
    offset index; the reference's dated-file manifest,
    ``omicidx_etl/sra/mirror.py:68-92``). Driver-side footer reads are O(file
    count); at real scale the feed producer writes this manifest alongside
    the segments and this function reads that instead. Returns None when the
    layout isn't a flat local parquet dir (fall back to row-group pruning)."""
    try:
        import pyarrow.parquet as pq

        if not os.path.isdir(log_path):
            return None
        out: list[tuple[str, int, int]] = []
        for name in sorted(os.listdir(log_path)):
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(log_path, name)
            md = pq.ParquetFile(full).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if seq not in idx:
                return None
            lo_hi: list[tuple[int, int]] = []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[seq]).statistics
                if st is None or not st.has_min_max:
                    return None
                lo_hi.append((st.min, st.max))
            out.append((full, min(l for l, _ in lo_hi), max(h for _, h in lo_hi)))
        return out or None
    except Exception:  # pragma: no cover — any footer oddity → safe fallback
        return None


def replay_log(
    spark: SparkSession,
    table: LakeTable,
    log_path: str,
    chunk_events: int = 1_000_000,
    app_id: str = "replay",
    seq: str = "seq",
    dedup_method: str = "max_by",
    lineage: "LineageLog | None" = None,
    max_batches: int | None = None,
    mode: str = "cow",
    fanout: bool = False,
    compact_every: int | None = None,
    canonicalize_every: int | None = None,
    canonicalize_method: str = "exact",
    canonicalize_content_col: str = "tokens",
    progress: "LogProgress | None" = None,
) -> list[dict[str, Any]]:
    """Batch-replay a parquet change log in ordered seq-range micro-batches.

    Resumable: batch i covers seq range (i*chunk, (i+1)*chunk]; the table's
    per-app watermark skips already-committed batches, and each batch scans
    only the WAL segment files whose seq span intersects its range (segment
    index from the parquet footers; the log is range-partitioned by seq —
    see ``datagen.write_change_log``), so resume does not rescan history
    and per-batch task count is O(batch files), not O(log files).

    ``mode="mor"`` lands each batch as delta files (O(batch) per commit);
    ``compact_every=k`` folds deltas into the base every k batches so
    read-side reconciliation stays bounded — the streaming-upsert pattern
    for the 10^10-event scale target.

    ``canonicalize_every=k`` runs in-flight corpus dedup
    (``cdc.canonicalize``) every k batches as its own idempotent commit
    (batch-id–keyed, so kill/resume never double-deletes). The full pass
    is right for bounded tables; at corpus scale prefer the standalone
    incremental job (``canonicalize_incremental`` + signature index).

    ``progress``: optional :class:`omicidx_etl_spark.progress.LogProgress`
    heartbeat, updated with each batch's applied event count (the
    reference's rate-limited console progress, ``omicidx_etl/log.py:
    187-259``, at batch granularity; durable rates live in lineage).
    """
    segs = _segment_index(log_path, seq)
    if segs is not None:
        # With a segment index the full-directory DataFrame is never
        # scanned — don't build it eagerly: listing + schema-inferring a
        # 100-segment WAL dir measured 1.87 s of driver time (guide §5)
        # while one segment file yields the same schema in ~80 ms. The
        # full-dir frame is only a fallback for a batch whose seq range
        # matches no segment (can't happen with a complete index, kept
        # for safety) — built lazily below.
        hi = max(s[2] for s in segs)
        schema = spark.read.parquet(segs[0][0]).schema
        log = None
    else:
        log = spark.read.parquet(log_path)
        hi = log.select(F.max(seq).alias("hi")).first()["hi"] or 0
        schema = log.schema

    def _full_log() -> DataFrame:
        nonlocal log
        if log is None:
            log = spark.read.schema(schema).parquet(log_path)
        return log

    def _mk_batch(b: int) -> DataFrame:
        """Build batch b's pruned DataFrame. With a segment index this is
        PURE DRIVER WORK (explicit schema → no inference job; < the
        parallel-discovery threshold → listing happens on the driver,
        no Spark job is submitted)."""
        lo, up = b * chunk_events, (b + 1) * chunk_events
        if segs is not None:
            paths = [p for p, slo, shi in segs if shi > lo and slo <= up]
            # explicit schema: a bare read triggers per-batch schema
            # inference (driver footer read + a 1-task Spark job)
            src = (
                spark.read.schema(schema).parquet(*paths)
                if paths
                else _full_log()
            )
        else:
            src = log
        return src.filter((F.col(seq) > lo) & (F.col(seq) <= up))

    n_batches = (hi + chunk_events - 1) // chunk_events
    done = table.committed_batch(app_id)
    snaps = []
    start = (done + 1) if done is not None else 0
    # Overlap the NEXT batch's datasource resolution (file listing +
    # relation build, ~0.3 s of serial driver time per batch on a
    # 100-segment log — measured via a DataFrameReader.parquet wrap) with
    # the CURRENT batch's Spark jobs (guide §2.6 overlap, restricted to
    # job-free driver work: the prefetch submits no Spark job and touches
    # no table state, so commit ordering and exactly-once semantics are
    # untouched; py4j is thread-safe with per-thread connections).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(_mk_batch, start) if start < n_batches else None
        for b in range(start, n_batches):
            if max_batches is not None and len(snaps) >= max_batches:
                break
            batch = fut.result()
            fut = (
                pool.submit(_mk_batch, b + 1) if b + 1 < n_batches else None
            )
            snaps.append(
                replay_batch(
                    table, batch, batch_id=b, app_id=app_id, seq=seq,
                    dedup_method=dedup_method, lineage=lineage, mode=mode,
                    fanout=fanout,
                )
            )
            if progress is not None:
                progress.update(
                    int((snaps[-1].get("summary") or {}).get("event_count") or 0)
                )
            if compact_every and (b + 1) % compact_every == 0:
                table.compact()
            if canonicalize_every and (b + 1) % canonicalize_every == 0:
                from omicidx_etl_spark.cdc.canonicalize import canonicalize

                canonicalize(
                    table, method=canonicalize_method,
                    content_col=canonicalize_content_col,
                    app_id=f"{app_id}__canon", batch_id=b, mode=mode,
                )
    return snaps
