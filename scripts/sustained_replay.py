#!/usr/bin/env python
"""Sustained-replay evidence: per-batch upsert throughput must stay flat as
the table grows — the north rule is *sustained* change-events/sec at
10^10-event scale, and the design claim behind merge-on-read is that
per-batch cost is O(batch), independent of accumulated table size, with
`compact()` amortizing read-side reconciliation on a schedule.

This script measures that claim directly: replay B micro-batches into one
MOR LakeTable with `compact_every=k` maintenance interleaved, timing every
batch (and every compaction separately — maintenance wall is reported, not
hidden inside batch throughput). Correctness of the sustained path is then
checked exactly: the final table state must equal a single global
latest-per-key dedup over the whole log (the oracle the driver gate uses,
at whatever event count this run chose).

Evidence printed as ONE JSON line:
  per_batch: [{batch, events, sec, ev_s, steal_frac}, ...]
  compactions: [{after_batch, sec}, ...]
  flatness: median(ev_s of last 1/4 batches) / median(ev_s of first 1/4)
            (host steal/DRAM noise makes single batches jumpy; the
            quartile medians are the signal — >= ~0.8 on a quiet host
            means no growth-proportional degradation)
  state_ok: final-state equality vs the global-dedup oracle

Usage:
  python scripts/sustained_replay.py                 # 16 x 125k events
  python scripts/sustained_replay.py --events 4000000 --batches 16 \
      --compact-every 4 --cpus 8 --purge-every 8

Run it alone (benchmark hygiene in CLAUDE.md): never concurrently with
bench.py or pytest.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # reuse the hardened harness helpers (scratch, steal, spark)
from bench import SCRATCH, _spark, _steal_frac, _steal_jiffies, ensure_change_log


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=2_000_000)
    p.add_argument("--docs", type=int, default=200_000)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--compact-every", type=int, default=4)
    p.add_argument("--purge-every", type=int, default=0,
                   help="purge tombstones + expire snapshots every N batches "
                        "(0 = never) — full maintenance in the loop")
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--dedup", default="max_by")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from omicidx_etl_spark.cdc.replay import dedup_latest, replay_batch
    from omicidx_etl_spark.lake.table import LakeTable
    from pyspark.sql import functions as F

    chunk = args.events // args.batches
    spark = _spark(f"local[{args.cpus}]", args.cpus)
    log_path = ensure_change_log(spark, args.events, args.docs, args.seed,
                                 files=max(args.batches * 4, 32))
    tbl_path = os.path.join(SCRATCH, "sustained_table")
    shutil.rmtree(tbl_path, ignore_errors=True)
    tbl = LakeTable.create(spark, tbl_path, bench._table_schema(),
                           key="doc_id", n_buckets=args.buckets)

    log = spark.read.parquet(log_path)
    # warmup (JIT tier-up) on a throwaway table, never timed
    warm_path = os.path.join(SCRATCH, "sustained_warm")
    shutil.rmtree(warm_path, ignore_errors=True)
    warm = LakeTable.create(spark, warm_path, bench._table_schema(),
                            key="doc_id", n_buckets=args.buckets)
    replay_batch(warm, log.filter(F.col("seq") <= 30_000), batch_id=0,
                 app_id="warm", dedup_method=args.dedup, mode="mor")
    shutil.rmtree(warm_path, ignore_errors=True)

    per_batch, compactions, maintenance = [], [], []
    for b in range(args.batches):
        lo, up = b * chunk, (b + 1) * chunk
        batch = log.filter((F.col("seq") > lo) & (F.col("seq") <= up))
        s0, t0 = _steal_jiffies(), time.time()
        replay_batch(tbl, batch, batch_id=b, app_id="sustained",
                     dedup_method=args.dedup, mode="mor")
        dt = time.time() - t0
        per_batch.append({
            "batch": b,
            "events": chunk,
            "sec": round(dt, 3),
            "ev_s": round(chunk / dt, 1),
            "steal_frac": round(_steal_frac(_steal_jiffies() - s0, dt), 4),
        })
        sys.stderr.write(f"[sustained] batch {b}: {per_batch[-1]['ev_s']} ev/s "
                         f"({dt:.1f}s, steal {per_batch[-1]['steal_frac']})\n")
        if args.compact_every and (b + 1) % args.compact_every == 0:
            t0 = time.time()
            tbl.compact()
            compactions.append({"after_batch": b, "sec": round(time.time() - t0, 3)})
            sys.stderr.write(f"[sustained] compact after {b}: "
                             f"{compactions[-1]['sec']}s\n")
        if args.purge_every and (b + 1) % args.purge_every == 0:
            t0 = time.time()
            tbl.purge_tombstones(before_seq=up)
            tbl.expire_snapshots(keep_last=4)
            maintenance.append({"after_batch": b, "sec": round(time.time() - t0, 3)})

    # exact final-state oracle: one global latest-per-key dedup of the log
    final = tbl.read()
    oracle = dedup_latest(log, key="doc_id", seq="seq", method="max_by")
    oracle = oracle.filter(F.col("op") != "D").select(*final.columns)
    mismatch = final.exceptAll(oracle).count() + oracle.exceptAll(final).count()

    q = max(args.batches // 4, 1)
    first = statistics.median(x["ev_s"] for x in per_batch[:q])
    last = statistics.median(x["ev_s"] for x in per_batch[-q:])
    out = {
        "metric": "sustained per-batch upsert throughput (MOR + compaction)",
        "events": args.events,
        "docs": args.docs,
        "batches": args.batches,
        "chunk": chunk,
        "cpus": args.cpus,
        "dedup": args.dedup,
        "compact_every": args.compact_every,
        "purge_every": args.purge_every,
        "per_batch": per_batch,
        "compactions": compactions,
        "maintenance": maintenance,
        "first_quartile_ev_s": first,
        "last_quartile_ev_s": last,
        "flatness": round(last / first, 3),
        "compaction_sec_total": round(sum(c["sec"] for c in compactions), 3),
        "state_ok": mismatch == 0,
        "final_rows": final.count(),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
