#!/usr/bin/env python
"""N→4N EXECUTOR scaling evidence in the north rule's literal deployment
shape: the replay job submitted via ``spark-submit --py-files`` onto
``local-cluster[N,1,3072]`` masters at N=1 and N=4 — real executor JVMs
with their own block managers, Python workers and serialization
boundaries — replaying the SAME pre-generated change-log slice into fresh
tables, with throughput scaling efficiency computed between the two
cluster sizes.

r5: self-sizing + multi-pair (VERDICT r4 "Next round" #3). The harness
ports bench.py's metrology:

- **time-targeted slice escalation** — if the 1-executor leg runs shorter
  than ``SPARK_GRAFT_EXEC_T1`` (110 s), the fixed multi-JVM serial term
  (~8 s of submit/session/commit) dominates and caps the measurable
  efficiency at t1/(t1+serial); the slice escalates ×4 (log regenerated)
  and the pair restarts, up to ``SPARK_GRAFT_EXEC_MAX_EVENTS``.
- **window gates per pair** — /proc/stat steal on BOTH legs (bench's
  STEAL_OK), an N-thread aggregate-memcpy bandwidth probe bracketing the
  hi leg (bench AGG_OK: the capped-DRAM regime measures ~10 GB/s vs 19-21
  healthy and silently halves the 4-exec leg), and superlinear sanity
  (eff > SUPER_OK means the lo leg was burst-depressed — discard).
- **pair loop** — pairs accumulate until ``SPARK_GRAFT_EXEC_PAIRS``
  (2) are clean at the final (escalated) slice or the time budget
  ``SPARK_GRAFT_EXEC_BUDGET`` (1800 s) runs out; the headline efficiency
  is the median over clean pairs at that slice.

Relationship to bench.py's pinned-core pair (the rigorous measurement):
this box cannot pin executors to disjoint cores without also starving the
driver, so these legs run unpinned on the idle host; treat the pinned
pair as the controlled experiment and THIS artifact as proof the same
efficiency survives the real multi-JVM topology (executor-to-executor
shuffle over netty, --py-files worker imports, per-executor Python
workers).

Emits ONE JSON line and writes BENCH/executor_scaling_r05.json.
Run ALONE (benchmark hygiene: no concurrent pytest/Spark).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # repo-root bench.py: probes + gate thresholds

SCRATCH = os.environ.get("SPARK_GRAFT_EXEC_SCRATCH", "/dev/shm/spark_graft_execscale")
EVENTS0 = int(os.environ.get("SPARK_GRAFT_EXEC_EVENTS", "1000000"))
MAX_EVENTS = int(os.environ.get("SPARK_GRAFT_EXEC_MAX_EVENTS", "16000000"))
DOCS_FRAC = 10  # docs = events / 10, matching bench's replay shape
STEAL_OK = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_OK", "0.02"))
T1_TARGET = float(os.environ.get("SPARK_GRAFT_EXEC_T1", "110"))
WANT_PAIRS = int(os.environ.get("SPARK_GRAFT_EXEC_PAIRS", "2"))
BUDGET = float(os.environ.get("SPARK_GRAFT_EXEC_BUDGET", "1800"))
AGG_THREADS = 4  # the hi leg's executor count


def _steal_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _gen_log(log: str, events: int) -> None:
    from omicidx_etl_spark import datagen
    from omicidx_etl_spark.session import get_spark

    shutil.rmtree(log, ignore_errors=True)
    spark = get_spark("execscale-gen", master="local[8]", shuffle_partitions=16)
    ch = datagen.gen_changes(spark, events, max(1000, events // DOCS_FRAC), seed=13)
    datagen.write_change_log(ch, log, files=64)
    spark.stop()


def _run_leg(n_exec: int, log: str, table: str, events: int) -> dict:
    env = dict(os.environ)
    env["MASTER"] = f"local-cluster[{n_exec},1,3072]"
    env["SPARK_DRIVER_MEM"] = "6g"
    s0, t0 = _steal_sample()
    out = subprocess.run(
        [
            "bash", os.path.join(REPO, "scripts", "submit_replay.sh"),
            "--log", log, "--table", table,
            "--chunk", str(events),  # one batch: minimal serial term
            "--buckets", "16", "--mode", "mor",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    s1, t1 = _steal_sample()
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"leg n_exec={n_exec} rc={out.returncode}: {out.stderr[-800:]}"
        )
    job = json.loads(lines[-1])
    job["n_executors"] = n_exec
    job["table"] = table
    job["steal_frac"] = round((s1 - s0) / max(1, t1 - t0), 5)
    return job


def _final_state_ok(table: str, log: str) -> bool:
    """DuckDB latest-per-key oracle vs the table's LIVE dirs (resolved
    from the snapshot manifest — data/ may hold older snapshots' dirs)."""
    import duckdb

    with open(os.path.join(table, "_meta", "_current")) as f:
        snap_name = f.read().strip()
    with open(os.path.join(table, "_meta", snap_name)) as f:
        snap = json.load(f)
    dirs: list[str] = []
    for raw in snap["buckets"].values():
        e = raw if isinstance(raw, dict) and ("base" in raw or "deltas" in raw) else {"base": raw, "deltas": []}
        if e.get("base"):
            dirs.append(os.path.join(table, e["base"]["dir"], "*.parquet"))
        for d in e.get("deltas") or []:
            dirs.append(os.path.join(table, d["dir"], "*.parquet"))
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT doc_id, op,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) rn
          FROM read_parquet('{log}/*.parquet')) t
        WHERE rn = 1 AND op <> 'D'
        """
    ).fetchone()[0]
    have = con.execute(
        f"""
        SELECT COUNT(*) FROM (
          SELECT doc_id, __deleted,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY __seq DESC) rn
          FROM read_parquet({dirs!r}, union_by_name=true)) t
        WHERE rn = 1 AND (__deleted IS NULL OR NOT __deleted)
        """
    ).fetchone()[0]
    return int(want) == int(have)


def _run_pair(idx: int, log: str, events: int) -> dict:
    """One N=1 → N=4 pair over the same slice, fully gated. Returns the
    pair record with 'clean' + per-gate booleans."""
    leg1 = _run_leg(1, log, os.path.join(SCRATCH, f"table_p{idx}_x1"), events)
    agg_pre = bench._agg_probe_mbps(AGG_THREADS)
    leg4 = _run_leg(4, log, os.path.join(SCRATCH, f"table_p{idx}_x4"), events)
    agg_post = bench._agg_probe_mbps(AGG_THREADS)
    agg = max(agg_pre, agg_post)  # bracketing: either side healthy clears

    eps1, eps4 = leg1["events_per_sec"], leg4["events_per_sec"]
    eff = round(eps4 / (4 * eps1), 3)
    steal_ok = max(leg1["steal_frac"], leg4["steal_frac"]) <= STEAL_OK
    agg_ok = agg >= bench.AGG_OK
    super_ok = eff <= bench.SUPER_OK
    return {
        "pair": idx,
        "events": events,
        "t1_sec": leg1["sec"],
        "t4_sec": leg4["sec"],
        "events_per_sec": {1: eps1, 4: eps4},
        "jvms": {1: leg1["jvms"], 4: leg4["jvms"]},
        "steal_frac": {1: leg1["steal_frac"], 4: leg4["steal_frac"]},
        "agg_mbps": round(agg, 1),
        "efficiency": eff,
        "gates": {"steal": steal_ok, "agg_bw": agg_ok, "superlinear": super_ok},
        "clean": steal_ok and agg_ok and super_ok,
        "table4": leg4["table"],
    }


def main() -> int:
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    log = os.path.join(SCRATCH, "log")
    t_all = time.time()
    events = EVENTS0
    _gen_log(log, events)

    pairs: list[dict] = []
    idx = 0
    state_ok = None
    while time.time() - t_all < BUDGET:
        idx += 1
        try:
            pair = _run_pair(idx, log, events)
        except RuntimeError as e:
            print(f"[execscale] pair {idx} failed: {e}", file=sys.stderr)
            continue
        pairs.append(pair)
        print(
            f"[execscale] pair {idx}: events={events} t1={pair['t1_sec']:.1f}s "
            f"eff={pair['efficiency']} clean={pair['clean']} gates={pair['gates']}",
            file=sys.stderr,
        )
        # escalate while the 1-exec leg is serial-term-bound (bench's
        # time-targeted rule): measured pairs at the small slice are kept
        # in the artifact but can't join the headline
        if pair["t1_sec"] < T1_TARGET and events * 4 <= MAX_EVENTS:
            events *= 4
            print(
                f"[execscale] t1 {pair['t1_sec']:.1f}s < {T1_TARGET}s — "
                f"escalating slice to {events} events",
                file=sys.stderr,
            )
            _gen_log(log, events)
            continue
        if state_ok is None:
            state_ok = _final_state_ok(pair["table4"], log)
        clean_at_slice = [
            p for p in pairs if p["clean"] and p["events"] == events
        ]
        if len(clean_at_slice) >= WANT_PAIRS:
            break
    # free the per-pair tables as we finish (tmpfs = RAM)
    for name in os.listdir(SCRATCH):
        if name.startswith("table_"):
            shutil.rmtree(os.path.join(SCRATCH, name), ignore_errors=True)

    top = max((p["events"] for p in pairs if p["clean"]), default=events)
    use = [p for p in pairs if p["clean"] and p["events"] == top]
    eff = round(statistics.median(p["efficiency"] for p in use), 3) if use else None
    out = {
        "metric": "executor-scaling efficiency, spark-submit local-cluster N->4N",
        "events": top,
        "pairs_run": len(pairs),
        "clean_pairs": len(use),
        "pair_efficiencies": [p["efficiency"] for p in use],
        "scaling_efficiency": eff,
        "jvms": (use or pairs)[-1]["jvms"] if pairs else None,
        "t1_sec": (use or pairs)[-1]["t1_sec"] if pairs else None,
        "final_state_ok": state_ok,
        "budget_stop": time.time() - t_all >= BUDGET,
        "elapsed_sec": round(time.time() - t_all, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "executor_scaling_r05.json"), "w") as f:
        json.dump({"line": out, "pairs": pairs}, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0 if (use and eff is not None and state_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
