#!/usr/bin/env python
"""N→4N EXECUTOR scaling evidence in the north rule's literal deployment
shape: the replay job submitted via ``spark-submit --py-files`` onto
``local-cluster[N,1,3072]`` masters at N=1 and N=4 — real executor JVMs
with their own block managers, Python workers and serialization
boundaries — replaying the SAME pre-generated change-log slice into fresh
tables, with throughput scaling efficiency computed between the two
cluster sizes.

Relationship to bench.py's pinned-core pair (the rigorous measurement):
this box cannot pin executors to disjoint cores without also starving the
driver, so these legs run unpinned on the idle host and are gated on
/proc/stat steal like bench; treat the pinned-core pair as the
controlled experiment and THIS artifact as proof the same efficiency
survives the real multi-JVM topology (executor-to-executor shuffle over
netty instead of in-process, --py-files worker imports, per-executor
Python workers). Per BENCH/BASELINE.md the binding constraint at this
slice is the fixed per-batch serial driver term (Amdahl cap
t1/(t1+~3s)); one-batch replay (chunk == events) minimizes it.

Emits ONE JSON line and writes BENCH/executor_scaling_r04.json.
Run ALONE (benchmark hygiene: no concurrent pytest/Spark).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.environ.get("SPARK_GRAFT_EXEC_SCRATCH", "/dev/shm/spark_graft_execscale")
EVENTS = int(os.environ.get("SPARK_GRAFT_EXEC_EVENTS", "1000000"))
DOCS = int(os.environ.get("SPARK_GRAFT_EXEC_DOCS", "100000"))
STEAL_OK = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_OK", "0.02"))
RETRIES = int(os.environ.get("SPARK_GRAFT_EXEC_RETRIES", "2"))


def _steal_sample() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _gen_log(log: str) -> None:
    sys.path.insert(0, REPO)
    from omicidx_etl_spark import datagen
    from omicidx_etl_spark.session import get_spark

    spark = get_spark("execscale-gen", master="local[8]", shuffle_partitions=16)
    ch = datagen.gen_changes(spark, EVENTS, DOCS, seed=13)
    datagen.write_change_log(ch, log, files=64)
    spark.stop()


def _run_leg(n_exec: int, log: str, table: str) -> dict:
    env = dict(os.environ)
    env["MASTER"] = f"local-cluster[{n_exec},1,3072]"
    env["SPARK_DRIVER_MEM"] = "6g"
    s0, t0 = _steal_sample()
    out = subprocess.run(
        [
            "bash", os.path.join(REPO, "scripts", "submit_replay.sh"),
            "--log", log, "--table", table,
            "--chunk", str(EVENTS),  # one batch: minimal serial term
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


def main() -> int:
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    log = os.path.join(SCRATCH, "log")
    t_all = time.time()
    _gen_log(log)

    legs: dict[int, dict] = {}
    attempts: list[dict] = []
    for n in (1, 4):
        for attempt in range(RETRIES + 1):
            leg = _run_leg(n, log, os.path.join(SCRATCH, f"table_x{n}_a{attempt}"))
            attempts.append(leg)
            if leg["steal_frac"] <= STEAL_OK:
                legs[n] = leg
                break
            print(
                f"[execscale] n={n} attempt {attempt}: steal "
                f"{leg['steal_frac']:.3f} > {STEAL_OK} — retrying",
                file=sys.stderr,
            )
        else:
            legs[n] = leg  # keep last, flagged dirty by steal_frac

    eps1, eps4 = legs[1]["events_per_sec"], legs[4]["events_per_sec"]
    eff = round(eps4 / (4 * eps1), 3)
    state_ok = _final_state_ok(legs[4]["table"], log)
    clean = all(legs[n]["steal_frac"] <= STEAL_OK for n in (1, 4))
    out = {
        "metric": "executor-scaling efficiency, spark-submit local-cluster N->4N",
        "events": EVENTS,
        "jvms": {n: legs[n]["jvms"] for n in (1, 4)},
        "events_per_sec": {n: legs[n]["events_per_sec"] for n in (1, 4)},
        "sec": {n: legs[n]["sec"] for n in (1, 4)},
        "steal_frac": {n: legs[n]["steal_frac"] for n in (1, 4)},
        "scaling_efficiency": eff,
        "window_clean": clean,
        "final_state_ok": state_ok,
        "elapsed_sec": round(time.time() - t_all, 1),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "executor_scaling_r04.json"), "w") as f:
        json.dump({"line": out, "attempts": attempts}, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
