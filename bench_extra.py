#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.4: noop sink, §1.5:
job labels). NOT the driver's bench — ``bench.py`` is frozen for
measurement; this file exists so optimization work can be measured
query-by-query with plan evidence, without touching the frozen harness.

Usage:
  python bench_extra.py [--queries q1,q2,...] [--reps N] [--plans-dir DIR]
                        [--stages] [--sf-dir DIR]

Prints one JSON line: {"queries": {name: [cold, warm, ...]}, ...}.
``--plans-dir`` writes <name>.txt with ``explain('formatted')`` output.
``--stages`` enables the Spark UI and dumps per-stage metrics (shuffle
read/write bytes, spill, task time) for each query's jobs via the REST
status API — the stage-level evidence the optimization guide (§1.1) asks
for before changing anything.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "w1_latest_per_key", "cdc_replay_events", "topk_per_group", "sessionize",
    "j2_denormalize", "dedup_minhash_lsh", "ann_cosine_topk", "token_count",
    "doc_fingerprint", "semantic_dedup", "span_dedup", "dedup_ngram_jaccard",
    "dedup_cluster_cc", "pack_sequences",
]


def _spark(stages: bool):
    from omicidx_etl_spark.session import get_spark

    scratch = os.environ.get("SPARK_GRAFT_BENCH_SCRATCH", "/dev/shm/spark_graft_bench")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf = {"spark.local.dir": os.path.join(scratch, "spark_local")}
    if stages:
        conf["spark.ui.enabled"] = "true"
    return get_spark("bench-extra", master=f"local[{cpus}]",
                     shuffle_partitions=int(cpus), extra_conf=conf)


def _stage_dump(app_id: str, port: int = 4040) -> list[dict]:
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    keep = ("stageId", "attemptId", "name", "numTasks", "executorRunTime",
            "executorCpuTime", "inputBytes", "inputRecords", "outputBytes",
            "shuffleReadBytes", "shuffleReadRecords", "shuffleWriteBytes",
            "shuffleWriteRecords", "memoryBytesSpilled", "diskBytesSpilled",
            "submissionTime", "completionTime")
    return [{k: s.get(k) for k in keep} for s in stages]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--queries", default=",".join(DEFAULT))
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--plans-dir", default=None)
    p.add_argument("--stages", action="store_true")
    p.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                      "/root/testdata/sf0.1"))
    args = p.parse_args()
    names = [n for n in args.queries.split(",") if n]

    spark = _spark(args.stages)
    from omicidx_etl_spark import queries as Q

    reg = Q.queries()
    # untimed warmup (JIT/codegen/footer caches) on the first query
    reg[names[0]](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    stage_meta: dict[str, list[dict]] = {}
    for name in names:
        if name not in reg:
            continue
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = reg[name](spark, args.sf_dir)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        seen_before = None
        if args.stages:
            try:
                seen_before = {(s["stageId"], s["attemptId"])
                               for s in _stage_dump(spark.sparkContext.applicationId)}
            except Exception:
                seen_before = None
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            reg[name](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        if args.stages and seen_before is not None:
            try:
                allst = _stage_dump(spark.sparkContext.applicationId)
                stage_meta[name] = [
                    s for s in allst
                    if (s["stageId"], s["attemptId"]) not in seen_before
                ]
            except Exception:
                pass
        sys.stderr.write(f"[bench-extra] {name}: {times}\n")

    res = {"queries": out, "sf_dir": args.sf_dir,
           "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32")}
    if stage_meta:
        path = "/tmp/bench_extra_stages.json"
        with open(path, "w") as f:
            json.dump(stage_meta, f, indent=1)
        res["stages_detail"] = path
    print(json.dumps(res))


if __name__ == "__main__":
    main()
