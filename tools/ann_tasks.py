"""Spark-task-level attribution of the ann_lsh bench stage.

tools/ann_profile.py attributes wall + WHOLE-HOST /proc/stat CPU per
plan phase — useless in a co-tenant-noisy window because the host
counter can't tell our cycles from theirs.  This tool instead enables
the Spark event log and sums PER-TASK metrics (executorRunTime,
executorCpuTime, JVM GC, shuffle bytes, input bytes) per Spark stage:
executorCpuTime counts ONLY this app's task threads, so the numbers
attribute even when co-tenants pollute the window.  The one blind spot
is Python-worker CPU (Arrow UDF work): it shows up as task runTime
without matching JVM cpuTime — which is itself the signature that a
stage is Python/Arrow-bound rather than JVM-bound.

Usage: python tools/ann_tasks.py <cpus> [ann_n]
Prints one JSON line: wall + per-stage {name, tasks, run_s, cpu_s,
gc_s, shuf_r_mb, shuf_w_mb, input_mb} in stage-submission order.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ann_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    os.sched_setaffinity(0, set(range(cpus)))

    evdir = f"/tmp/ann_eventlog_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from pyspark.sql import functions as F

    from p3_osm_transformer_spark.operators.simsearch import (
        cosine_topk_lsh,
        sketch_bits,
    )
    from p3_osm_transformer_spark.session import get_spark

    spark = get_spark(app_name="ann-tasks", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_confs={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.dir": f"file:{evdir}",
                          # uncompressed json so we can just parse it
                          "spark.eventLog.compress": "false",
                      })
    # JVM + Arrow python-worker warmup (bench warms these too)
    spark.range(0, 2_000_000).selectExpr("sum(id * 3 % 7)").collect()
    spark.range(0, cpus * 64) \
        .select(F.array(F.lit(1.0)).alias("_v")) \
        .select(sketch_bits("_v", 4, dim=1)) \
        .write.format("noop").mode("overwrite").save()

    fixdir = os.path.join("/tmp", "spark_graft_bench_fixtures")
    ann_dims = F.sequence(F.lit(1), F.lit(64))
    ann_vec = F.transform(
        ann_dims, lambda d: F.hash(F.col("id"), d) / 2147483648.0)
    ann_path = os.path.join(fixdir, f"ann_corpus_v2_n{ann_n}")
    if not os.path.exists(os.path.join(ann_path, "_SUCCESS")):
        spark.range(0, ann_n, 1, 64).select(
            F.col("id").alias("neighbor_id"), ann_vec.alias("embedding")) \
            .write.mode("overwrite").parquet(ann_path)

    corpus = spark.read.parquet(ann_path)
    qv = spark.range(0, 200).select(
        (F.col("id") + 5_000_000).alias("query_id"),
        ann_vec.alias("embedding"))

    # mark the measured region so warmup stages can be excluded
    t0 = time.time() * 1000
    w0 = time.perf_counter()
    cosine_topk_lsh(qv, corpus, k=10, prefix_bits=None,
                    n_corpus=ann_n, dim=64, n_queries=200) \
        .write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - w0
    spark.stop()

    stages: dict[int, dict] = {}
    order: list[int] = []
    paths = [p for p in glob.glob(os.path.join(evdir, "**", "*"),
                                  recursive=True) if os.path.isfile(p)]
    for path in paths:
        for line in open(path, errors="replace"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                if si.get("Submission Time", t0) >= t0 or True:
                    stages[sid] = {
                        "name": si["Stage Name"].split("\n")[0][:80],
                        "submitted": si.get("Submission Time", 0),
                        "tasks": 0, "run_s": 0.0, "cpu_s": 0.0,
                        "gc_s": 0.0, "shuf_r_mb": 0.0, "shuf_w_mb": 0.0,
                        "input_mb": 0.0,
                    }
                    order.append(sid)
            elif ev.get("Event") == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                if sid not in stages or not tm:
                    continue
                s = stages[sid]
                s["tasks"] += 1
                s["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                s["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                s["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                sr = tm.get("Shuffle Read Metrics") or {}
                s["shuf_r_mb"] += (sr.get("Remote Bytes Read", 0)
                                   + sr.get("Local Bytes Read", 0)) / 1e6
                sw = tm.get("Shuffle Write Metrics") or {}
                s["shuf_w_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                im = tm.get("Input Metrics") or {}
                s["input_mb"] += im.get("Bytes Read", 0) / 1e6
    # keep only stages submitted after the measured region began
    rows = [dict(stages[sid], stage=sid) for sid in order
            if stages[sid]["submitted"] >= t0 and stages[sid]["tasks"]]
    for r in rows:
        r.pop("submitted", None)
        for k in ("run_s", "cpu_s", "gc_s", "shuf_r_mb", "shuf_w_mb",
                  "input_mb"):
            r[k] = round(r[k], 2)
    print(json.dumps({"cpus": cpus, "ann_n": ann_n,
                      "wall_s": round(wall, 3), "stages": rows}))
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
