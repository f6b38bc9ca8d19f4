"""Spark-task-level attribution of the dedup_near bench stage (same
method as tools/ann_tasks.py: event-log per-task metrics summed per
Spark stage — executorCpuTime counts only this app's tasks, so the
attribution works even in co-tenant-noisy windows; run_s >> cpu_s with
no shuffle marks a stage as Python/Arrow-bound).

Matches bench.py's `_dedup` exactly: reads the SAME pre-materialized
parquet corpus fixture (build it by running bench.py once at the wanted
DEDUP_MULT/DEDUP_EXTRA), `dedup_near(threshold=0.7)`, noop sink.

Usage: python tools/dedup_tasks.py <cpus> [dedup_extra] [dedup_mult] [sf_dir]
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
    extra = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.sched_setaffinity(0, set(range(cpus)))

    evdir = f"/tmp/dedup_eventlog_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from p3_osm_transformer_spark.operators.dedup import dedup_near
    from p3_osm_transformer_spark.session import get_spark

    spark = get_spark(app_name="dedup-tasks", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8),
                      extra_confs={
                          "spark.eventLog.enabled": "true",
                          "spark.eventLog.dir": f"file:{evdir}",
                          "spark.eventLog.compress": "false",
                      })
    spark.range(0, 2_000_000).selectExpr("sum(id * 3 % 7)").collect()

    fixdir = os.path.join("/tmp", "spark_graft_bench_fixtures")
    dedup_path = os.path.join(
        fixdir, f"dedup_corpus_{os.path.basename(sf_dir.rstrip('/'))}"
                f"_m{mult}_e{extra}")
    if not os.path.exists(os.path.join(dedup_path, "_SUCCESS")):
        print(json.dumps({"error": f"corpus fixture missing: {dedup_path} "
                          "— run bench.py once at these knobs first"}))
        return

    corpus = spark.read.parquet(dedup_path)

    t0 = time.time() * 1000
    w0 = time.perf_counter()
    dedup_near(corpus, threshold=0.7) \
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
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "submitted": si.get("Submission Time", 0),
                    "tasks": 0, "run_s": 0.0, "cpu_s": 0.0,
                    "gc_s": 0.0, "shuf_r_mb": 0.0, "shuf_w_mb": 0.0,
                    "input_mb": 0.0, "spill_mb": 0.0, "rec_r": 0,
                    "rec_w": 0,
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
                s["rec_r"] += sr.get("Total Records Read", 0)
                sw = tm.get("Shuffle Write Metrics") or {}
                s["shuf_w_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                s["rec_w"] += sw.get("Shuffle Records Written", 0)
                s["spill_mb"] += tm.get("Disk Bytes Spilled", 0) / 1e6
                im = tm.get("Input Metrics") or {}
                s["input_mb"] += im.get("Bytes Read", 0) / 1e6
    rows = [dict(stages[sid], stage=sid) for sid in order
            if stages[sid]["submitted"] >= t0 and stages[sid]["tasks"]]
    for r in rows:
        r.pop("submitted", None)
        for k in ("run_s", "cpu_s", "gc_s", "shuf_r_mb", "shuf_w_mb",
                  "input_mb", "spill_mb"):
            r[k] = round(r[k], 2)
    print(json.dumps({"cpus": cpus, "extra": extra, "mult": mult,
                      "wall_s": round(wall, 3), "stages": rows}))
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
