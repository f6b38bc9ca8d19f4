"""Per-phase attribution of the ann_lsh bench stage (same method as
tools/dedup_profile.py: wall + whole-host /proc/stat busy CPU per phase,
run pinned at 8 and 32 cores and diff).

Phases:
  corpus   — the bench stage's synthetic corpus materialized through noop
             (range → interpreted F.transform building a 64-dim array)
  sketch   — corpus → sketch_bits(dim=64) (driver-literal coefficient
             matrix; zip_with/transform/aggregate HOF chain)
  full     — cosine_topk_lsh end to end (what the bench times)

Usage: python tools/ann_profile.py <cpus> [ann_n]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ann_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    os.sched_setaffinity(0, set(range(cpus)))

    from pyspark.sql import functions as F

    from p3_osm_transformer_spark.operators.simsearch import (
        cosine_topk_lsh,
        sketch_bits,
    )
    from p3_osm_transformer_spark.session import get_spark

    spark = get_spark(app_name="ann-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.range(0, 2_000_000).selectExpr("sum(id * 3 % 7)").collect()

    def corpus_df():
        dims = F.sequence(F.lit(1), F.lit(64))
        vec = F.transform(
            dims, lambda d: (((F.col("id") + 1) * (d * 37 + 11) % 997)
                             / 498.5 - 1.0).cast("double"))
        return spark.range(0, ann_n, 1, cpus * 8).select(
            F.col("id").alias("neighbor_id"), vec.alias("embedding"))

    def queries_df():
        dims = F.sequence(F.lit(1), F.lit(64))
        vec = F.transform(
            dims, lambda d: (((F.col("id") + 1) * (d * 37 + 11) % 997)
                             / 498.5 - 1.0).cast("double"))
        return spark.range(0, 200).select(
            (F.col("id") + 5_000_000).alias("query_id"), vec.alias("embedding"))

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}
    repeats = int(os.environ.get("REPEATS", "2"))

    def _busy() -> float:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        user, nice, system = (int(x) for x in parts[1:4])
        return (user + nice + system) / 100.0

    def timed(name, fn):
        best, best_cpu = None, None
        for _ in range(repeats):
            c0, t0 = _busy(), time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            dc = _busy() - c0
            if best is None or dt < best:
                best, best_cpu = dt, dc
        timings[name] = round(best, 3)
        cpu_secs[name] = round(best_cpu, 1)

    timed("corpus", lambda: force(corpus_df()))
    timed("sketch", lambda: force(
        corpus_df().select("neighbor_id",
                           sketch_bits("embedding", 16, dim=64))))
    timed("full", lambda: force(
        cosine_topk_lsh(queries_df(), corpus_df(), k=10, prefix_bits=None)))

    print(json.dumps({"cpus": cpus, "ann_n": ann_n, "timings": timings,
                      "cpu_secs": cpu_secs}))
    spark.stop()


if __name__ == "__main__":
    main()
