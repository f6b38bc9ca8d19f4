"""Per-phase attribution of the ann_lsh bench stage (same method as
tools/dedup_profile.py: wall + whole-host /proc/stat busy CPU per phase,
run pinned at 8 and 32 cores and diff).

Matches the bench stage exactly (bench.py `_ann`): corpus read from the
SAME pre-materialized parquet fixture, `cosine_topk_lsh(k=10,
prefix_bits=None, n_corpus=N, dim=64)`.  Phases are cumulative prefixes
of the stage's plan, so phase-to-phase deltas attribute wall/CPU:

  scan    — parquet corpus scan through noop (baseline I/O + row decode)
  sketch  — scan → Arrow sign-sketch (the r5.2 pandas_udf)
  bucket  — sketch → prefix + hot-bucket row_number window (first shuffle)
  cand    — bucket ⋈ multi-probe queries → distinct (q,c) id pairs
  full    — cosine_topk_lsh end to end (adds the embedding re-join +
            HOF dot/norm re-rank + top-k window)

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

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from p3_osm_transformer_spark.operators.simsearch import (
        _bucket_long,
        cosine_topk_lsh,
        pick_prefix_bits,
        sketch_bits,
    )
    from p3_osm_transformer_spark.session import get_spark

    spark = get_spark(app_name="ann-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.range(0, 2_000_000).selectExpr("sum(id * 3 % 7)").collect()
    # Arrow python-worker spin-up (bench warms this up too)
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

    prefix_bits = pick_prefix_bits(ann_n)
    n_planes = max(12, prefix_bits)

    def corpus_df():
        return spark.read.parquet(ann_path)

    def queries_df():
        return spark.range(0, 200).select(
            (F.col("id") + 5_000_000).alias("query_id"),
            ann_vec.alias("embedding"))

    def bucket_df():
        cs = corpus_df().select(
            "neighbor_id",
            _bucket_long(F.substring(
                sketch_bits("embedding", n_planes, dim=64), 1,
                prefix_bits)).alias("_bucket"))
        wb = Window.partitionBy("_bucket").orderBy("neighbor_id")
        return (cs.withColumn("_bpos", F.row_number().over(wb))
                .filter(F.col("_bpos") <= 10_000).drop("_bpos"))

    def cand_df():
        qs = queries_df().select(
            "query_id", sketch_bits("embedding", n_planes, dim=64).alias("_sk"))
        probes = F.array(*(
            [F.substring("_sk", 1, prefix_bits)]
            + [F.concat(F.substring("_sk", 1, i),
                        F.when(F.substring("_sk", i + 1, 1) == "1",
                               "0").otherwise("1"),
                        F.substring("_sk", i + 2, prefix_bits - i - 1))
               for i in range(prefix_bits)]))
        qp = (qs.select("query_id",
                        F.explode(F.array_distinct(probes)).alias("_bs"))
              .select("query_id", _bucket_long(F.col("_bs")).alias("_bucket")))
        return (qp.join(bucket_df(), "_bucket")
                .filter(F.col("query_id") != F.col("neighbor_id"))
                .select("query_id", "neighbor_id").distinct())

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

    timed("scan", lambda: force(corpus_df()))
    timed("sketch", lambda: force(
        corpus_df().select("neighbor_id",
                           sketch_bits("embedding", n_planes, dim=64))))
    timed("bucket", lambda: force(bucket_df()))
    timed("cand", lambda: force(cand_df()))
    timed("full", lambda: force(
        cosine_topk_lsh(queries_df(), corpus_df(), k=10, prefix_bits=None,
                        n_corpus=ann_n, dim=64)))
    timed("full_catalyst", lambda: force(
        cosine_topk_lsh(queries_df(), corpus_df(), k=10, prefix_bits=None,
                        n_corpus=ann_n, dim=64, impl="catalyst")))

    print(json.dumps({"cpus": cpus, "ann_n": ann_n, "timings": timings,
                      "cpu_secs": cpu_secs}))
    spark.stop()


if __name__ == "__main__":
    main()
