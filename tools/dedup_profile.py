"""Per-phase attribution of the dedup_near bench stage (r4 verdict #1).

The work-dominated aux bench (DEDUP_EXTRA=400k) measured 8->32 efficiency
0.326 — below BOTH host ceilings (ALU 0.73, stream 0.60) — so some part of
the stage is serializing.  This script decomposes the stage into its
component jobs and times each one pinned at a given core count, so an
8-core vs 32-core diff attributes the non-scaling seconds to a specific
operator instead of a guess.

Phases (cumulative plan prefixes + isolated suffixes):
  scan        — parquet scan only (noop force)
  explode     — scan -> tokenize -> shingle explode -> md5 hash (codegen)
  sig_mins    — explode -> groupBy(id).agg(8 codegen mins)   [HashAggregate]
  sig_full    — explode -> groupBy(id).agg(mins + collect_set) [ObjectHashAgg]
  sig_ckpt    — _doc_signatures(...).localCheckpoint(eager)  [the stage's
                internal action]
  cand        — bands -> bucket-size filter -> self-join -> distinct
                (reading the checkpointed sig)
  verify      — candidate pairs -> hset joins -> array_intersect/union
                (reading the checkpointed sig)
  full        — dedup_near() end to end through the noop sink (what the
                bench stage times)

Usage:  python tools/dedup_profile.py <cpus> [dedup_extra]
Prints one JSON line; run at 8 and 32 in a quiet window and diff.
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
    extra = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    os.sched_setaffinity(0, set(range(cpus)))

    from pyspark.sql import functions as F

    from p3_osm_transformer_spark.operators.dedup import (
        _doc_signatures,
        _exploded_hashes,
        _min_hash_aggs,
        dedup_near,
    )
    from p3_osm_transformer_spark.session import get_spark

    spark = get_spark(app_name="dedup-profile", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.range(0, 2_000_000).selectExpr("sum(id * 3 % 7)").collect()

    path = os.path.join("/tmp/spark_graft_bench_fixtures",
                        f"dedup_corpus_sf0.1_m4_e{extra}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise SystemExit(f"fixture missing: {path} (run bench.py once)")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}
    repeats = int(os.environ.get("REPEATS", "2"))

    def _busy() -> float:
        """Whole-host busy CPU seconds from /proc/stat (USER_HZ=100)."""
        with open("/proc/stat") as f:
            parts = f.readline().split()
        user, nice, system, idle, iowait = (int(x) for x in parts[1:6])
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

    corpus = spark.read.parquet(path)

    timed("scan", lambda: force(corpus))
    timed("explode", lambda: force(
        _exploded_hashes(corpus, "doc_id", "text", 3)))
    timed("sig_mins", lambda: force(
        _exploded_hashes(corpus, "doc_id", "text", 3)
        .groupBy("doc_id").agg(*_min_hash_aggs(8))))
    timed("sig_full", lambda: force(
        _exploded_hashes(corpus, "doc_id", "text", 3)
        .groupBy("doc_id").agg(*_min_hash_aggs(8),
                               F.collect_set("_h").alias("hset"))))

    # the stage's internal eager action, then the two downstream legs
    # reading the SAME checkpointed blocks (the real stage shape)
    sig_holder = {}

    def ckpt():
        s = _doc_signatures(corpus, "doc_id", "text", 8, 2, 3) \
            .localCheckpoint(eager=True)
        sig_holder["sig"] = s
    timed("sig_ckpt", ckpt)
    sig = sig_holder["sig"]

    n_part = max(cpus, 8)

    def cand_df():
        bands = sig.select("doc_id", F.posexplode("bands")
                           .alias("band_idx", "band_key"))
        sizes = bands.groupBy("band_idx", "band_key") \
                     .agg(F.count("*").alias("_bn"))
        kept = (bands.join(sizes, ["band_idx", "band_key"])
                .filter(F.col("_bn") <= 1000).drop("_bn"))
        a = kept.select(F.col("doc_id").alias("id_a"), "band_idx", "band_key")
        b = kept.select(F.col("doc_id").alias("id_b"), "band_idx", "band_key")
        return (a.join(b, ["band_idx", "band_key"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct()
                .repartition(n_part, "id_a"))

    timed("cand", lambda: force(cand_df()))

    pairs = cand_df().localCheckpoint(eager=True)

    def verify():
        sh = sig.select("doc_id", "hset")
        j = (pairs
             .join(sh.select(F.col("doc_id").alias("id_a"),
                             F.col("hset").alias("sh_a")), "id_a")
             .join(sh.select(F.col("doc_id").alias("id_b"),
                             F.col("hset").alias("sh_b")), "id_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
        force(j.withColumn("jaccard", F.round(inter / union, 6))
               .filter(F.col("jaccard") >= 0.7)
               .select("id_a", "id_b", "jaccard"))
    timed("verify", verify)

    timed("full", lambda: force(dedup_near(corpus, threshold=0.7)))

    print(json.dumps({"cpus": cpus, "extra": extra,
                      "n_docs": corpus.count(), "timings": timings,
                      "cpu_secs": cpu_secs}))
    spark.stop()


if __name__ == "__main__":
    main()
