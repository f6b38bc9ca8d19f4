"""Physical-plan audit: assert the plans are the ones we want at scale.

For each audited operator: capture `.explain("formatted")`, assert plan
properties (pushdown reached the scan, broadcast where intended, no
cartesian product outside the explicit brute-force paths, codegen spans),
and write a human-readable digest to PLANS.md.

Run: python tools/plan_audit.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from p3_osm_transformer_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="plan-audit")
    checks: list[tuple[str, str, list[str], list[str]]] = []

    def audit(name: str, df, must: list[str], must_not: list[str]) -> None:
        p = plan_of(df)
        ok = all(m in p for m in must) and not any(m in p for m in must_not)
        checks.append((name, p, must, must_not))
        status = "OK" if ok else "VIOLATION"
        print(f"{name}: {status}")
        if status == "VIOLATION":
            missing = [m for m in must if m not in p]
            present = [m for m in must_not if m in p]
            print(f"  missing={missing} forbidden-present={present}")

    li = spark.read.parquet(f"{SF}/lineitem.parquet")

    # 1. filter+project must push to the scan
    audit("q01 scan pushdown",
          li.filter((F.col("l_quantity") > 45.0) & (F.col("l_returnflag") == "R"))
            .select("l_orderkey", "l_quantity"),
          must=["PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_returnflag), "
                "GreaterThan(l_quantity,45.0), EqualTo(l_returnflag,R)",
                "[codegen id :"],
          must_not=["CartesianProduct"])

    # 2. dim-join chain goes broadcast, scan reads only needed columns
    import p3_osm_transformer_spark.contract as C
    audit("q03 broadcast dims", C.QUERIES["q03_broadcast_dim_join"](spark, SF),
          must=["BroadcastHashJoin"], must_not=["SortMergeJoin", "CartesianProduct"])

    # 3. PIP: broadcast candidate join, no cartesian, Python only in refine
    from p3_osm_transformer_spark.operators.pip import pip_join
    from p3_osm_transformer_spark.sources.fixtures import admin_polygons, osm_nodes
    pts = osm_nodes(spark, 500).filter("id>0").selectExpr("id as point_id", "lon", "lat")
    audit("pip filter-refine", pip_join(pts, admin_polygons(spark, 32)),
          must=["BroadcastHashJoin", "MapInPandas"],
          must_not=["CartesianProduct", "BroadcastNestedLoopJoin"])

    # 4. geocode token-join: hash joins on composite keys, single distinct
    from p3_osm_transformer_spark.contract_ext import QUERIES as Q2
    audit("geocode token-join", Q2["q35_geocode_tokens"](spark, SF),
          must=["HashAggregate"], must_not=["CartesianProduct",
                                            "BroadcastNestedLoopJoin"])

    # 5. salted agg: two HashAggregate phases, no extra shuffle beyond them
    audit("salted two-phase agg", Q2["q32_salted_agg"](spark, SF),
          must=["HashAggregate"], must_not=["CartesianProduct"])

    # 5b. headline spatial enrich: the rect containment test is
    # inequality-only, but the RIGHT plan is NOT the BroadcastNestedLoop
    # join Spark would pick for it — BNLJ does not participate in
    # whole-stage codegen, so every input row materializes an UnsafeRow
    # at the join boundary (~130GB of memory traffic on the 1.23B-row
    # headline; 1.34× executor-CPU inflation measured at local[32]).
    # pip_join_rect therefore plans the same filter-refine shape as the
    # polygon path: cover-cell broadcast HASH equi-join + codegen'd bbox
    # residual filter, one codegen span from range to partial aggregate.
    # Only one shuffle: the final partial->final aggregate. No Python in
    # the loop. (AQE hides [codegen id] annotations pre-execution, so
    # codegen is asserted on the non-adaptive audits above.)
    from p3_osm_transformer_spark.contract import point_cols
    from p3_osm_transformer_spark.operators.pip import pip_join_rect
    from p3_osm_transformer_spark.operators.tile_assign import assign_tiles
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    key = F.col("id") + 1
    lon, lat = point_cols(key)
    hpts = spark.range(0, 100000).select(
        key.alias("point_id"), lon.alias("lon"), lat.alias("lat"))
    rects = nat.select(
        "n_nationkey",
        ((((F.col("n_nationkey") * 131) % 340) - 170.0)).alias("bbox_lon0"),
        ((((F.col("n_nationkey") * 89) % 150) - 75.0)).alias("bbox_lat0")) \
        .withColumn("bbox_lon1", F.col("bbox_lon0") + 30.0) \
        .withColumn("bbox_lat1", F.col("bbox_lat0") + 20.0)
    htiled = assign_tiles(hpts, zooms=(12, 15), cell_resolutions=(7, 8, 9, 10))
    hagg = (pip_join_rect(htiled, F.broadcast(rects))
            .groupBy("n_nationkey")
            .agg(F.count("*").alias("n_pts"), F.sum("tile_z15").alias("cs")))
    audit("headline spatial enrich + tile agg", hagg,
          must=["BroadcastHashJoin", "HashAggregate", "BroadcastExchange"],
          must_not=["CartesianProduct", "SortMergeJoin", "BatchEvalPython",
                    "BroadcastNestedLoopJoin"])

    # 6. kNN k=1: the agg path must plan as partial-aggregable HashAggregate
    # (map-side combine before the shuffle) with NO analytic Window, and the
    # small address side must broadcast into the probe join.
    from p3_osm_transformer_spark.operators.knn import knn_ring
    supp = spark.read.parquet(f"{SF}/supplier.parquet")
    kpts = osm_nodes(spark, 2000).filter("id>0") \
        .selectExpr("id as point_id", "lon", "lat")
    kaddrs = supp.selectExpr("cast(s_suppkey as string) as addr_id") \
        .withColumn("lon", (F.col("addr_id").cast("long") * 37 % 360 - 180.0)) \
        .withColumn("lat", (F.col("addr_id").cast("long") * 17 % 170 - 85.0))
    # the ring loop executes eagerly per round (one checkpointed action);
    # plan_probe hands back the exact per-round DataFrame the action ran
    probe: list = []
    knn_ring(kpts, kaddrs, k=1, g=6, start_ring=1, max_rounds=1,
             plan_probe=probe)
    # struct-buffer min → two-phase SortAggregate (partial below the
    # Exchange = map-side combine); the probe join must broadcast; never
    # a Window (that would shuffle every candidate pair)
    audit("knn k=1 agg path (round-1 plan)", probe[0],
          must=["SortAggregate", "BroadcastHashJoin", "Exchange"],
          must_not=["Window", "CartesianProduct"])

    # 6b. flagship geotag: caption+exif composition must scan the images
    # table ONCE — caption regexp as a projection, one Arrow pass for the
    # EXIF fill, both consumer branches (geo / no-geo) reading the persisted
    # tagged table (InMemoryTableScan), never a second scan+MapInPandas.
    from p3_osm_transformer_spark.plans.pipeline import enrich_images
    from p3_osm_transformer_spark.sources.fixtures import images_table
    fimgs = images_table(spark, 300)
    fout = enrich_images(fimgs, kaddrs.selectExpr(
        "addr_id", "'x' as street_address", "lat", "lon"),
        knn_strategy="brute", geotag="caption+exif")
    import re
    fplan = plan_of(fout)
    # every MapInPandas occurrence must be the SAME plan node (one geotag
    # pass), re-printed only inside the InMemoryRelation each branch reads
    mip_ids = set(re.findall(r"MapInPandas \((\d+)\)", fplan))
    n_imts = fplan.count("InMemoryTableScan (")
    ok = len(mip_ids) <= 1 and n_imts >= 2 and "InMemoryRelation" in fplan
    checks.append(("flagship single-scan geotag", fplan,
                   ["exactly one MapInPandas plan node (the single geotag "
                    "pass), cached; >=2 InMemoryTableScan consumers"],
                   ["a second MapInPandas node id (geotag re-run per "
                    "branch)"]))
    print(f"flagship single-scan geotag: {'OK' if ok else 'VIOLATION'} "
          f"(distinct MapInPandas nodes={len(mip_ids)}, "
          f"InMemoryTableScan={n_imts})")

    # 7. way geometries: posexplode+join+agg, shuffles bounded
    from p3_osm_transformer_spark.operators.osm import way_geometries
    from p3_osm_transformer_spark.sources.fixtures import osm_ways
    audit("way geometry assembly",
          way_geometries(osm_ways(spark, 200, 1000), osm_nodes(spark, 1000)),
          must=["Generate", "HashAggregate"], must_not=["CartesianProduct"])

    # 8. minhash band build (r3.2 rewrite): explode → codegen'd hash
    # projection → partial/final HashAggregate minima.  Nothing
    # interpreted, nothing Python; exactly ONE exchange (the agg's
    # fixed-width (id, 8 longs) rows — elided on a doc_id-bucketed
    # source, and dominated by the band shuffle that always follows).
    # The prior shuffle-free interpreted-aggregate form evaluated with
    # boxed longs and was memory-bandwidth-bound (BENCH/BASELINE.md
    # stream control): 90.1 vs 61.9 CPU-s at local[32], same checksums.
    from p3_osm_transformer_spark.operators.dedup import minhash_bands
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    mb_plan = plan_of(minhash_bands(docs))
    # formatted plans print each node twice (tree line + "(n) Node"
    # detail): count the detail headers to count NODES
    n_exch = len(re.findall(r"\(\d+\) Exchange", mb_plan))
    mb_ok = (all(m in mb_plan for m in ("Generate", "HashAggregate"))
             and not any(m in mb_plan for m in
                         ("CartesianProduct", "BatchEvalPython", "MapInPandas"))
             and n_exch == 1)
    checks.append(("minhash band build (codegen explode + hash-agg)", mb_plan,
                   ["Generate", "HashAggregate", "exactly one Exchange"],
                   ["CartesianProduct", "BatchEvalPython", "MapInPandas"]))
    print("minhash band build (codegen explode + hash-agg): "
          f"{'OK' if mb_ok else 'VIOLATION'} "
          f"(exchanges={n_exch})")

    # 8b. dedup_near (r5 rewrite): the signature pass is ONE Arrow
    # MapInPandas map — no aggregate, no Exchange at all (the r4 JVM
    # construction burned 4× the CPU at 32 cores; tools/dedup_profile.py
    # + operators/dedup.py _doc_signatures_arrow docstring).  The
    # candidates→verify plan the caller executes reads the CHECKPOINTED
    # signature blocks from every side — no Python left in it, no
    # cartesian.
    from p3_osm_transformer_spark.operators.dedup import (
        _doc_signatures, dedup_near)
    audit("dedup signature pass (one Arrow map, zero exchanges)",
          _doc_signatures(docs, "doc_id", "text", 8, 2, 3, impl="arrow"),
          must=["MapInPandas"],
          must_not=["Exchange", "HashAggregate", "CartesianProduct",
                    "BatchEvalPython"])
    # r5.5: the verify projection is ONE vectorized ArrowEvalPython
    # pandas_udf (the flat-batch numpy Jaccard — the boxed
    # array_intersect form burned 7-16× the CPU at 32 cores); still no
    # row-at-a-time Python, no cartesian, and the candidates+verify plan
    # reads the checkpointed signature RDD, never re-tokenizes.
    dn_plan = plan_of(dedup_near(docs.limit(2000), threshold=0.7))
    audit("dedup_near candidates+verify (reads checkpointed signatures)",
          dedup_near(docs.limit(2000), threshold=0.7),
          must=["Scan ExistingRDD", "ArrowEvalPython"],
          must_not=["CartesianProduct", "BatchEvalPython", "MapInPandas"])
    # formatted explain prints each node once in the tree and once as a
    # "(N) ArrowEvalPython" detail header — count the headers.  Exactly
    # ONE: Catalyst would otherwise duplicate the verify UDF below the
    # threshold filter (the full per-pair exchange run twice) — see the
    # asNondeterministic evaluate-once barrier in _jaccard_arrow.
    import re as _re
    n_arrow = len(_re.findall(r"\(\d+\) ArrowEvalPython", dn_plan))
    print(f"  (dedup_near ArrowEvalPython nodes = {n_arrow}; must be 1)")
    assert n_arrow == 1, f"expected exactly 1 Arrow verify node, got {n_arrow}"

    # 9. ANN LSH (r3 bucket-join rewrite; r5.2 Arrow sketch; r5.3 long
    # bucket keys + fused Arrow re-rank): candidate dedup on bare (id,
    # long-bucket) pairs, embeddings re-joined for the exact re-rank.
    # Python appears ONLY as vectorized ArrowEvalPython pandas_udf nodes
    # (the sign sketch + the per-pair cosine) — never row-at-a-time
    # BatchEvalPython, never MapInPandas, never a cartesian/BNLJ.
    from p3_osm_transformer_spark.operators.simsearch import cosine_topk_lsh
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    aq = emb.filter("vec_id < 50").selectExpr("vec_id as query_id", "embedding")
    ac = emb.selectExpr("vec_id as neighbor_id", "embedding")
    audit("ann lsh bucket join + exact re-rank",
          cosine_topk_lsh(aq, ac, k=5, prefix_bits=6),
          must=["Window", "ArrowEvalPython"],
          must_not=["CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython", "MapInPandas"])

    # 9b. ANN LSH with caller-supplied n_queries stats (r5.4): the
    # candidate-pair side of the embedding fetch is broadcast
    # STATICALLY, so corpus embeddings stream map-side off the scan —
    # the plan must contain NO exchange hash-partitioned on the corpus
    # id (the r5.3 shuffled form wrote 653 MB of embeddings through
    # exactly that exchange at ANN_N=1.5M; AQE cannot skip the write
    # because it materializes both join children before re-planning).
    audit("ann lsh static broadcast embedding fetch (n_queries stats)",
          cosine_topk_lsh(aq, ac, k=5, prefix_bits=6, n_queries=50),
          must=["BroadcastHashJoin", "Window", "ArrowEvalPython"],
          must_not=["hashpartitioning(neighbor_id",
                    "CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython", "MapInPandas"])

    # 10. hexcell probe join (r4): seam-aware hex_kring explode + long-key
    # equi-join.  Python appears ONLY in the two cell encodes
    # (ArrowEvalPython pandas_udf nodes — one per side); the ring explode,
    # the join and the distance projection are codegen.  Never a
    # cartesian/BNLJ, never row-at-a-time Python.
    from p3_osm_transformer_spark.operators.knn import hex_ring_candidates
    audit("hex ring candidates (seam-aware probe join)",
          hex_ring_candidates(kpts, kaddrs, k=1, res=5),
          must=["Generate", "ArrowEvalPython"],
          must_not=["CartesianProduct", "BroadcastNestedLoopJoin",
                    "BatchEvalPython"])

    # write PLANS.md digest
    out = ["# PLANS.md — audited physical plans",
           "",
           "Generated by tools/plan_audit.py. Each section: the assertion set",
           "and the formatted physical plan actually produced.", ""]
    for name, p, must, must_not in checks:
        out += [f"## {name}", "",
                f"must contain: `{must}`  ",
                f"must NOT contain: `{must_not}`", "",
                "```", p.strip()[:4000], "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
