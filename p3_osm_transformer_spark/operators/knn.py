"""kNN reverse geocode — cell-ring expansion + window (SURVEY.md §2 J-ext).

The engine's one true analytic window (SURVEY.md §2 W-note): candidates
come from a geocell ring expansion (explode k-ring probe cells, equi-join
the address table's cell column), then ``row_number()`` over
``(haversine, addr_id)`` picks the k nearest — addr_id tie-break makes the
pick deterministic (SURVEY.md §7 stage 4).

Completeness: a ring-k join at resolution g guarantees correctness only if
the true nearest neighbor lies within k cells.  The driver loop doubles k
for the residual points that found < k neighbors (iterative expansion,
SURVEY.md §4 custom item 3) and falls back to a brute-force join for the
final stragglers — bounded iterations, each a pure DataFrame op.

``knn_bruteforce`` is the oracle twin (exhaustive cross join + window) —
also the correct plan when one side is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from p3_osm_transformer_spark.functions.geocell import (
    cell_id,
    expand_ring,
    haversine_m,
)


OUT_COLS = ["point_id", "addr_id", "dist_m", "knn_rank"]


def _rank_topk(cand: DataFrame, point_id: str, k: int) -> DataFrame:
    # deterministic tie-break on (dist, addr_id, source-disambiguator if present)
    order = [F.col("dist_m").asc(), F.col("addr_id").asc()]
    w = Window.partitionBy(point_id).orderBy(*order)
    return (cand.withColumn("knn_rank", F.row_number().over(w))
                .filter(F.col("knn_rank") <= k)
                .select(point_id, "addr_id", "dist_m", "knn_rank"))


def knn_bruteforce(points: DataFrame, addresses: DataFrame,
                   point_id: str = "point_id", k: int = 1) -> DataFrame:
    """Exhaustive kNN: cross join + haversine + window.  O(P×A) — the
    oracle / small-side plan."""
    a = addresses.select(
        "addr_id", F.col("lat").alias("a_lat"), F.col("lon").alias("a_lon"))
    cand = (points.crossJoin(a)
            .withColumn("dist_m", haversine_m(
                F.col("lon"), F.col("lat"), F.col("a_lon"), F.col("a_lat"))))
    return _rank_topk(cand, point_id, k)


def pick_resolution(n_addresses: int) -> int:
    """Density heuristic: choose g so one ring-probe region holds O(k)
    addresses — 4^g ≈ n_addresses (uniform case), i.e. g ≈ log4(n).
    Clamped to [3, 19]; skewed tables resolve hot areas in round 1 and
    sparse areas through ring doubling / the brute-force tail."""
    import math
    return max(3, min(19, round(math.log2(max(n_addresses, 2)) / 2)))


def knn_ring(points: DataFrame, addresses: DataFrame,
             point_id: str = "point_id", k: int = 1, g: int | None = 15,
             start_ring: int = 1, max_rounds: int = 3) -> DataFrame:
    """Scale-path kNN via iterative cell-ring expansion.

    Round r probes rings of radius ``start_ring * 2^r``; points that found
    ≥ k candidates in an INNER ring that dominates the ring boundary are
    final.  Simplified sound rule used here: a point is resolved in round
    r if it has ≥ k candidates whose distance ≤ (ring_r - 1) * cell_min_edge
    (candidates beyond the probed ring cannot be closer).  Residual points
    go to the next round; after ``max_rounds`` the leftovers are brute-forced
    (at planet scale the leftovers are the ocean-photo tail — tiny).
    """
    if g is None:
        g = pick_resolution(addresses.count())
    a = addresses.select(
        "addr_id", F.col("lat").alias("a_lat"), F.col("lon").alias("a_lon"),
        cell_id(F.col("lon"), F.col("lat"), g).alias("a_cell")).cache()

    pts = points.withColumn("p_cell", cell_id(F.col("lon"), F.col("lat"), g)).cache()
    resolved: DataFrame | None = None
    # Termination bound: a point may stop expanding only if its kth-nearest
    # candidate is provably closer than ANY cell outside the probed ring.
    # The binding direction is longitudinal at high latitude (lon cell edge
    # shrinks with cos φ), so the bound is per-point:
    #   safe(p) = (ring-1) · min(lat_edge_m, lon_edge_m · cos(φ_band))
    # with φ_band the worst (largest) |lat| anywhere in the probed band.
    lat_cell_deg = 180.0 / (2**g)
    lat_edge_m = lat_cell_deg * 111_194.9
    lon_edge_eq_m = 360.0 / (2**g) * 111_319.49

    for r in range(max_rounds):
        ring = start_ring * (2**r)
        cand = (expand_ring(pts, "p_cell", g, ring, out_col="probe_cell")
                .join(a, F.col("probe_cell") == F.col("a_cell"), "inner")
                .withColumn("dist_m", haversine_m(
                    F.col("lon"), F.col("lat"), F.col("a_lon"), F.col("a_lat")))
                .drop("probe_cell", "a_cell"))
        topk = _rank_topk(cand, point_id, k).cache()
        band_lat = F.least(F.abs(F.col("lat")) + F.lit((ring + 1) * lat_cell_deg),
                           F.lit(89.9999))
        safe_radius = (F.lit(float(max(ring - 1, 0)))
                       * F.least(F.lit(lat_edge_m),
                                 F.lit(lon_edge_eq_m) * F.cos(F.radians(band_lat))))
        plats = pts.select(point_id, "lat")
        kth = (topk.groupBy(point_id)
               .agg(F.max("dist_m").alias("_kth"), F.count("*").alias("_n"))
               .join(plats, point_id))
        done_ids = kth.filter((F.col("_n") >= k) & (F.col("_kth") <= safe_radius)) \
                      .select(point_id)
        got = topk.join(done_ids, point_id, "left_semi")
        resolved = got if resolved is None else resolved.unionByName(got)
        # cache the shrinking residual so each round's lineage stays flat
        pts = pts.join(done_ids, point_id, "left_anti").cache()

    leftovers = knn_bruteforce(pts.drop("p_cell"), addresses, point_id, k)
    return resolved.unionByName(leftovers) if resolved is not None else leftovers
