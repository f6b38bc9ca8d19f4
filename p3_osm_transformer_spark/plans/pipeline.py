"""The flagship enrichment pipeline — reference lifecycle E1 as one DAG.

Reference E1 (SURVEY.md §3): HTTP body → parse → XSLT → Jena store →
Lucene+SPARQL geocode → RDF out.  Engine E1: one declarative DataFrame
chain over the image+caption table:

    images → extract geotag (regexp, codegen)
           → geocell/tile encode (column math)
           → kNN reverse geocode to nearest OSM address (ring join + window)
           → enriched rows (image_id, caption, lat, lon, cells, tiles,
             nearest addr_id/street/dist)

Rows without a geotag stay in the output with NULL geo columns (dirty-data
path, F9 analogue: they simply never join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.geotag import extract_geotag
from p3_osm_transformer_spark.operators.knn import (
    knn_bruteforce,
    knn_hex,
    knn_ring,
)
from p3_osm_transformer_spark.operators.tile_assign import assign_tiles

# The flagship's branch-point persist must outlive this function (the
# returned DataFrame is lazy), so the handle is parked here and released
# on the NEXT enrich_images call (bounded at one live cache per session)
# or explicitly via release_enrich_cache() — same hygiene contract the
# dedup operators enforce (test_dedup_caches_released).
_TAGGED_CACHE: list[DataFrame] = []


def release_enrich_cache() -> None:
    """Release the persisted branch-point table of the last enrich_images
    call.  Call after the returned DataFrame has been materialized."""
    while _TAGGED_CACHE:
        _TAGGED_CACHE.pop().unpersist()


from contextlib import contextmanager  # noqa: E402


@contextmanager
def enrich_images_scope(images: DataFrame, addresses: DataFrame, **kw):
    """Deterministic-release form (VERDICT r3 nit): the branch-point
    persist is released when the block exits instead of parking on the
    module-global until the next call.

        with enrich_images_scope(images, addrs) as enriched:
            enriched.write...   # materialize INSIDE the block
    """
    try:
        yield enrich_images(images, addresses, **kw)
    finally:
        release_enrich_cache()


def enrich_images(images: DataFrame, addresses: DataFrame,
                  knn_strategy: str = "ring",
                  geotag: str = "caption",
                  n_addresses: int | None = None) -> DataFrame:
    if geotag == "caption+exif":
        # north-star rule: caption regexp (codegen) wins; EXIF GPS parse
        # (Arrow UDF) only ever sees the caption-misses; single image scan
        from p3_osm_transformer_spark.operators.exif import (
            geotag_caption_or_exif)
        tagged = geotag_caption_or_exif(images)
    else:
        tagged = extract_geotag(images).drop("bytes")
    # tagged feeds the geo branch (tiles + kNN + join) AND the no-geo
    # union branch — persist the (bytes-free, narrow) table at the branch
    # point so the images scan + geotag pass run exactly once.  At
    # warehouse scale this persist is the snapshot write between pipeline
    # stages (sources/catalog.py); in one session MEMORY_AND_DISK is the
    # same move.
    from pyspark.storagelevel import StorageLevel
    release_enrich_cache()   # at most one live flagship cache per session
    tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    _TAGGED_CACHE.append(tagged)
    geo = tagged.filter(F.col("lat").isNotNull())
    # true S2 ids at level 12 and aperture-7 hexcells at res 9 ride along
    # (north star: "H3 … and S2 cell encodes" on the enriched record);
    # geocell columns cover the H3-alias resolutions 7-10, hexcell adds
    # the true-hexagon hierarchy.  NOTE on the enriched record's `hex_9`
    # column: the ids are H3-STYLE but NOT H3-interoperable (own canonical
    # icosahedron orientation, per-face unstitched lattices, no pentagons,
    # ~half-resolution offset — functions/hexcell.py module docstring) —
    # do not join them against real H3 indexes; `s2_12` IS bit-exact
    # published-S2 and safe to join externally.
    geo = assign_tiles(geo, s2_levels=(12,), hex_resolutions=(9,))

    pts = geo.select(F.col("image_id").alias("point_id"), "lon", "lat")
    addr = addresses.select("addr_id", "street_address", "lat", "lon")
    if knn_strategy == "ring":
        # g=None → density-picked resolution (pick_resolution), so the ring
        # join stays productive whether addresses number 10^2 or 10^9;
        # n_addresses (Catalog.row_count metadata) skips the sizing scan
        nn = knn_ring(pts, addr, k=1, g=None, start_ring=2,
                      n_addresses=n_addresses)
    elif knn_strategy == "hex":
        # hexagonal access path (seam-aware k-ring + disk-doubling rounds,
        # operators/knn.py knn_hex): same exact-top-k contract as "ring"
        # (flagship-with-hex == flagship-with-ring, tested on a
        # seam-straddling fixture), ~isotropic probe disks; resolution
        # picked by the same density heuristic, rescaled for the grid:
        # geocell areas shrink 4× per g step, aperture-7 hex areas 7× per
        # res step, so the equal-density level is g·ln4/ln7 ≈ 0.712·g
        import math

        from p3_osm_transformer_spark.operators.knn import pick_resolution
        n_addr = (n_addresses if n_addresses is not None
                  else addresses.count())
        hex_res = max(2, min(15, round(
            pick_resolution(n_addr) * math.log(4) / math.log(7))))
        nn = knn_hex(pts, addr, k=1, res=hex_res)
    else:
        nn = knn_bruteforce(pts, addr, k=1)
    nn = nn.select(F.col("point_id").alias("image_id"),
                   F.col("addr_id").alias("nearest_addr_id"),
                   F.col("dist_m").alias("nearest_dist_m"))

    enriched = geo.join(nn, "image_id", "left")
    no_geo = tagged.filter(F.col("lat").isNull())
    return enriched.unionByName(no_geo, allowMissingColumns=True)
