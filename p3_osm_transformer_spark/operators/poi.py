"""POI category extraction — the reference's osm2rdf.xsl pipeline (F5).

Reference rules (osm2rdf.xsl):
* nodes: id > 0 ∧ public_transport = 'stop_position' → BusStop with the
  node's own lat/lon (xsl:40-46).  NB the name is NOT required non-empty
  for bus stops — reference quirk, preserved.
* ways: id > 0 ∧ name ≠ '' ∧ (amenity ∈ {place_of_worship, school,
  restaurant} ∨ tourism = 'museum') (xsl:57,85,100,116); label =
  translate(name, '"' → \"'\") (xsl:61); anchor lat/lon = first nd's node
  (xsl:63-67, the J4 semantic); a Polygon WKT from all nds (xsl:69-81).

Output schema: poi_id, poi_type, label, see_also, lat, lon, wkt (ways only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.osm import valid_entities

_t = lambda k: F.col("tags").getItem(k)  # noqa: E731

WAY_CATEGORIES = {
    "place_of_worship": ("amenity", "PlaceOfWorship"),
    "school": ("amenity", "School"),
    "restaurant": ("amenity", "Restaurant"),
    "museum": ("tourism", "Museum"),
}


def bus_stops(nodes: DataFrame) -> DataFrame:
    return valid_entities(nodes).filter(
        _t("public_transport") == "stop_position").select(
        F.concat(F.lit("urn:osm:uuid:"), F.col("id").cast("string")).alias("poi_id"),
        F.lit("BusStop").alias("poi_type"),
        _t("name").alias("label"),
        F.concat(F.lit("http://www.openstreetmap.org/node/"),
                 F.col("id").cast("string")).alias("see_also"),
        F.col("lat"), F.col("lon"),
        F.lit(None).cast("string").alias("wkt"))


def way_pois(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    cat = F.lit(None).cast("string")
    for value, (key, type_name) in WAY_CATEGORIES.items():
        cat = F.when(_t(key) == value, F.lit(type_name)).otherwise(cat)
    w = (valid_entities(ways)
         .withColumn("poi_type", cat)
         .filter(F.col("poi_type").isNotNull()
                 & _t("name").isNotNull() & (_t("name") != ""))
         .withColumn("first_ref", F.col("node_refs")[0]))
    n = valid_entities(nodes).select(
        F.col("id").alias("_nid"), F.col("lat").alias("_nlat"),
        F.col("lon").alias("_nlon"))
    anchored = w.join(n, w.first_ref == F.col("_nid"), "inner")

    # polygon WKT from all refs — same join+ordered-collect as way_geometries
    pts_src = (w.select(F.col("id").alias("_wid"),
                        F.posexplode("node_refs").alias("pos", "ref"))
               .join(nodes.selectExpr("id as ref", "lon as p_lon", "lat as p_lat"),
                     "ref", "inner"))
    coord = lambda p: F.format_string("%.7f %.7f", p["p_lon"], p["p_lat"])  # noqa: E731
    polys = (pts_src.groupBy("_wid")
             .agg(F.array_sort(F.collect_list(F.struct("pos", "p_lon", "p_lat")))
                  .alias("pts"))
             .select("_wid", F.format_string(
                 "POLYGON ((%s))",
                 F.concat_ws(", ", F.transform(F.col("pts"), coord))).alias("wkt")))

    return (anchored.join(polys, anchored.id == polys._wid, "left")
            .select(
                F.concat(F.lit("urn:osm:uuid:"), F.col("id").cast("string")).alias("poi_id"),
                F.col("poi_type"),
                F.translate(_t("name"), '"', "'").alias("label"),
                F.concat(F.lit("http://www.openstreetmap.org/way/"),
                         F.col("id").cast("string")).alias("see_also"),
                F.col("_nlat").alias("lat"), F.col("_nlon").alias("lon"),
                F.col("wkt")))


def extract_pois(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    return bus_stops(nodes).unionByName(way_pois(ways, nodes))
