"""Deterministic synthetic fixture tables (FIXTURES.md §1-§5).

All generation is **distributed column math over spark.range** — no driver
loops, no wall clock, no network, no external data.  The same generator that
makes 500 test rows makes 10^12 rows on a real cluster: spark.range is
split across executors and every derived column is Catalyst-evaluated.

Fixture semantics mirror the reference test resources
(/root/reference/src/test/resources/eu/fusepool/p3/osm/): nodes/ways with
addr:* tags (osm-xml-example.osm:4-18), the Via Thaon de Revel address
cluster (giglio_island.osm:12322-12350), negative JOSM ids (filtered by
OsmXmlParser.java:85), quote-bearing street names (stripped per
osm-addresses.xsl:45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.images import phash_of_bytes, synth_image_bytes

# Vocabulary (deterministic, indexed by key modulo)
STREETS = [
    "Via Thaon de Revel", 'Via "Roma"', "Via Garibaldi", "Corso Italia",
    "Hauptstrasse", "Bahnhofstrasse", "Rue de la Paix", "Avenue Victor Hugo",
    "Via Dante", "Piazza del Duomo", "Lungomare Colombo", "Via Trento",
]
LOCALITIES = [
    ("Giglio Porto", "IT"), ("Trento", "IT"), ("Roma", "IT"), ("Milano", "IT"),
    ("Berlin", "DE"), ("Hamburg", "DE"), ("Paris", "FR"), ("Lyon", "FR"),
]
AMENITIES = ["place_of_worship", "school", "restaurant", "museum", "cafe"]

# The giglio cluster anchor (reference README.md:53-63 canonical example)
HOT_LAT, HOT_LON = 42.3600902, 10.9195731


def _street(key):
    return F.element_at(F.lit(STREETS), (F.pmod(key, F.lit(len(STREETS))) + 1).cast("int"))


def _locality(key):
    locs = [l for l, _ in LOCALITIES]
    return F.element_at(F.lit(locs), (F.pmod(key, F.lit(len(locs))) + 1).cast("int"))


def _country(key):
    ccs = [c for _, c in LOCALITIES]
    return F.element_at(F.lit(ccs), (F.pmod(key, F.lit(len(ccs))) + 1).cast("int"))


def _lonlat(key):
    """Skewed deterministic coordinates: 30% in the hot (giglio-like) cell
    cluster — exercises salting/AQE skew handling — rest spread worldwide."""
    hot = F.pmod(key, F.lit(10)) < 3
    lat = F.when(hot, F.lit(HOT_LAT) + (F.pmod(key, F.lit(2000)) - 1000) / 100000.0) \
           .otherwise((F.pmod(key * 9973, F.lit(160000))) / 1000.0 - 80.0)
    lon = F.when(hot, F.lit(HOT_LON) + (F.pmod(key * 7, F.lit(3000)) - 1500) / 100000.0) \
           .otherwise((F.pmod(key * 7919, F.lit(360000))) / 1000.0 - 180.0)
    return lon, lat


def _opt_map(*pairs) -> F.Column:
    """map from (key, value) pairs, dropping null/empty values (F3 semantics)."""
    entries = F.array(*[F.struct(F.lit(k).alias("key"), v.alias("value")) for k, v in pairs])
    m = F.map_from_entries(F.filter(entries, lambda e: e["value"].isNotNull()))
    return m


def osm_nodes(spark: SparkSession, n: int = 2000) -> DataFrame:
    """<node id lat lon><tag/></node> table (FIXTURES.md §2)."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "k")
    key = F.col("k")
    lon, lat = _lonlat(key)
    is_addr = F.pmod(key, F.lit(5)) == 0
    is_street_only = F.pmod(key, F.lit(35)) == 1          # street but NO housenumber → filtered (F2)
    is_poi = F.pmod(key, F.lit(17)) == 0
    has_loc = F.pmod(key, F.lit(10)) < 8
    tags = _opt_map(
        ("addr:street", F.when(is_addr | is_street_only, _street(key))),
        ("addr:housenumber", F.when(is_addr, (F.pmod(key, F.lit(200)) + 1).cast("string"))),
        ("addr:city", F.when(is_addr & has_loc, _locality(key))),
        ("addr:country", F.when(is_addr & has_loc, _country(key))),
        ("amenity", F.when(is_poi, F.element_at(
            F.lit(AMENITIES), (F.pmod(key, F.lit(len(AMENITIES))) + 1).cast("int")))),
        ("name", F.when(is_poi, F.concat(F.lit("POI "), key.cast("string")))),
    )
    # every 97th node gets a negative (JOSM-uncommitted) id → must be filtered
    node_id = F.when(F.pmod(key, F.lit(97)) == 0, -key).otherwise(key)
    return df.select(node_id.alias("id"), lat.alias("lat"), lon.alias("lon"),
                     tags.alias("tags"))


def osm_ways(spark: SparkSession, n: int = 400, n_nodes: int = 2000,
             pts_per_way: int = 5) -> DataFrame:
    """<way id><nd ref/>…<tag/></way> table (FIXTURES.md §3)."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "k")
    key = F.col("k")
    refs = F.transform(
        F.sequence(F.lit(0), F.lit(pts_per_way - 1)),
        lambda i: F.pmod(key * 37 + i * 13, F.lit(n_nodes)) + 1)
    # closed ways (polygons): first == last ref
    refs = F.when(F.pmod(key, F.lit(4)) == 0,
                  F.concat(refs, F.slice(refs, 1, 1))).otherwise(refs)
    # dangling ref (join-miss path): one ref points at an absent node
    refs = F.when(F.pmod(key, F.lit(23)) == 0,
                  F.concat(refs, F.array(F.lit(n_nodes) + 1000 + key))).otherwise(refs)
    is_hwy = F.pmod(key, F.lit(3)) == 0
    is_addr = F.pmod(key, F.lit(7)) == 1
    is_amen = F.pmod(key, F.lit(11)) == 2
    tags = _opt_map(
        ("highway", F.when(is_hwy, F.lit("residential"))),
        ("name", F.when(is_hwy, F.concat(F.lit("Strada "), key.cast("string")))),
        ("addr:street", F.when(is_addr, _street(key))),
        ("addr:housenumber", F.when(is_addr, (F.pmod(key, F.lit(80)) + 1).cast("string"))),
        ("addr:city", F.when(is_addr, _locality(key))),
        ("addr:country", F.when(is_addr, _country(key))),
        ("amenity", F.when(is_amen, F.element_at(
            F.lit(AMENITIES), (F.pmod(key, F.lit(len(AMENITIES))) + 1).cast("int")))),
    )
    way_id = F.when(F.pmod(key, F.lit(41)) == 0, -key).otherwise(key)
    return df.select(way_id.alias("id"), refs.alias("node_refs"), tags.alias("tags"))


def admin_polygons(spark: SparkSession, n: int = 64) -> DataFrame:
    """Rectangular + L-shaped admin polygons with WKT (FIXTURES.md §4).

    Rectangles tile a deterministic lat/lon lattice; every 8th polygon is
    L-shaped (non-convex) to force the exact ray-cast refine path.  A
    nested pair (city-inside-country) appears at ids 1/2.
    """
    df = spark.range(1, n + 1).withColumnRenamed("id", "k")
    key = F.col("k")
    lon0 = (F.pmod(key * 131, F.lit(340))).cast("double") - 170.0
    lat0 = (F.pmod(key * 89, F.lit(150))).cast("double") - 75.0
    w = F.when(key == 1, F.lit(8.0)).when(key == 2, F.lit(2.0)) \
        .otherwise(2.0 + F.pmod(key, F.lit(5)).cast("double"))
    h = F.when(key == 1, F.lit(8.0)).when(key == 2, F.lit(2.0)) \
        .otherwise(1.0 + F.pmod(key, F.lit(4)).cast("double"))
    # nested pair shares an origin; hot polygon 3 covers the giglio cluster
    lon0 = F.when(key.isin(1, 2), F.lit(8.0)) \
            .when(key == 3, F.lit(HOT_LON - 1.0)).otherwise(lon0)
    lat0 = F.when(key.isin(1, 2), F.lit(40.0)) \
            .when(key == 3, F.lit(HOT_LAT - 1.0)).otherwise(lat0)
    lon1, lat1 = lon0 + w, lat0 + h
    is_l = (F.pmod(key, F.lit(8)) == 0)
    rect_wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))",
        lon0, lat0, lon1, lat0, lon1, lat1, lon0, lat1, lon0, lat0)
    lshape_wkt = F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f, "
        "%.6f %.6f, %.6f %.6f))",
        lon0, lat0, lon1, lat0, lon1, lat0 + h / 2, lon0 + w / 2, lat0 + h / 2,
        lon0 + w / 2, lat1, lon0, lat1, lon0, lat0)
    return df.select(
        key.alias("polygon_id"),
        F.concat(F.lit("admin-"), key.cast("string")).alias("name"),
        F.when(key == 1, F.lit(2)).when(key == 2, F.lit(8))
         .otherwise((F.pmod(key, F.lit(7)) + 2).cast("int")).alias("admin_level"),
        F.when(is_l, lshape_wkt).otherwise(rect_wkt).alias("wkt"),
        lon0.alias("bbox_lon0"), lat0.alias("bbox_lat0"),
        lon1.alias("bbox_lon1"), lat1.alias("bbox_lat1"),
        is_l.alias("non_convex"),
    )


def query_addresses(spark: SparkSession, n: int = 64) -> DataFrame:
    """Geocode query table mirroring input_data.ttl (FIXTURES.md §5):
    exact hits, token-overlap-only hits, wrong-locality misses, empty street."""
    df = spark.range(1, n + 1).withColumnRenamed("id", "k")
    key = F.col("k")
    kind = F.pmod(key, F.lit(8))
    street = F.concat(F.translate(_street(key * 5), '"', ""), F.lit(" "),
                      (F.pmod(key * 5, F.lit(200)) + 1).cast("string"))
    street = F.when(kind == 6, F.lit("")) \
              .when(kind == 5, F.concat(F.lit("Unknown Alley "), key.cast("string"))) \
              .otherwise(street)
    loc = F.when(kind == 4, F.lit("Atlantis")).otherwise(_locality(key * 5))
    cc = F.when(kind == 4, F.lit("XX")).otherwise(_country(key * 5))
    return df.select(
        F.format_string("q-%04d", key).alias("query_id"),
        street.alias("street_address"), loc.alias("locality"), cc.alias("country"))


def images_table(spark: SparkSession, n: int = 500, with_bytes: bool = True,
                 geotag_fraction_pct: int = 90) -> DataFrame:
    """The north-rule input table (image_id, bytes, w, h, fmt, caption, phash).

    Captions embed a geotag for ~geotag_fraction_pct% of rows
    ("… @ geo:<lat>,<lon>"), the rest are the dirty-data path.
    """
    df = spark.range(0, n).withColumnRenamed("id", "k")
    key = F.col("k") + 1
    lon, lat = _lonlat(key)
    has_geo = F.pmod(key, F.lit(100)) < geotag_fraction_pct
    caption = F.when(
        has_geo,
        F.format_string("View near %s %d, %s, %s @ geo:%.7f,%.7f",
                        F.translate(_street(key), '"', ""),
                        F.pmod(key, F.lit(200)) + 1, _locality(key), _country(key),
                        lat, lon)
    ).otherwise(F.format_string("Untagged snapshot %d of %s", key, _locality(key)))
    w = F.element_at(F.lit([64, 128, 64]), (F.pmod(key, F.lit(3)) + 1).cast("int"))
    h = F.element_at(F.lit([64, 64, 128]), (F.pmod(key, F.lit(3)) + 1).cast("int"))
    fmt = F.when(F.pmod(key, F.lit(2)) == 0, F.lit("png")).otherwise(F.lit("jpeg"))
    out = df.select(
        F.format_string("img-%08d", key).alias("image_id"),
        w.cast("int").alias("w"), h.cast("int").alias("h"), fmt.alias("fmt"),
        caption.alias("caption"), key.alias("_seed"))
    if with_bytes:
        out = out.withColumn("bytes", synth_image_bytes("_seed", "w", "h", "fmt"))
        out = out.withColumn("phash", phash_of_bytes("bytes"))
    else:
        out = out.withColumn("bytes", F.lit(None).cast("binary")) \
                 .withColumn("phash", F.lit(0).cast("long"))
    return out.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
