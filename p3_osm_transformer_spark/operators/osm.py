"""OSM relational core: address extraction + way-geometry assembly.

Reference semantics preserved exactly (SURVEY.md §7 "guiding translation"):

* Address rule (osm-addresses.xsl:43-83): a node/way qualifies iff
  ``id > 0 AND addr:street != '' AND addr:housenumber != ''``;
  ``street_address = translate(addr:street, '"', '') || ' ' || housenumber``
  (xsl:45,67); locality/country only when non-empty (xsl:47-52,69-74);
  a way's anchor coords are its FIRST nd's node (xsl:76-81, J4);
  ``addr_id = 'urn:osm:uuid:' || id`` (xsl:44,66), see_also URL (xsl:46,68).

* Highway rule (OsmXmlParser.java:91-107,318-330): a way qualifies iff it
  has a ``highway`` tag and non-empty ``name``; geometry = the way's nodes
  in nd order as ``lon lat`` pairs.  The reference emits the non-standard
  ``LineString((…))`` double-paren form (OsmXmlParser.java:319,329) — we
  emit standard WKT by default with ``compat_wkt=True`` for byte parity.

The reference implements the way/node join three ways (nested-loop
OsmXmlParser.java:109-134, sort+binary-search :147-275, XSLT key()
osm-addresses.xsl:30): all three ARE one Spark equi-join — Catalyst picks
broadcast-hash or sort-merge, AQE re-plans at runtime (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_t = lambda k: F.col("tags").getItem(k)  # noqa: E731


def _nonempty(c):
    return c.isNotNull() & (c != "")


def valid_entities(df: DataFrame) -> DataFrame:
    """F6: drop JOSM-uncommitted negative ids (OsmXmlParser.java:85)."""
    return df.filter(F.col("id") > 0)


def address_bearing(df: DataFrame) -> DataFrame:
    """F2: id>0 ∧ street≠'' ∧ housenumber≠'' (osm-addresses.xsl:43,65)."""
    return valid_entities(df).filter(
        _nonempty(_t("addr:street")) & _nonempty(_t("addr:housenumber")))


def _addr_columns(kind: str) -> list[F.Column]:
    """C1 concat + C2 quote-strip + F3 conditional projection + C6 URIs."""
    street_address = F.concat_ws(
        " ", F.translate(_t("addr:street"), '"', ""), _t("addr:housenumber"))
    opt = lambda c: F.when(_nonempty(c), c)  # noqa: E731
    return [
        F.concat(F.lit("urn:osm:uuid:"), F.col("id").cast("string")).alias("addr_id"),
        street_address.alias("street_address"),
        opt(_t("addr:city")).alias("locality"),
        opt(_t("addr:country")).alias("country"),
        F.col("lat"), F.col("lon"),
        F.lit(kind).alias("source"),
        F.concat(F.lit(f"http://www.openstreetmap.org/{kind}/"),
                 F.col("id").cast("string")).alias("see_also"),
    ]


def node_addresses(nodes: DataFrame) -> DataFrame:
    return address_bearing(nodes).select(*_addr_columns("node"))


def way_addresses(ways: DataFrame, nodes: DataFrame) -> DataFrame:
    """J4 first-node anchor join: way lat/lon = coords of node_refs[0]
    (osm-addresses.xsl:76-81).  The node side is joined on the first ref
    only — one equi-join, no explode."""
    w = address_bearing(ways).withColumn("first_ref", F.col("node_refs")[0])
    n = valid_entities(nodes).select(
        F.col("id").alias("_nid"), F.col("lat"), F.col("lon"))
    return (w.join(n, w.first_ref == F.col("_nid"), "inner")
             .select(*_addr_columns("way")))


def build_addresses(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """The full address table (replaces the Lucene-indexed Jena store, E3):
    node addresses ∪ way addresses (U1 union semantics,
    JenaTextConfig.java:142-159)."""
    return node_addresses(nodes).unionByName(way_addresses(ways, nodes))


def highway_ways(ways: DataFrame) -> DataFrame:
    """F4 (OsmXmlParser.java:98-106): highway tag present ∧ name non-empty."""
    return valid_entities(ways).filter(
        _t("highway").isNotNull() & _nonempty(_t("name")))


def way_geometries(ways: DataFrame, nodes: DataFrame,
                   compat_wkt: bool = False) -> DataFrame:
    """E2 pipeline: filter(F4) → posexplode → join(nodes) → ordered
    collect (A1) → WKT string-agg (A2).

    Exactly the reference's scan → filter → equi-join → group-by-way
    ordered collect → WKT (OsmXmlParser.java:147-275 + :318-330), as two
    shuffles.  Dangling nd refs (no matching node) drop out via the inner
    join — same as the reference's binarySearch miss path (:257-268).
    """
    w = highway_ways(ways).select(
        F.col("id").alias("way_id"), _t("name").alias("way_name"),
        F.posexplode("node_refs").alias("pos", "ref"))
    n = valid_entities(nodes).select(
        F.col("id").alias("ref"), F.col("lat"), F.col("lon"))
    joined = w.join(n, "ref", "inner")
    pts = (joined.groupBy("way_id", "way_name")
           .agg(F.array_sort(F.collect_list(F.struct("pos", "lon", "lat"))).alias("pts")))
    coord = lambda p: F.format_string("%.7f %.7f", p["lon"], p["lat"])  # noqa: E731
    body = F.concat_ws(", ", F.transform(F.col("pts"), coord))
    shell = ("LineString((%s))" if compat_wkt else "LINESTRING (%s)")
    return pts.select(
        "way_id", "way_name",
        F.transform("pts", lambda p: F.struct(p["lon"].alias("lon"),
                                              p["lat"].alias("lat"))).alias("points"),
        F.format_string(shell, body).alias("wkt"),
        F.concat(F.lit("http://fusepoolp3.eu/osm/way/"),
                 F.col("way_id").cast("string")).alias("way_uri"),
    )
