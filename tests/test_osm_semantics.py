"""Reference-semantics goldens: the rules of SURVEY.md §7 exactly.

These encode the reference's observable behavior (osm-addresses.xsl rules,
OsmXmlParser join semantics, OsmRdfTransformer output contract) on small
hand-built inputs, verified against hand-computed expectations.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from p3_osm_transformer_spark.operators import geocode, osm

NODE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("lat", T.DoubleType()),
    T.StructField("lon", T.DoubleType()),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])
WAY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("node_refs", T.ArrayType(T.LongType())),
    T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
])


def mk_nodes(spark, rows):
    return spark.createDataFrame(rows, NODE_SCHEMA)


def mk_ways(spark, rows):
    return spark.createDataFrame(rows, WAY_SCHEMA)


# The giglio fixture distilled: reference README.md:53-63 canonical example
GIGLIO_NODE = (848724518, 42.3600902, 10.9195731,
               {"addr:street": "Via Thaon de Revel", "addr:housenumber": "20",
                "addr:city": "Giglio Porto", "addr:country": "IT"})


def test_address_rule_f2_f6_c1(spark):
    nodes = mk_nodes(spark, [
        GIGLIO_NODE,
        # missing housenumber → NOT an address (osm-addresses.xsl:43)
        (2, 1.0, 1.0, {"addr:street": "Via Roma"}),
        # empty street → NOT an address
        (3, 1.0, 1.0, {"addr:street": "", "addr:housenumber": "5"}),
        # negative id (JOSM uncommitted) → dropped (OsmXmlParser.java:85)
        (-4, 1.0, 1.0, {"addr:street": "Via Dante", "addr:housenumber": "7"}),
        # quote-bearing street → quotes stripped (osm-addresses.xsl:45)
        (5, 2.0, 3.0, {"addr:street": 'Via "Nuova" Trento', "addr:housenumber": "9"}),
        # no locality/country tags → NULL locality/country (xsl:47-52)
        (6, 4.0, 5.0, {"addr:street": "Corso Italia", "addr:housenumber": "1"}),
    ])
    out = {r["addr_id"]: r for r in osm.node_addresses(nodes).collect()}
    assert set(out) == {"urn:osm:uuid:848724518", "urn:osm:uuid:5", "urn:osm:uuid:6"}
    g = out["urn:osm:uuid:848724518"]
    assert g["street_address"] == "Via Thaon de Revel 20"
    assert (g["locality"], g["country"]) == ("Giglio Porto", "IT")
    assert (g["lat"], g["lon"]) == (42.3600902, 10.9195731)
    assert g["see_also"] == "http://www.openstreetmap.org/node/848724518"
    assert out["urn:osm:uuid:5"]["street_address"] == "Via Nuova Trento 9"
    assert out["urn:osm:uuid:6"]["locality"] is None
    assert out["urn:osm:uuid:6"]["country"] is None


def test_way_address_first_node_anchor_j4(spark):
    nodes = mk_nodes(spark, [(10, 1.5, 2.5, {}), (11, 9.9, 9.9, {})])
    ways = mk_ways(spark, [
        (100, [10, 11], {"addr:street": "Hauptstrasse", "addr:housenumber": "3"}),
    ])
    rows = osm.way_addresses(ways, nodes).collect()
    assert len(rows) == 1
    # anchor = FIRST nd's node coords (osm-addresses.xsl:76-81), not node 11
    assert (rows[0]["lat"], rows[0]["lon"]) == (1.5, 2.5)
    assert rows[0]["source"] == "way"
    assert rows[0]["see_also"] == "http://www.openstreetmap.org/way/100"


def test_way_geometry_rule_f4_a1_a2(spark):
    nodes = mk_nodes(spark, [
        (1, 10.0, 20.0, {}), (2, 11.0, 21.0, {}), (3, 12.0, 22.0, {}),
    ])
    ways = mk_ways(spark, [
        (7, [3, 1, 2], {"highway": "residential", "name": "Strada X"}),
        (8, [1, 2], {"highway": "residential", "name": ""}),      # empty name → out (F4)
        (9, [1, 2], {"name": "No highway"}),                      # no highway tag → out
        (10, [1, 99, 2], {"highway": "path", "name": "Dangling"}),  # missing ref skipped
    ])
    out = {r["way_id"]: r for r in osm.way_geometries(ways, nodes).collect()}
    assert set(out) == {7, 10}
    # vertex order preserved = nd order (refs 3,1,2), coords as "lon lat"
    assert out[7]["wkt"] == ("LINESTRING (22.0000000 12.0000000, "
                             "20.0000000 10.0000000, 21.0000000 11.0000000)")
    # dangling ref 99 silently dropped (binarySearch miss, OsmXmlParser:257-268)
    assert out[10]["wkt"] == ("LINESTRING (20.0000000 10.0000000, "
                              "21.0000000 11.0000000)")
    compat = {r["way_id"]: r for r in
              osm.way_geometries(ways, nodes, compat_wkt=True).collect()}
    assert compat[7]["wkt"].startswith("LineString((")


def test_geocode_match_rule_j5(spark):
    nodes = mk_nodes(spark, [
        GIGLIO_NODE,
        (20, 5.0, 6.0, {"addr:street": "Via Thaon de Revel", "addr:housenumber": "20",
                        "addr:city": "Trento", "addr:country": "IT"}),
    ])
    ways = mk_ways(spark, [])
    addrs = osm.build_addresses(nodes, ways)
    queries = spark.createDataFrame(
        [
            # canonical example: README.md:53-63
            Row(query_id="q1", street_address="Via Thaon de Revel 20",
                locality="Giglio Porto", country="IT"),
            # token overlap but wrong locality → NO match (F8)
            Row(query_id="q2", street_address="Via Thaon de Revel 20",
                locality="Roma", country="IT"),
            # empty street → skipped entirely (F9, OsmRdfTransformer:188)
            Row(query_id="q3", street_address="", locality="Giglio Porto", country="IT"),
            # partial-token match (Lucene OR-of-terms): "Revel" alone hits
            Row(query_id="q4", street_address="Revel", locality="Giglio Porto",
                country="IT"),
        ])
    for strategy in ("token-join", "overlap"):
        out = geocode.geocode(queries, addrs, strategy).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {"q1", "q4"}, strategy
        hit = by_q["q1"][0]
        assert hit["addr_id"] == "urn:osm:uuid:848724518"
        assert hit["matched_street"] == "Via Thaon de Revel 20"
        # locality/country echo the QUERY (OsmRdfTransformer.java:288-289)
        assert (hit["locality"], hit["country"]) == ("Giglio Porto", "IT")
        assert (hit["lat"], hit["lon"]) == (42.3600902, 10.9195731)
