"""End-to-end parity against the reference's OWN test fixtures.

Runs the engine over the real giglio_island.osm (the reference's benchmark
dataset, 17,859 nodes / 1,127 ways) and asserts the canonical results the
reference documents:

* README.md:53-63 — geocoding "Via Thaon de Revel 20" / Giglio Porto / IT
  returns urn:osm:uuid:848724518 at lat 42.3600902 lon 10.9195731.
* OsmXmlParserTest — highway extraction produces named-way linestrings.
* OsmRdfTransformerTest.testXML — ≥1 geo:lat in the response (existence).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators import geocode, osm, poi
from p3_osm_transformer_spark.sources.osm_xml import read_osm

GIGLIO = "/root/reference/src/test/resources/eu/fusepool/p3/osm/giglio_island.osm"
MINI = "/root/reference/src/test/resources/eu/fusepool/p3/osm/osm-xml-example.osm"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GIGLIO), reason="reference fixtures unavailable")


@pytest.fixture(scope="module")
def giglio(spark):
    nodes, ways = read_osm(spark, GIGLIO)
    return nodes.cache(), ways.cache()


def test_giglio_scale_matches_reference_doc(giglio):
    nodes, ways = giglio
    assert nodes.count() == 17859          # SURVEY.md §5 fixture scale
    assert ways.count() == 1127


def test_canonical_geocode_readme_example(spark, giglio):
    nodes, ways = giglio
    addrs = osm.build_addresses(nodes, ways)
    queries = spark.createDataFrame([Row(
        query_id="q1", street_address="Via Thaon de Revel 20",
        locality="Giglio Porto", country="IT")])
    hits = geocode.geocode(queries, addrs).collect()
    assert any(h["addr_id"] == "urn:osm:uuid:848724518"
               and h["lat"] == 42.3600902 and h["lon"] == 10.9195731
               for h in hits), hits
    # reference output shape: query's locality/country echoed
    for h in hits:
        assert (h["locality"], h["country"]) == ("Giglio Porto", "IT")


def test_highway_extraction_on_giglio(giglio):
    nodes, ways = giglio
    geoms = osm.way_geometries(ways, nodes)
    rows = geoms.collect()
    assert len(rows) > 50                          # named highways exist
    named = {r["way_name"] for r in rows}
    assert any("Via" in n for n in named)
    # every geometry has ≥2 vertices and well-formed WKT
    assert all(r["wkt"].startswith("LINESTRING (") and len(r["points"]) >= 1
               for r in rows)


def test_minimal_example_end_to_end(spark):
    nodes, ways = read_osm(spark, MINI)
    addrs = osm.build_addresses(nodes, ways)
    got = addrs.collect()
    assert len(got) >= 1                           # the one address node
    assert all(r["lat"] is not None for r in got)  # testXML existence check
    geoms = osm.way_geometries(ways, nodes).collect()
    assert len(geoms) == 1                         # the one highway way


def test_poi_extraction_on_giglio(giglio):
    nodes, ways = giglio
    pois = poi.extract_pois(nodes, ways).collect()
    by_type = {}
    for r in pois:
        by_type.setdefault(r["poi_type"], []).append(r)
    # giglio island has at least churches/bus stops per OSM tagging
    assert pois, "no POIs extracted"
    for r in pois:
        assert r["poi_id"].startswith("urn:osm:uuid:")
        assert '"' not in (r["label"] or "") or r["poi_type"] == "BusStop"
        if r["poi_type"] != "BusStop":
            assert r["wkt"] is None or r["wkt"].startswith("POLYGON ((")
