"""Spark operators vs frozen pure-Python goldens (FIXTURES.md §6).

Goldens were computed once by tools/make_goldens.py — an independent
re-implementation of the reference rules — and committed.  Any semantic
drift in the operators or the fixture generators fails here.
"""

from __future__ import annotations

import json
import os

import pytest

from p3_osm_transformer_spark.operators import geocode, osm
from p3_osm_transformer_spark.sources import fixtures as fx

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load(name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def fixture_tables(spark):
    g = load("golden_addresses")
    nodes = fx.osm_nodes(spark, g["n_nodes"]).cache()
    ways = fx.osm_ways(spark, g["n_ways"], g["n_nodes"]).cache()
    queries = fx.query_addresses(spark, g["n_queries"])
    return nodes, ways, queries


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_golden_addresses(spark, fixture_tables):
    nodes, ways, _ = fixture_tables
    golden = load("golden_addresses")["rows"]
    cols = ["addr_id", "street_address", "locality", "country",
            "lat", "lon", "source", "see_also"]
    got = _rows(osm.build_addresses(nodes, ways), cols)
    want = sorted(tuple(r[c] for c in cols) for r in golden)
    assert got == want


def test_golden_way_geoms(spark, fixture_tables):
    nodes, ways, _ = fixture_tables
    golden = load("golden_way_geoms")["rows"]
    cols = ["way_id", "way_name", "wkt"]
    got = _rows(osm.way_geometries(ways, nodes).select(*cols), cols)
    want = sorted(tuple(r[c] for c in cols) for r in golden)
    assert got == want


def test_golden_geocode(spark, fixture_tables):
    nodes, ways, queries = fixture_tables
    golden = load("golden_geocode")["rows"]
    cols = ["query_id", "addr_id", "matched_street", "locality",
            "country", "lat", "lon"]
    addrs = osm.build_addresses(nodes, ways)
    got = _rows(geocode.geocode(queries, addrs), cols)
    want = sorted(tuple(r[c] for c in cols) for r in golden)
    assert got == want
