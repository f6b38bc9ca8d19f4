"""JenaTextConfigTest parity: indexed keyword search + incremental union.

Reference (JenaTextConfigTest.java):
* testLoadData  — load osm-giglio-ways.ttl, text-search "roma" → exactly 1.
* testUpdateData — search "trento" → 1; load foo.ttl (adds "Via Trento 1");
  search again → 2 (union semantics U1, JenaTextConfig.java:142-159).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.textsearch import (
    build_postings,
    text_query,
    text_query_scan,
)
from p3_osm_transformer_spark.sources.rdf import SCHEMA_NS, read_turtle_triples

BASE = "/root/reference/src/test/resources/eu/fusepool/p3/osm/"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BASE), reason="reference fixtures unavailable")


def _street_table(spark, path):
    t = read_turtle_triples(spark, path)
    return (t.filter(F.col("predicate") == SCHEMA_NS + "streetAddress")
            .select(F.col("subject"), F.col("object").alias("street_address")))


def test_load_data_roma_one_hit(spark):
    store = _street_table(spark, BASE + "osm-giglio-ways.ttl")
    postings = build_postings(store, "subject", "street_address")
    assert text_query(postings, "roma").count() == 1
    # index-free scan agrees with the posting-table probe
    assert text_query_scan(store, "subject", "street_address", "roma").count() == 1


def test_update_data_trento_one_then_two(spark):
    store = _street_table(spark, BASE + "osm-giglio-ways.ttl")
    assert text_query(build_postings(store, "subject", "street_address"),
                      "trento").count() == 1
    # incremental load = union (U1); foo.ttl adds "Via Trento 1"
    store2 = store.unionByName(_street_table(spark, BASE + "foo.ttl"))
    assert text_query(build_postings(store2, "subject", "street_address"),
                      "trento").count() == 2
