"""Freeze golden outputs (FIXTURES.md §6) from a pure-Python oracle.

The oracle re-implements the REFERENCE rules (osm-addresses.xsl:43-83,
OsmXmlParser.java:98-330, OsmRdfTransformer.java:188-301) directly from the
spec — deliberately sharing no code with the Spark operators — over the
deterministic fixture tables.  Outputs land in tests/goldens/*.json and
tests/test_goldens.py asserts the Spark operators reproduce them.

Run once (and re-run only if the fixture generators change):
    python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES, N_WAYS, N_QUERIES = 2000, 400, 64
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


# ---------------------------------------------------------------- oracle

def oracle_addresses(nodes: list[dict], ways: list[dict]) -> list[dict]:
    node_by_id = {n["id"]: n for n in nodes if n["id"] > 0}
    out = []

    def addr_row(ent_id, tags, lat, lon, kind):
        street = tags.get("addr:street", "")
        number = tags.get("addr:housenumber", "")
        if ent_id <= 0 or street == "" or number == "":
            return None
        street_address = street.replace('"', "") + " " + number
        loc = tags.get("addr:city") or None
        cc = tags.get("addr:country") or None
        return {
            "addr_id": f"urn:osm:uuid:{ent_id}",
            "street_address": street_address,
            "locality": loc if loc else None,
            "country": cc if cc else None,
            "lat": lat, "lon": lon, "source": kind,
            "see_also": f"http://www.openstreetmap.org/{kind}/{ent_id}",
        }

    for n in nodes:
        row = addr_row(n["id"], n["tags"], n["lat"], n["lon"], "node")
        if row:
            out.append(row)
    for w in ways:
        if not w["node_refs"]:
            continue
        anchor = node_by_id.get(w["node_refs"][0])
        if anchor is None:
            continue
        row = addr_row(w["id"], w["tags"], anchor["lat"], anchor["lon"], "way")
        if row:
            out.append(row)
    return out


def oracle_way_geoms(nodes: list[dict], ways: list[dict]) -> list[dict]:
    node_by_id = {n["id"]: n for n in nodes if n["id"] > 0}
    out = []
    for w in ways:
        if w["id"] <= 0:
            continue
        tags = w["tags"]
        if "highway" not in tags or tags.get("name", "") == "":
            continue
        pts = [(node_by_id[r]["lon"], node_by_id[r]["lat"])
               for r in w["node_refs"] if r in node_by_id]
        if not pts:
            continue
        body = ", ".join(f"{lon:.7f} {lat:.7f}" for lon, lat in pts)
        out.append({"way_id": w["id"], "way_name": tags["name"],
                    "wkt": f"LINESTRING ({body})"})
    return out


def _tokens(s: str) -> set[str]:
    return {t for t in re.split(r"[^a-z0-9]+", s.lower()) if t}


def oracle_geocode(queries: list[dict], addresses: list[dict]) -> list[dict]:
    out = []
    for qr in queries:
        if not qr["street_address"]:
            continue
        qt = _tokens(qr["street_address"])
        for a in addresses:
            if (a["locality"] == qr["locality"] and a["country"] == qr["country"]
                    and a["locality"] is not None and a["country"] is not None
                    and qt & _tokens(a["street_address"])):
                out.append({
                    "query_id": qr["query_id"], "addr_id": a["addr_id"],
                    "matched_street": a["street_address"],
                    "locality": qr["locality"], "country": qr["country"],
                    "lat": a["lat"], "lon": a["lon"],
                })
    return out


def main() -> None:
    from p3_osm_transformer_spark.session import get_spark
    from p3_osm_transformer_spark.sources import fixtures as fx

    spark = get_spark(app_name="make-goldens", master="local[8]")
    nodes = [r.asDict() for r in fx.osm_nodes(spark, N_NODES).collect()]
    ways = [r.asDict() for r in fx.osm_ways(spark, N_WAYS, N_NODES).collect()]
    queries = [r.asDict() for r in fx.query_addresses(spark, N_QUERIES).collect()]
    spark.stop()

    addrs = oracle_addresses(nodes, ways)
    geoms = oracle_way_geoms(nodes, ways)
    geo = oracle_geocode(queries, addrs)

    os.makedirs(OUT, exist_ok=True)
    for name, rows, keys in [
        ("golden_addresses", addrs, ("see_also",)),
        ("golden_way_geoms", geoms, ("way_id",)),
        ("golden_geocode", geo, ("query_id", "addr_id", "matched_street")),
    ]:
        rows = sorted(rows, key=lambda r: tuple(str(r[k]) for k in keys))
        with open(os.path.join(OUT, f"{name}.json"), "w") as f:
            json.dump({"n_nodes": N_NODES, "n_ways": N_WAYS,
                       "n_queries": N_QUERIES, "rows": rows}, f, indent=0)
        print(name, len(rows), "rows")


if __name__ == "__main__":
    main()
