"""p3_osm_transformer_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimagining of fusepoolP3/p3-osm-transformer (reference at
/root/reference, a single-node Java OSM geocoding HTTP service) as a
cluster-scale Spark engine:

- fixed-schema DataFrames instead of RDF triple graphs (SURVEY.md §1.3)
- Catalyst joins instead of hand-rolled nested-loop / binary-search joins
  (reference OsmXmlParser.java:72-275)
- geocell/tile layout columns instead of a Lucene text index
  (reference JenaTextConfig.java:45-61)
- vectorized pandas/Arrow UDFs for the only non-relational compute
  (image decode, exact point-in-polygon refine)

Everything here derives from public knowledge: the Apache Spark API and the
reference repo's observable behavior. This is not a port — see SURVEY.md.
"""

__version__ = "0.1.0"

from p3_osm_transformer_spark.session import get_spark  # noqa: F401
