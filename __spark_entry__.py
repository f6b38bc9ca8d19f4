"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship E1 pipeline on sf0.001: documents-derived
                image+caption table → geotag extract → cell/tile encode →
                kNN reverse geocode against the synthetic OSM address
                table → enriched rows.
queries()     — operator inventory from SURVEY.md §2, one callable each.
oracle_sql()  — DuckDB twins (see p3_osm_transformer_spark/contract.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import p3_osm_transformer_spark.contract_ext  # noqa: E402, F401 (registers q24+)
from p3_osm_transformer_spark.contract import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from p3_osm_transformer_spark.operators.osm import build_addresses
    from p3_osm_transformer_spark.plans.pipeline import enrich_images
    from p3_osm_transformer_spark.sources import fixtures as fx

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # image+caption table derived deterministically from the documents
    # table (caption text) + synthetic R16F payloads keyed by doc_id.
    from p3_osm_transformer_spark.contract import point_cols
    from p3_osm_transformer_spark.operators.exif import exif_jpeg_bytes
    from p3_osm_transformer_spark.operators.images import (
        phash_of_bytes, synth_image_bytes)
    lon, lat = point_cols(F.col("doc_id") + 17)
    # north-star geotag carriers: 80% caption-tagged, 10% EXIF-only
    # (caption plain, GPS in the JPEG bytes), 10% no geotag at all
    has_caption_geo = F.col("doc_id") % 10 < 8
    exif_only = F.col("doc_id") % 10 == 8
    caption = F.when(
        has_caption_geo,
        F.concat(F.substring("text", 1, 60), F.lit(" @ geo:"),
                 F.format_string("%.7f", lat), F.lit(","),
                 F.format_string("%.7f", lon))
    ).otherwise(F.substring("text", 1, 60))
    images = (docs.select(
        F.format_string("img-%08d", F.col("doc_id")).alias("image_id"),
        F.lit(64).alias("w"), F.lit(64).alias("h"),
        F.when(F.col("doc_id") % 2 == 0, "png").otherwise("jpeg").alias("fmt"),
        caption.alias("caption"), F.col("doc_id").alias("_seed"),
        exif_only.alias("_exif"), lat.alias("_lat"), lon.alias("_lon"))
        .withColumn("bytes", F.when(
            F.col("_exif"), exif_jpeg_bytes("_lat", "_lon")).otherwise(
            synth_image_bytes("_seed", "w", "h", "fmt")))
        .withColumn("phash", phash_of_bytes("bytes"))
        .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))

    nodes = fx.osm_nodes(spark, 2000)
    ways = fx.osm_ways(spark, 400, 2000)
    addresses = build_addresses(nodes, ways)
    return enrich_images(images, addresses, knn_strategy="ring",
                         geotag="caption+exif")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return dict(ORACLES)
