"""Structured Streaming form of the enrichment pipeline (stretch surface).

The reference is strictly request/response batch (isLongRunning() == false,
OsmRdfTransformer.java:368-372) and the north rule's resumability is
snapshot-based batch restart — but the engine's operators are stream-safe
(pure column math + equi-joins against static dims), so the same plan runs
under Structured Streaming unchanged:

    readStream(images) → extract_geotag → assign_tiles
        → stream-static join(addresses-by-cell)
        → windowed per-tile counts with watermark
        → foreachBatch append into the snapshot catalog

``run_file_stream`` drives it with the file source + Trigger.AvailableNow
(deterministic, test-friendly); swapping source/sink strings targets
Kafka/Iceberg in a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators.geotag import extract_geotag
from p3_osm_transformer_spark.operators.tile_assign import assign_tiles
from p3_osm_transformer_spark.sources.catalog import Catalog


def streaming_enrich(stream_df: DataFrame) -> DataFrame:
    """The stateless enrichment segment (shared with the batch plan)."""
    tagged = extract_geotag(stream_df)
    geo = tagged.filter(F.col("lat").isNotNull())
    return assign_tiles(geo, zooms=(12,), cell_resolutions=(7, 8))


def windowed_tile_counts(enriched: DataFrame, ts_col: str = "event_time",
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Stateful segment: late-data-tolerant per-tile counts."""
    return (enriched
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("w"),
                     F.col("tile_z12"))
            .agg(F.count("*").alias("n_images"))
            .select(F.col("w.start").alias("window_start"),
                    "tile_z12", "n_images"))


def run_file_stream(spark: SparkSession, input_dir: str, schema,
                    catalog: Catalog, table: str,
                    checkpoint_dir: str, watermark: str = "30 minutes") -> None:
    """File-source → enrich → windowed counts → snapshot-commit sink,
    processing everything currently available, then stopping.

    Append mode emits a window only once the watermark passes its end —
    trailing windows stay in state for the next trigger (standard late-data
    semantics; the snapshot catalog accumulates finalized windows)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    enriched = streaming_enrich(stream)
    counts = windowed_tile_counts(enriched, watermark=watermark)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            catalog.write_snapshot(batch_df, table)

    (counts.writeStream
        .outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300))
