"""Partition pruning over cell-partitioned snapshots — the cluster-scale
form of the reference's early-exit scan (SURVEY.md §4: OsmXmlParser.java
stops scanning nodes once all refs resolve; at 100 TB the analogue is
never reading the irrelevant partitions at all).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cell_partitioned_snapshot_prunes_scan(spark, tmp_path):
    from p3_osm_transformer_spark.functions.geocell import cell_id
    from p3_osm_transformer_spark.sources.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    pts = spark.range(0, 20000).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919 % 3600) / 10.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729 % 1700) / 10.0 - 85.0).alias("lat"))
    # coarse write-time cell: g=3 → 64 possible directory partitions
    pts = pts.withColumn("cell_g3", cell_id(F.col("lon"), F.col("lat"), 3))
    cat.write_snapshot(pts, "pts_by_cell", partition_by=["cell_g3"])

    full = cat.read(spark, "pts_by_cell")
    one_cell = int(full.limit(1).collect()[0]["cell_g3"])
    pruned = full.filter(F.col("cell_g3") == one_cell)

    plan = _plan(pruned)
    # the partition predicate must be applied at the scan, as a partition
    # filter (directory pruning), not a post-scan row filter
    assert "PartitionFilters" in plan and f"cell_g3" in plan.split(
        "PartitionFilters", 1)[1].split("]", 1)[0]

    # and the pruned scan must read strictly fewer files than the full scan
    # (metrics populate on the DataFrame's own QueryExecution after collect)
    def n_files(df):
        df.collect()
        return df._jdf.queryExecution().executedPlan().collectLeaves() \
            .head().metrics().apply("numFiles").value()

    full2 = cat.read(spark, "pts_by_cell")
    assert n_files(pruned) < n_files(full2)
    # correctness: pruning loses no rows
    expected = full2.filter(F.col("cell_g3") == one_cell).count()
    assert pruned.count() == expected and expected > 0
