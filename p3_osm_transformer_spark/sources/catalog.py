"""Table catalog seam — snapshot-versioned parquet directories.

The north rule asks for Iceberg tables with snapshot-checkpoint resume.
This sandbox ships no Iceberg jar (SURVEY.md §7 risk 4), so the catalog is
a seam: the same five calls (write_snapshot / read / snapshots / resume
state) against versioned parquet directories.  Swapping in Iceberg is a
config change (``format("iceberg") + writeTo(...).createOrReplace()``);
nothing upstream knows the difference.

Layout:  <root>/<table>/snap-<n>/part-*.parquet
         <root>/<table>/_latest        (text file: committed snapshot id)

Commit protocol: write to snap-N, then atomically rename _latest.tmp →
_latest.  A crashed write leaves a dangling snap dir but never a corrupt
_latest — the Iceberg-commit analogue at parquet-dir fidelity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------- paths
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _latest_file(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_latest")

    def latest_snapshot(self, table: str) -> int | None:
        try:
            with open(self._latest_file(table)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def snapshots(self, table: str) -> list[int]:
        tdir = self._tdir(table)
        if not os.path.isdir(tdir):
            return []
        return sorted(int(d[5:]) for d in os.listdir(tdir)
                      if d.startswith("snap-") and d[5:].isdigit())

    # ------------------------------------------------------------- write
    def write_snapshot(self, df: DataFrame, table: str,
                       partition_by: list[str] | None = None) -> int:
        """Append a new immutable snapshot and commit it as latest."""
        snap = (self.latest_snapshot(table) or 0) + 1
        path = os.path.join(self._tdir(table), f"snap-{snap}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        tmp = self._latest_file(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(snap))
        os.replace(tmp, self._latest_file(table))   # atomic commit
        return snap

    # ------------------------------------------------------------- read
    def read(self, spark: SparkSession, table: str,
             snapshot: int | None = None) -> DataFrame:
        snap = snapshot if snapshot is not None else self.latest_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table!r} has no committed snapshot")
        return spark.read.parquet(os.path.join(self._tdir(table), f"snap-{snap}"))

    def exists(self, table: str) -> bool:
        return self.latest_snapshot(table) is not None
