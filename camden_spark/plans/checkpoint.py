"""Stage checkpoint/resume (north rule F9).

The reference's move stage is fail-fast and non-resumable — a mid-stage error
leaves partial moves on disk (reference src/operations.rs:52-55).  This module
is the fix the north rule mandates: every pipeline stage writes its output as
an immutable snapshot directory keyed by ``(stage_name, config_hash)``, with a
manifest recording lineage (upstream stages, row counts, per-partition
counters) — on restart, completed stages load from snapshot instead of
recomputing.  Parquet snapshot dirs stand in for Iceberg snapshots in the
sandbox; the interface is format-agnostic (an Iceberg catalog would swap in at
``_write``/``_read``).

Writes are atomic-by-rename: data lands in ``<dir>.tmp`` and the manifest is
written last, so a killed run never leaves a readable-but-incomplete snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SnapshotStore:
    """Config-hash-keyed snapshot directory tree."""

    root: str
    config_hash: str
    #: stages completed this run or resumed (name → manifest dict)
    lineage: dict[str, dict] = field(default_factory=dict)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, self.config_hash, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "_MANIFEST.json")

    def has(self, stage: str) -> bool:
        return os.path.exists(self._manifest_path(stage))

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        with open(self._manifest_path(stage)) as f:
            self.lineage[stage] = json.load(f)
        return spark.read.parquet(os.path.join(self._stage_dir(stage), "data"))

    def write(
        self,
        df: DataFrame,
        stage: str,
        upstream: list[str] | None = None,
        counters: dict[str, int] | None = None,
    ) -> DataFrame:
        """Write df as the stage snapshot; returns the re-read DataFrame
        (reading back truncates lineage, like a checkpoint)."""
        spark = df.sparkSession
        stage_dir = self._stage_dir(stage)
        tmp = stage_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        data_dir = os.path.join(tmp, "data")
        df.write.mode("overwrite").parquet(data_dir)
        # per-partition lineage: parquet part files + row count
        rows = spark.read.parquet(data_dir).count()
        parts = sorted(
            f for f in os.listdir(data_dir) if f.startswith("part-")
        )
        manifest = {
            "stage": stage,
            "config_hash": self.config_hash,
            "rows": rows,
            "num_partitions": len(parts),
            "partitions": parts,
            "upstream": upstream or [],
            "counters": counters or {},
            "written_at": time.time(),
        }
        with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp, stage_dir)
        self.lineage[stage] = manifest
        return spark.read.parquet(os.path.join(stage_dir, "data"))

    def stage(
        self,
        spark: SparkSession,
        name: str,
        build,
        upstream: list[str] | None = None,
        counters: dict[str, int] | None = None,
    ) -> DataFrame:
        """Resume-or-compute: load the snapshot if present, else call
        ``build()`` and persist its result."""
        if self.has(name):
            return self.read(spark, name)
        return self.write(build(), name, upstream=upstream, counters=counters)
