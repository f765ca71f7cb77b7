"""Iceberg catalog integration (production path; parquet dirs stand in here).

The sandbox has no Iceberg runtime jar, so everything is gated: callers use
``load_pages(spark, "iceberg:db.pages")`` (sources/pages.py) when the catalog
is configured, and ``SnapshotStore`` (plans/checkpoint.py) the rest of the
time.  This module documents and implements the production wiring so a
cluster with the iceberg-spark-runtime jar gets real snapshot semantics.

Production mapping of the engine's checkpoint contract onto Iceberg:

* stage output  → ``ckpt.<stage>_<confighash>`` table, written with
  ``writeTo(...).createOrReplace()`` — an atomic snapshot commit (the
  all-or-nothing property camden's fail-fast move lacks, reference
  src/operations.rs:52-55)
* manifest/lineage → Iceberg snapshot summary properties
  (``snapshot-id``, custom ``camden.upstream``/``camden.counters`` props)
* resume        → table existence + config-hash match
* input count   → snapshot ``total-records`` metadata (replaces camden's
  pre-walk count_entries, reference src/scanner.rs:13-15 — O(1), no scan)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONFS = {
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.ckpt": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.ckpt.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def snapshot_row_count(spark: SparkSession, table: str) -> int | None:
    """O(1) row count from snapshot metadata (no scan)."""
    try:
        row = spark.sql(
            f"SELECT summary['total-records'] AS n FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return int(row["n"]) if row and row["n"] is not None else None
    except Exception:
        return None


def write_stage_snapshot(df: DataFrame, table: str) -> None:
    """Atomic snapshot commit of a stage output."""
    df.writeTo(table).createOrReplace()
