"""Sinks — Spark analogs of the reference's three outputs.

* console duplicate report (reference src/reporting.rs:32-40) →
  ``print_duplicate_report`` (driver-side summary of an aggregated frame)
* JSON file sink (reference src/reporting.rs:42-61, ``IdenticalFiles``
  records) → ``write_clusters_json`` (distributed ``df.write.json``)
* move-duplicates (reference src/operations.rs:40-64) →
  ``write_dedup_split``: canonical rows to one table, duplicates to another —
  a partitioned rewrite, never in-place mutation; object-store writes don't
  collide so the reference's rename-with-suffix loop (operations.rs:74-104)
  has no analog.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cluster_report(clusters: DataFrame) -> DataFrame:
    """Grouped report rows (cluster_id, files, n) for clusters with n>1 —
    the ``IdenticalFiles { checksum, files }`` shape (reporting.rs:9-13).

    Uses collect_list per cluster: report-sized output only (duplicate groups
    post-filter), never the full corpus — the full relation stays long-form.
    """
    return (
        clusters.groupBy("cluster_id")
        .agg(
            F.sort_array(F.collect_list("url")).alias("files"),
            F.count("*").cast("long").alias("n"),
        )
        .filter(F.col("n") > 1)
    )


def print_duplicate_report(clusters: DataFrame, limit: int = 20) -> None:
    """Console sink (A4)."""
    rep = cluster_report(clusters)
    total = rep.count()
    print(f"duplicate clusters: {total}")
    for row in rep.orderBy(F.col("n").desc(), "cluster_id").take(limit):
        print(f"  [{row['n']:>4}] {row['cluster_id']}")
        for u in row["files"][:5]:
            print(f"         {u}")


def write_clusters_json(clusters: DataFrame, path: str) -> None:
    """JSON sink (A5): one JSON object per duplicate cluster."""
    cluster_report(clusters).write.mode("overwrite").json(path)


def write_dedup_split(
    pages: DataFrame, clusters: DataFrame, out_dir: str
) -> dict[str, int]:
    """The A6 'move' as two filtered writes: ``<out>/canonical`` and
    ``<out>/duplicates``.  Returns counts (MoveStats analog,
    operations.rs:9-11)."""
    joined = pages.join(clusters.select("url", "is_canonical"), "url")
    canonical = joined.filter(F.col("is_canonical")).drop("is_canonical")
    duplicates = joined.filter(~F.col("is_canonical")).drop("is_canonical")
    canonical.write.mode("overwrite").parquet(f"{out_dir}/canonical")
    duplicates.write.mode("overwrite").parquet(f"{out_dir}/duplicates")
    spark = pages.sparkSession
    return {
        "canonical": spark.read.parquet(f"{out_dir}/canonical").count(),
        "moved": spark.read.parquet(f"{out_dir}/duplicates").count(),
    }
