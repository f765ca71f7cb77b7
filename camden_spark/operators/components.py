"""Connected components over candidate pairs (north rule F6).

DataFrame-native min-label propagation: every node starts labeled with itself
(its url); each iteration joins labels across edges (both directions) and
takes the min label per node; fixpoint when no label changes.  Duplicate
clusters have tiny diameters (pairs come from similarity joins, so components
are near-cliques), so convergence is fast; ``cfg.cc_max_iterations`` caps the
loop defensively.

Scale notes:

* lineage is truncated every iteration with ``localCheckpoint`` — Catalyst
  cannot optimize across iterations and the plan would otherwise grow
  exponentially (SURVEY §4.2.3)
* the convergence check is an ``observe`` metric collected during the
  checkpoint's own materialization job — zero extra jobs per iteration
* labels are the string urls themselves: min(url) is simultaneously the
  cluster id AND the deterministic first-wins canonical member (camden keeps
  element 0 of each group, reference src/operations.rs:50 — ours is the
  lexicographic minimum, deterministic under any parallelism)
"""

from __future__ import annotations

import warnings

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation

from camden_spark.config import DedupConfig


def connected_components(
    edges: DataFrame,
    cfg: DedupConfig | None = None,
    status: dict | None = None,
) -> DataFrame:
    """edges(url_a, url_b) → (url, cluster_id) for every node in an edge.

    cluster_id is the min url of the component.  Nodes not in any edge are
    absent (callers union singletons back with cluster_id = own url).

    Pass ``status`` (a dict) to receive ``{"converged": bool, "iterations":
    int}`` — min-label propagation is O(component diameter) iterations, and
    substring-containment chains can approach ``cfg.cc_max_iterations``; a
    capped-out run returns possibly-split labels, so non-convergence warns
    loudly and is surfaced in pipeline metrics instead of passing silently.
    """
    cfg = cfg or DedupConfig()
    spark = edges.sparkSession
    sym = (
        edges.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        .union(edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .withColumn("label", F.col("url"))
        .localCheckpoint(eager=True)
    )
    converged = False
    iterations = 0
    for _ in range(cfg.cc_max_iterations):
        iterations += 1
        # neighbor labels: for each dst, min label over incoming src labels
        nbr = (
            sym.join(labels.withColumnRenamed("url", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "url")
        )
        # the convergence check rides the checkpoint's materialization job as
        # an observed metric — zero extra jobs per iteration (vs a separate
        # isEmpty/count action)
        obs = Observation(f"cc_changed_{iterations}")
        new_labels = (
            labels.join(nbr, "url", "left")
            .select(
                "url",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.col("nbr_label").isNotNull()
                    & (F.col("nbr_label") < F.col("label"))
                ).alias("changed"),
            )
            .observe(
                obs,
                F.coalesce(
                    F.sum(F.col("changed").cast("long")), F.lit(0)
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        jmap = obs._jo.getOrEmpty()  # .get would block if no action ran
        if not jmap.isEmpty():
            converged = int(jmap.get("changed").get()) == 0
        else:  # defensive: metric not collected — fall back to a scan
            converged = new_labels.filter(F.col("changed")).isEmpty()
        labels = new_labels.drop("changed")
        if converged:
            break
    if not converged:
        warnings.warn(
            f"connected_components hit cc_max_iterations="
            f"{cfg.cc_max_iterations} before the label fixpoint — clusters "
            f"may be split; raise cc_max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    if status is not None:
        status["converged"] = converged
        status["iterations"] = iterations
    return labels.withColumnRenamed("label", "cluster_id")


def assign_clusters(
    all_urls: DataFrame,
    edges: DataFrame,
    cfg: DedupConfig | None = None,
    status: dict | None = None,
) -> DataFrame:
    """(url, cluster_id, is_canonical) over ALL urls: component min-url for
    nodes in edges, own url for singletons (camden's singleton groups — kept
    in the map, filtered only by consumers, reference src/scanner.rs:17-49)."""
    comp = connected_components(edges, cfg, status=status)
    return (
        all_urls.select("url")
        .join(comp, "url", "left")
        .select(
            "url",
            F.coalesce(F.col("cluster_id"), F.col("url")).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("url") == F.col("cluster_id"))
    )
