"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end including a driver-side count/collect of the
result (forcing full execution).  Extra keys report dedup throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "exact_dup_clusters",
    "text_stats",
    "minhash_signatures",
    "lsh_pairs",
    "simhash_pairs",
    "substr_pairs",
    "near_dup_clusters",
    "ann_topk",
    "embedding_near_dup_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from camden_spark.entry_queries import QUERIES
    from camden_spark.session import get_spark

    spark = get_spark("camden_spark_bench", cores=cores)
    # warm the JVM + python workers once so per-query times measure the
    # plan, not session/worker startup
    from camden_spark.session import warm_python_workers

    spark.range(1000).selectExpr("sum(id)").collect()
    warm_python_workers(spark)

    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        rows[name] = df.count()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    pipeline_sec = times.get("near_dup_clusters", 0.0)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "pipeline_docs_per_sec": round(n_docs / pipeline_sec, 1)
        if pipeline_sec
        else None,
        "rows": rows,
        "cores": cores,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
