"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dedup pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (registry lives in camden_spark/entry_queries.py — SQL-expressible
queries carry a DuckDB oracle with matching column aliases; distributed-hash
stages are rows-only with semantics verified in tests/ against the
pure-Python oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full exact+near dedup
    pipeline (checksum clusters → MinHash/LSH + SimHash + substring candidate
    pairs → connected components) → (url, cluster_id, is_canonical)."""
    from camden_spark.entry_queries import q_near_dup_clusters

    return q_near_dup_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from camden_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from camden_spark.entry_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
