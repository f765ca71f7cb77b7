"""Similarity search over embedding columns.

* ``cosine_col`` — JVM-side cosine similarity of two array<float/double>
  columns (zip_with + aggregate builtins; stays in codegen, exact oracle
  parity with DuckDB's list functions after rounding).
* ``brute_force_topk`` — baseline exact top-k: broadcast the (small) query
  set against the corpus, window top-k.  The 100 TB path broadcasts queries,
  never shuffles the corpus.
* ``hyperplane_buckets`` / ``ann_near_dup_pairs`` — the scale path: random
  hyperplane signs (SRP-LSH) bucket the corpus; candidate pairs come from an
  equi-join on bucket id, verified by exact cosine.  Embedding-cosine
  near-duplicate detection = same machinery with a threshold.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import LongType


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity, double precision, JVM-side."""
    num = _dot(a, b)
    den = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self).

    (query_id, vec_id, cosine_sim, rank).  ``queries`` is broadcast — the
    corpus is scanned once with no shuffle until the final per-query top-k.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col), F.col(vec_col))
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine_sim", F.round(cosine_col(F.col("q_vec"), F.col(vec_col)), 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine_sim", "rank")
    )


def hyperplane_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add (table, bucket) rows via signed random projections.

    One vectorized pandas UDF computes all tables' buckets per batch with a
    single numpy matmul; output is exploded to (row, table, bucket).
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim)).astype(np.float64)
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf("array<long>")
    def bucket_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in it:
            M = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in vecs]
            )  # (n, dim)
            out = np.empty((M.shape[0], n_tables), dtype=np.int64)
            for t in range(n_tables):
                signs = (M @ planes[t].T) > 0  # (n, n_planes)
                out[:, t] = (signs.astype(np.uint64) * weights).sum(
                    axis=1, dtype=np.uint64
                ).view(np.int64)
            yield pd.Series(list(out))

    return vectors.withColumn("_buckets", bucket_udf(F.col(vec_col))).select(
        "*", F.posexplode("_buckets").alias("table", "bucket")
    ).drop("_buckets")


def ann_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 500,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine_sim ≥ threshold)
    via SRP-LSH buckets + exact verify.  Same skew discipline as text LSH:
    oversize buckets dropped, join repartitioned on bucket key."""
    b = hyperplane_buckets(vectors, dim, n_planes, n_tables, seed, vec_col)
    sized = b.groupBy("table", "bucket").agg(F.count("*").alias("n"))
    keep = sized.filter((F.col("n") > 1) & (F.col("n") <= max_bucket)).select(
        "table", "bucket"
    )
    joinable = b.join(keep, ["table", "bucket"], "left_semi").select(
        id_col, vec_col, "table", "bucket"
    )
    l, r = joinable.alias("l"), joinable.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.table") == F.col("r.table"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round(
                cosine_col(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}")), 6
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs
