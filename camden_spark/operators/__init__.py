from camden_spark.operators.exact import exact_dedup_clusters

__all__ = ["exact_dedup_clusters"]
