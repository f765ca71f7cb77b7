from camden_spark.streaming.dedup_stream import streaming_exact_dedup

__all__ = ["streaming_exact_dedup"]
