"""Structured-Streaming incremental exact dedup.

The batch reference is one-shot (a CLI run, reference src/main.rs:13-56); at
ingest time a 100 TB corpus arrives continuously, so the exact-dup stage is
also exposed as a streaming transformation: new pages are checksummed and
deduplicated against in-stream state with ``dropDuplicatesWithinWatermark``
(state bounded by the watermark — unbounded ``dropDuplicates`` state would
OOM at web scale).

Output contract matches the batch stage: the first row per checksum within
the watermark window survives (streaming first-wins = arrival order, the
watermark bounds how late a duplicate can arrive and still be suppressed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from camden_spark.config import DedupConfig
from camden_spark.operators.exact import with_checksum


def streaming_exact_dedup(
    pages_stream: DataFrame,
    cfg: DedupConfig | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """pages readStream → deduplicated stream of canonical-first rows.

    Usage::

        src = spark.readStream.schema(schema).parquet(dir)
        out = streaming_exact_dedup(src)
        q = out.writeStream.format("parquet").option(...).start()
    """
    cfg = cfg or DedupConfig()
    hashed = with_checksum(pages_stream, cfg)
    return (
        hashed.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["checksum"])
    )
