"""Temporal operators over event streams: sessionization and as-of join.

Neither exists in the reference (camden is a batch file-dedup CLI with no
time axis — SURVEY §2.F records the absence of joins/windows), but both are
staple operations of the large-scale event/training-data pipelines the north
rule generalizes toward, and both showcase the scale-correct Spark shapes:

* **Sessionization** — gap-based session ids via ``lag`` + running ``sum``
  over a per-key window.  ONE shuffle (hash partition by user), then a
  per-partition sort; no self-join, no explode.  At 10^12 events the cost is
  the single exchange; skewed users are bounded by per-user event counts,
  not corpus size.

* **As-of join** — "for each left row, the most recent right row at or
  before it" — implemented with the union + last-non-null-over-window
  technique: tag both sides, union them on the shared time axis, and carry
  right-side values forward within each key partition.  ONE shuffle of
  |left| + |right| rows.  The naive alternatives do not survive scale: a
  range join (``l.ts >= r.ts``) explodes to O(|left| x |right|) per key
  before aggregation, and per-key ``collect_list`` + UDF breaks on skewed
  keys.  (Same technique Flink/KDB+/Pandas ``merge_asof`` use after a sort;
  here the window sort plays that role.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _epoch_us(col: str) -> Column:
    """Epoch micros of a timestamp column; TIMESTAMP_NTZ is interpreted as
    UTC wall-clock (the engine pins spark.sql.session.timeZone=UTC, so the
    cast is a no-op reinterpretation — same instant DuckDB's epoch_us sees
    for the naive parquet TIMESTAMP)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Assign gap-based session indexes: a new session starts whenever the
    time since the key's previous event exceeds ``gap_seconds``.

    Adds ``session_idx`` (0-based per key, in time order).  ``order_cols``
    break timestamp ties deterministically (parallelism-invariant output —
    the engine-wide rule; reference insertion order was thread-race-dependent,
    src/scanner.rs:62).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    ts_us = _epoch_us(ts_col)
    prev_us = F.lag(ts_us).over(w)
    new_session = (
        F.when(prev_us.isNull(), F.lit(1))
        .when(ts_us - prev_us > gap_seconds * 1_000_000, F.lit(1))
        .otherwise(F.lit(0))
    )
    # running sum of session starts − 1 → 0-based contiguous session index;
    # both window functions share one sort, so this stays a single exchange
    return events.withColumn(
        "session_idx", (F.sum(new_session).over(w) - 1).cast("long")
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates over a ``sessionize`` output: event count,
    start/end (epoch micros — exact integer, no float drift vs the oracle),
    duration in seconds, and the summed value column if given."""
    ts_us = _epoch_us(ts_col)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ts_us).alias("start_us"),
        F.max(ts_us).alias("end_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    out = sessions.groupBy(key_col, "session_idx").agg(*aggs)
    return out.withColumn(
        "duration_sec",
        ((F.col("end_us") - F.col("start_us")) / F.lit(1_000_000.0)).cast(
            "double"
        ),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """Backward as-of LEFT join: each left row gains the ``value_cols`` of
    the latest right row with ``right.ts <= left.ts`` for the same key
    (NULLs when no right row precedes it).

    Right rows must be unique per ``(key_col, ts_col)`` — with duplicates,
    "the latest right row" is ill-defined (DuckDB's ASOF JOIN, the oracle,
    has the same precondition).  Callers with duplicate timestamps should
    pre-aggregate the right side.

    Output: all left columns + ``value_cols`` + ``right_ts_alias`` (the
    matched right timestamp, epoch micros).
    """
    sort_keys = [ts_col, "_side"]
    # left rows carry NULL right-values; right rows carry only key/ts/values.
    # _side: right=0 < left=1, so at equal timestamps the right row sorts
    # FIRST and is visible to the left row — inclusive (<=) semantics.
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_r_ts", F.lit(None).cast("long")
    )
    for c in value_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        _epoch_us(ts_col).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(key_col)
        .orderBy(*sort_keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def carry(c: str) -> Column:
        return F.last(F.col(c), ignorenulls=True).over(w)

    carried = unioned.select(
        "*",
        carry("_r_ts").alias(right_ts_alias),
        *[carry(f"_r_{c}").alias(f"{c}_asof") for c in value_cols],
    )
    return (
        carried.filter(F.col("_side") == 1)
        .drop("_side", "_r_ts", *[f"_r_{c}" for c in value_cols])
    )
