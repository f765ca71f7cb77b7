"""Session-scoped registry of operator-cached DataFrames (VERDICT r2 item 7).

Operators cache small intermediates (band-group sizes, candidate-pair sets,
fingerprint frames) that are consumed lazily through the DataFrames they
return — so the operator itself can never safely ``unpersist()``.  Left
alone, a long-lived session running many queries accumulates these cached
relations in executor storage memory.

Discipline: operators call :func:`track_cache` instead of ``df.cache()``;
the *consumer* (bench loop, CLI after sinks are written, a test after its
assertions) calls :func:`release_caches` once results are materialized.
Releasing early is safe — Spark recomputes an unpersisted frame from
lineage — it only costs recompute time, never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: cached frames awaiting release, in cache order (released LIFO)
_TRACKED: list[DataFrame] = []
#: deferred release callbacks (e.g. localCheckpoint block frees from
#: operators/components.py — storage that DataFrame.unpersist cannot reach)
_CALLBACKS: list = []


def track_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register the frame for a later bulk release."""
    df = df.cache()
    _TRACKED.append(df)
    return df


def track_release(callback) -> None:
    """Register ``callback(blocking: bool)`` to run at the next
    :func:`release_caches` — for storage a plain ``unpersist`` can't free
    (checkpointed RDD blocks).  Unlike cached frames, a frame whose blocks
    are freed through a callback has TRUNCATED lineage and must not be
    consumed again after release."""
    _CALLBACKS.append(callback)


def release_caches(blocking: bool = False) -> int:
    """Unpersist every tracked frame (LIFO) + run deferred release
    callbacks; returns how many frames/callbacks were released.

    For plain tracked caches this is safe at any time — consumers that still
    hold a released frame recompute it from lineage.  Checkpoint-backed
    frames (released via :func:`track_release`) are gone for good, so call
    this only once the run's results are materialized.  Frames whose session
    has already stopped are skipped silently.
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:
            pass  # session stopped / frame invalid — nothing left to free
    while _CALLBACKS:
        cb = _CALLBACKS.pop()
        try:
            cb(blocking)
            n += 1
        except Exception:
            pass
    return n
