"""Session-scoped registry of operator-cached DataFrames (VERDICT r2 item 7).

Operators cache small intermediates (band-group sizes, candidate-pair sets,
fingerprint frames) that are consumed lazily through the DataFrames they
return — so the operator itself can never safely ``unpersist()``.  Left
alone, a long-lived session running many queries accumulates these cached
relations in executor storage memory.

Discipline: operators call :func:`track_cache` instead of ``df.cache()``;
the *consumer* (bench loop, CLI after sinks are written, a test after its
assertions) calls :func:`release_caches` once results are materialized.
For plain tracked caches releasing early only costs recompute time, never
correctness (Spark recomputes an unpersisted frame from lineage).  BARRIER-
backed frames are different: :func:`materialize_barrier` truncates lineage
(localCheckpoint), so a frame released through its callback CANNOT be
recomputed — consuming it after :func:`release_caches` fails with
checkpoint-block-not-found.  Materialize barrier-backed results (e.g.
``PipelineResult.pairs`` / ``clusters``) BEFORE releasing.
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


def warm_cache(df: DataFrame) -> DataFrame:
    """:func:`track_cache` + an eager ``count()`` so the cache is POPULATED
    before any multi-branch consumer query runs.

    Why eager: AQE materializes a query's independent exchange branches as
    CONCURRENT jobs.  Two branches scanning the same *cold* cached frame
    race — block-manager cache population is first-writer-wins but not
    compute-synchronized, and on a multi-executor fleet the branches land
    on different JVMs where the other's freshly-written blocks are not yet
    visible, so each branch recomputes the full upstream (measured on the
    N→4N scaling legs: the Arrow signature/fingerprint subtrees ran TWICE
    on local-cluster[4,2], duplicating ~345 MB of shuffle writes and ~70
    busy core-seconds per run at 100k docs, while local-cluster[1,2]'s
    FIFO task queue hid the race).  Populating the cache with one cheap
    action serializes exactly one computation; warm blocks are then
    remote-fetched, never recomputed.  The extra job costs one driver
    round-trip (~0.2 s) — noise against the duplicated stage it prevents.

    Only for frames whose cache population was going to happen anyway
    (multi-consumer track_cache targets); the count is a scan of the frame
    being cached, not extra work.
    """
    df = track_cache(df)
    df.count()
    return df


def _persistent_rdd_ids(spark) -> set:
    """ids of every RDD currently holding storage blocks (JVM-side map)."""
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.iterator()
    out = set()
    while it.hasNext():
        out.add(it.next()._1())
    return out


def materialize_barrier(df: DataFrame) -> DataFrame:
    """Eagerly materialize a SMALL, expensive, multiply-consumed frame and
    truncate its lineage; blocks are registered for release with the registry.

    Why not ``cache()`` + ``count()``: observed on Spark 4.1.2, an
    InMemoryRelation whose child is an AQE plan embedding the candidate
    verify/anti-join subtrees re-executes that child on EVERY consuming
    action, even with ``isCachedColumnBuffersLoaded == true`` and all
    partitions present in storage (the TableCacheQueryStage re-materializes
    nested query stages).  Diagnosed by counting a fully-cached 249-row pair
    frame repeatedly: 7-17 s per count, event log showing the full union /
    window / ArrowEvalPython stages re-running each time.  ``localCheckpoint``
    cuts the plan at materialized blocks, so downstream consumers — including
    the CC edge truncation and PipelineResult.pairs — read blocks, period.

    Scale note: localCheckpoint is explicitly NON-fault-tolerant — lineage
    is truncated, so an executor lost after the barrier fails the JOB (the
    blocks cannot be recomputed); it never yields wrong results, but on a
    real cluster where executor loss must be survivable, use the RELIABLE
    path instead (SnapshotStore parquet staging / CC's checkpoint_dir mode —
    both available whenever a checkpoint dir is configured).  Use barriers
    only for frames orders of magnitude smaller than the corpus
    (candidate/verified pair sets).
    """
    spark = df.sparkSession
    before = _persistent_rdd_ids(spark)
    out = df.localCheckpoint(eager=True)
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.iterator()
    created = []
    while it.hasNext():
        t = it.next()
        if t._1() not in before:
            created.append(t._2())
    if created:

        def _free(blocking: bool) -> None:
            for rdd in created:
                try:
                    rdd.unpersist(blocking)
                except Exception:
                    pass

        track_release(_free)
    return out


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
