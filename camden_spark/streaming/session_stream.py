"""Structured-Streaming gap-based sessionization — a CUSTOM STATEFUL
operator via ``applyInPandasWithState`` (the piece Spark's builtin streaming
ops don't give you: ``dropDuplicatesWithinWatermark`` covers streaming dedup,
but session windows with per-key open/close logic need user state).

Semantics mirror the batch operator (operators/temporal.py:sessionize, same
``gap_seconds``): a session is a maximal run of a user's events with
inter-event gaps ≤ gap.  A session is EMITTED when it closes — either a
later event of the same user opens the next session, or the event-time
watermark passes ``last_event + gap`` (EventTimeTimeout).  Sessions still
open when the stream ends are held in state, not emitted (append-mode
contract: only finalized rows).

Scale shape: state is one tiny tuple per OPEN session per user — bounded by
active users, not corpus size; the watermark timeout guarantees idle users'
state is flushed and removed.  Events are grouped (one shuffle on user_id)
and each group's batch slice arrives as Arrow-backed pandas frames.

Caveat shared with all watermark streaming: events arriving later than the
watermark delay can split a session the batch operator would merge; within a
microbatch, out-of-order events are sorted before folding, so arrival order
inside the delay does not change the result.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("start_us", LongType(), False),
        StructField("end_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int,
    watermark: str = "10 seconds",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """events readStream (user_id, ts, value, …) → stream of CLOSED sessions
    (user_id, start_us, end_us, n_events, total_value); epoch-micro ints.

    Usage::

        src = spark.readStream.schema(schema).parquet(dir)
        out = streaming_sessionize(src, gap_seconds=600)
        q = out.writeStream.outputMode("append").format(...).start()
    """
    gap_us = int(gap_seconds) * 1_000_000
    gap_ms = int(gap_seconds) * 1_000

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key

        def closed(start_us: int, last_us: int, n: int, tot: float):
            return {
                "user_id": int(user),
                "start_us": int(start_us),
                "end_us": int(last_us),
                "n_events": int(n),
                "total_value": float(round(tot, 4)),
            }

        if state.hasTimedOut:
            # watermark passed last_event + gap with no new events: the open
            # session is final — emit and drop the state
            start_us, last_us, n, tot = state.get
            state.remove()
            yield pd.DataFrame([closed(start_us, last_us, n, tot)])
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:  # defensive: no data and no timeout — keep state
            yield pd.DataFrame(
                [], columns=[f.name for f in SESSION_SCHEMA.fields]
            )
            return
        rows = pd.concat(frames, ignore_index=True)
        # fold in event-time order; ties broken by value column for
        # determinism (parallelism/arrival invariance inside the batch):
        # equal-ts events must fold in a fixed order or float summation
        # (and thus round(total_value, 4)) could vary across partitionings
        ts_us = rows[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        vals = rows[value_col].to_numpy()
        order = np.lexsort((vals, ts_us))
        ts_sorted = ts_us[order]
        val_sorted = vals[order]

        cur = list(state.get) if state.exists else None
        out = []
        for t, v in zip(ts_sorted, val_sorted):
            t = int(t)
            if cur is not None and t - cur[1] > gap_us:
                out.append(closed(*cur))
                cur = None
            if cur is None:
                cur = [t, t, 0, 0.0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(v)
        state.update(tuple(cur))
        # close-by-silence: fire when the event-time watermark passes
        # last + gap.  The timeout must sit strictly beyond the current
        # watermark; if it already elapsed, the next microbatch times out.
        timeout_ms = cur[1] // 1000 + gap_ms
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(out, columns=[f.name for f in SESSION_SCHEMA.fields])

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
