"""Sessionization + as-of join (operators/temporal.py) vs brute-force
pure-Python oracles, plus parallelism-invariance and quality/vocab checks."""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.functions as F
import pytest

from camden_spark.functions.text import with_quality_flags
from camden_spark.operators.temporal import asof_join, session_stats, sessionize

EPOCH = dt.datetime(2024, 1, 1)


def _mk_events(n: int, n_users: int, seed: int):
    """Deterministic synthetic events: (event_id, user_id, ts, value)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.randrange(n_users),
                EPOCH + dt.timedelta(seconds=rng.randrange(0, 3_000_000)),
                round(rng.uniform(0, 100), 2),
                rng.choice(["click", "purchase", "view"]),
            )
        )
    return rows


COLS = ["event_id", "user_id", "ts", "value", "event_type"]


@pytest.fixture(scope="module")
def events(spark):
    df = spark.createDataFrame(_mk_events(2000, 25, seed=11), COLS)
    df.cache().count()
    return df


def _oracle_sessions(rows, gap_seconds):
    """Brute-force per-user pass in time order → {(event_id): session_idx}."""
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r[1], []).append(r)
    out = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda r: (r[2], r[0]))
        idx = -1
        prev = None
        for r in evs:
            if prev is None or (r[2] - prev).total_seconds() > gap_seconds:
                idx += 1
            out[r[0]] = idx
            prev = r[2]
    return out


def test_sessionize_matches_bruteforce(spark, events):
    gap = 3600
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(events, gap).select("event_id", "session_idx").collect()
    }
    want = _oracle_sessions(_mk_events(2000, 25, seed=11), gap)
    assert got == want


def test_sessionize_parallelism_invariant(spark, events):
    gap = 3600
    a = sessionize(events.repartition(2), gap)
    b = sessionize(events.repartition(16), gap)
    rows_a = sorted(map(tuple, a.select("event_id", "session_idx").collect()))
    rows_b = sorted(map(tuple, b.select("event_id", "session_idx").collect()))
    assert rows_a == rows_b


def test_session_stats_shape(spark, events):
    st = session_stats(sessionize(events, 3600))
    row = st.agg(
        F.sum("n_events").alias("total"), F.min("duration_sec").alias("mind")
    ).first()
    assert row["total"] == events.count()  # every event lands in one session
    assert row["mind"] >= 0.0


def _oracle_asof(left_rows, right_rows):
    """Per-left-row scan for the latest right at or before it (same key)."""
    by_user: dict = {}
    for r in right_rows:
        by_user.setdefault(r[1], []).append(r)
    for evs in by_user.values():
        evs.sort(key=lambda r: r[2])
    out = {}
    for l in left_rows:
        best = None
        for r in by_user.get(l[1], []):
            if r[2] <= l[2]:
                best = r
            else:
                break
        out[l[0]] = best[3] if best is not None else None
    return out


def test_asof_join_matches_bruteforce(spark, events):
    rows = _mk_events(2000, 25, seed=11)
    left = events.filter(F.col("event_type") == "click")
    right = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()
    }
    want = _oracle_asof(
        [r for r in rows if r[4] == "click"],
        [r for r in rows if r[4] == "purchase"],
    )
    assert got == want
    # some lefts must have matches and some must not, or the test is vacuous
    vals = list(want.values())
    assert any(v is None for v in vals) and any(v is not None for v in vals)


def test_asof_join_inclusive_at_equal_ts(spark):
    ts = EPOCH + dt.timedelta(seconds=100)
    left = spark.createDataFrame([(1, 7, ts)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([(7, ts, 42.0)], ["user_id", "ts", "value"])
    [row] = asof_join(left, right, "user_id", "ts", ["value"]).collect()
    assert row["value_asof"] == 42.0  # right at the SAME instant matches (<=)


def test_asof_join_keeps_unmatched_lefts(spark):
    left = spark.createDataFrame(
        [(1, 7, EPOCH)], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(7, EPOCH + dt.timedelta(seconds=1), 1.0)], ["user_id", "ts", "value"]
    )
    [row] = asof_join(left, right, "user_id", "ts", ["value"]).collect()
    assert row["value_asof"] is None and row["asof_ts"] is None


def test_quality_flags(spark):
    docs = spark.createDataFrame(
        [
            (0, "a solid document with enough plain words to pass the rules"),
            (1, "too short"),
            (2, "!!! ??? ... ;;; ::: ,,, toomuchpunct !!! ??? ... ;;; :::"),
            (3, "1234 5678 90123 45678 901234 numbers numbers 99999 88888"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["passes"], r["flag_too_short"], r["flag_punct"], r["flag_digits"])
        for r in with_quality_flags(docs).collect()
    }
    assert got[0] == (True, False, False, False)
    assert got[1][1] is True and got[1][0] is False  # too short
    assert got[2][2] is True and got[2][0] is False  # punct-heavy
    assert got[3][3] is True and got[3][0] is False  # digit-heavy
    assert got[4][1] is True  # empty = 0 words = too short


def test_streaming_sessionize(spark, tmp_path):
    """Two-file availableNow stream (maxFilesPerTrigger=1 → two microbatches
    + a no-data finalization batch): sessions close EITHER by a later event
    of the same user (A1) or by the event-time watermark passing last+gap
    (B1, C1); the session still inside the watermark at stream end (A2)
    stays in state, unemitted — append-mode contract."""
    from camden_spark.streaming.session_stream import streaming_sessionize

    def ev(user, sec, val):
        return (user, EPOCH + dt.timedelta(seconds=sec), float(val))

    cols = ["user_id", "ts", "value"]
    chunk1 = spark.createDataFrame(
        [ev(1, 0, 1.0), ev(1, 100, 2.0), ev(1, 200, 3.0),   # A1
         ev(2, 0, 5.0), ev(2, 50, 6.0),                     # B1
         ev(3, 5000, 7.0)],                                 # C1 (+ wm push)
        cols,
    )
    chunk2 = spark.createDataFrame(
        [ev(1, 10000, 8.0), ev(1, 10100, 9.0)],             # A2 (stays open)
        cols,
    )
    src = tmp_path / "sess_src"
    chunk1.coalesce(1).write.parquet(str(src / "f1"))
    chunk2.coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(chunk1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = streaming_sessionize(stream, gap_seconds=600, watermark="10 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["user_id"]: (r["start_us"], r["end_us"], r["n_events"], r["total_value"])
        for r in spark.sql("select * from sess_stream_test").collect()
    }
    us = 1_000_000
    base = int(EPOCH.replace(tzinfo=dt.timezone.utc).timestamp()) * us
    assert got == {
        1: (base, base + 200 * us, 3, 6.0),          # A1 closed by A2's event
        2: (base, base + 50 * us, 2, 11.0),          # B1 closed by timeout
        3: (base + 5000 * us, base + 5000 * us, 1, 7.0),  # C1 closed by no-data batch
    }


def test_pack_sequences_invariants(spark):
    """Next-fit layout: no bin exceeds capacity unless it holds exactly one
    oversize doc; positions are dense per bin; layout is partition-count
    invariant (the sandbox stand-in for executor-count invariance)."""
    import random

    import pyspark.sql.functions as F

    from camden_spark.operators.packing import pack_sequences

    rng = random.Random(11)
    rows = [(i, rng.choice([3, 40, 90, 130, 300])) for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = pack_sequences(docs, capacity=256, n_shards=4)
    got = out.collect()
    assert len(got) == 400
    by_bin = {}
    for r in got:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    for (shard, b), members in by_bin.items():
        total = sum(r["n_tokens"] for r in members)
        if total > 256:
            assert len(members) == 1 and members[0]["n_tokens"] > 256
        assert sorted(r["pos"] for r in members) == list(range(len(members)))
        # within a bin, id order == pos order (deterministic next-fit scan)
        ordered = sorted(members, key=lambda r: r["doc_id"])
        assert [r["pos"] for r in ordered] == list(range(len(members)))
    again = pack_sequences(docs.repartition(13), capacity=256, n_shards=4)
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))


def test_repetition_stats_planted(spark):
    """Known fractions: "a a a b" -> top_token 3/4, run 2/3; degenerate docs
    (empty, single-token) produce NULL fractions, not divide-by-zero."""
    from camden_spark.functions.text import repetition_stats

    rows = [
        (1, "a a a b"),
        (2, "x y x y"),   # top token 1/2, top bigram "x y" 2/3, runs 0
        (3, "solo"),
        (4, "   "),
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_stats(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_token_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == round(2 / 3, 6)  # "a a" twice of 3
    assert got[1]["run_frac"] == round(2 / 3, 6)
    assert got[2]["top_token_frac"] == 0.5
    assert got[2]["top_bigram_frac"] == round(2 / 3, 6)
    assert got[2]["run_frac"] == 0.0
    assert got[3]["n_tokens"] == 1 and got[3]["run_frac"] is None
    assert got[3]["top_token_frac"] == 1.0 and got[3]["top_bigram_frac"] is None
    assert got[4]["n_tokens"] == 0
    assert got[4]["top_token_frac"] is None and got[4]["run_frac"] is None
