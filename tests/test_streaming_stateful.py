"""Stateful streaming operators: applyInPandasWithState sessionization
(state carried across micro-batches) and watermarked windowed route
counts (late-data-bounded state, append-mode finalized windows)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from txtlogparser_spark.streaming.stateful import (
    sessionize,
    watermarked_route_counts,
)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(stream_df, out_dir, name):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, name))
        .option("checkpointLocation", os.path.join(out_dir, f"_ckpt_{name}"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def test_sessionize_across_batches(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "out")

    # batch 1: user 1 has two events 10s apart (one open session);
    # user 2 one event (open session, never closed)
    _write_events(
        spark,
        src,
        [(1, ts(0), 1.0), (1, ts(10), 2.0), (2, ts(5), 7.0)],
    )
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize(stream, gap_seconds=1800)
    _drain(sessions, out, "sessions")

    # batch 2: user 1 event far beyond the gap → closes session 1
    _write_events(spark, src, [(1, ts(7200), 3.0)])
    _drain(sessions, out, "sessions")

    got = spark.read.parquet(os.path.join(out, "sessions")).collect()
    closed = {(r["user_id"], r["n_events"], r["value_sum"]) for r in got}
    assert (1, 2, 3.0) in closed, got
    starts = {r["user_id"]: r["session_start"] for r in got}
    assert starts[1] == ts(0)
    ends = {r["user_id"]: r["session_end"] for r in got}
    assert ends[1] == ts(10)
    # user 2's session is still open → not emitted
    assert all(r["user_id"] != 2 for r in got)


def test_sessionize_multichunk_group(spark, tmp_path):
    """A key whose micro-batch data spans SEVERAL Arrow chunks must be
    sorted globally, not per-chunk: out-of-order chunks would otherwise
    move session boundaries backwards (round-1 ADVICE)."""
    src = str(tmp_path / "mc_in")
    out = str(tmp_path / "out")
    # file order interleaves two true sessions; with 2-row Arrow chunks a
    # per-chunk sort processes 500,510,0,10,520,20,530,30 and corrupts
    # the boundaries. True sessions (gap=100): [0..30]x4 and [500..530]x4.
    rows = [
        (1, ts(500), 1.0), (1, ts(510), 1.0),
        (1, ts(0), 1.0), (1, ts(10), 1.0),
        (1, ts(520), 1.0), (1, ts(20), 1.0),
        (1, ts(530), 1.0), (1, ts(30), 1.0),
    ]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        _write_events(spark, src, rows)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sessions = sessionize(stream, gap_seconds=100)
        _drain(sessions, out, "mc")
        # closing event far beyond the gap closes the open session
        _write_events(spark, src, [(1, ts(100000), 0.0)])
        _drain(sessions, out, "mc")
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    got = {
        (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(os.path.join(out, "mc")).collect()
    }
    assert got == {(ts(0), ts(30), 4), (ts(500), ts(530), 4)}, got


def test_sessionize_matches_batch_sessionization(spark, tmp_path):
    """Streaming gap sessions == batch lag()-gap sessions minus each
    user's final (still-open) session."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    src = str(tmp_path / "ev_in")
    out = str(tmp_path / "out")
    rows1 = [
        (1, ts(0), 1.0), (1, ts(100), 2.0),          # session A (user 1)
        (2, ts(50), 5.0),                            # session (user 2)
    ]
    rows2 = [
        (1, ts(4000), 1.5), (1, ts(4100), 0.5),      # closes A, opens B
        (2, ts(9000), 1.0),                          # closes user2 s1
        (1, ts(9000), 9.0),                          # closes B, opens C
    ]
    _write_events(spark, src, rows1)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize(stream, gap_seconds=1800)
    _drain(sessions, out, "s")
    _write_events(spark, src, rows2)
    _drain(sessions, out, "s")

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["value_sum"])
        for r in spark.read.parquet(os.path.join(out, "s")).collect()
    }

    # batch sessionization over the SAME events
    e = spark.read.parquet(src)
    w = Window.partitionBy("user_id").orderBy("ts")
    ep = F.unix_timestamp("ts")
    gap = ep - F.lag(ep).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    per_sess = (
        e.withColumn("sess_id", F.sum(is_new).over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
    )
    last = per_sess.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    closed_batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["value_sum"])
        for r in per_sess.join(last, "user_id")
        .where(F.col("sess_id") != F.col("last_id"))
        .collect()
    }
    assert got == closed_batch
    assert len(got) == 3  # A, B (user 1) + user 2's first


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_sessionize_native_watermark_closes_idle_session(spark, tmp_path):
    """Idle sessions are closed and emitted when the event-time watermark
    passes them — the timeout path this build supports (built-in
    session_window; the legacy state-API timeout crashes, pinned in
    streaming/stateful.py)."""
    from txtlogparser_spark.streaming.stateful import sessionize_native

    src = str(tmp_path / "nat_in")
    out = str(tmp_path / "out")
    _write_events(spark, src, [(1, ts(0), 1.0), (1, ts(10), 2.0)])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = sessionize_native(stream, gap_seconds=30, watermark="10 seconds")
    _drain(sessions, out, "nat")
    p = os.path.join(out, "nat")
    got = spark.read.parquet(p).collect()
    assert all(r["user_id"] != 1 for r in got)  # watermark not past it yet

    # an event far in the future advances the watermark → idle session of
    # user 1 is finalized and appended, with exact event-time bounds
    _write_events(spark, src, [(2, ts(10_000), 5.0)])
    _drain(sessions, out, "nat")
    got = {r["user_id"]: r for r in spark.read.parquet(p).collect()}
    assert 1 in got, got
    assert got[1]["session_start"] == ts(0)
    assert got[1]["session_end"] == ts(10)
    assert got[1]["n_events"] == 2
    assert got[1]["value_sum"] == 3.0
    assert 2 not in got  # user 2's session still open


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState Python client needs google.protobuf "
    "(absent in this container; sessionize_tws raises a documented "
    "ImportError — pinned below in test_sessionize_tws_unavailable)",
)
def test_sessionize_tws_timer_closes_idle_session(spark, tmp_path):
    """Timeout-closed sessions via the Spark 4 transformWithStateInPandas
    timer path (the legacy ProcessingTimeTimeout path crashes this build —
    repro pinned in streaming/stateful.py docstring)."""
    import time

    from txtlogparser_spark.streaming.stateful import sessionize_tws

    src = str(tmp_path / "tws_in")
    out = str(tmp_path / "out")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_events(spark, src, [(1, ts(0), 1.0), (1, ts(10), 2.0)])
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sessions = sessionize_tws(stream, gap_seconds=1800, timeout_ms=1500)
        _drain(sessions, out, "tws")
        got = (
            spark.read.parquet(os.path.join(out, "tws")).collect()
            if os.path.exists(os.path.join(out, "tws"))
            else []
        )
        assert all(r["user_id"] != 1 for r in got)  # still open, no timer yet

        time.sleep(2.5)  # let the 1.5s processing-time timer expire
        _write_events(spark, src, [(2, ts(5000), 5.0)])
        _drain(sessions, out, "tws")
        got = spark.read.parquet(os.path.join(out, "tws")).collect()
        by_user = {r["user_id"]: r for r in got}
        # user 1's idle session was closed BY THE TIMER, not by an event
        assert 1 in by_user, got
        assert by_user[1]["session_start"] == ts(0)
        assert by_user[1]["session_end"] == ts(10)
        assert by_user[1]["n_events"] == 2
        assert by_user[1]["value_sum"] == 3.0
        # user 2's fresh session is still open
        assert 2 not in by_user
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_sessionize_tws_unavailable_raises_cleanly(spark):
    """Without protobuf the new-API path fails FAST with a pointer to the
    supported alternatives, not with a worker-side ImportError mid-query."""
    if _has_protobuf():
        pytest.skip("protobuf present: covered by the timer test instead")
    from txtlogparser_spark.streaming.stateful import sessionize_tws

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value as user_id", "timestamp as ts", "1.0 as value")
    )
    with pytest.raises(ImportError, match="sessionize_native"):
        sessionize_tws(stream, gap_seconds=10, timeout_ms=100)


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState Python client needs google.protobuf",
)
def test_sessionize_tws_gap_parity_with_legacy(spark, tmp_path):
    """Without timers, the new-API sessionizer emits exactly what the
    legacy one does (same gap semantics, same schema)."""
    from txtlogparser_spark.streaming.stateful import sessionize_tws

    src = str(tmp_path / "twsp_in")
    out = str(tmp_path / "out")
    rows1 = [(1, ts(0), 1.0), (1, ts(100), 2.0), (2, ts(50), 5.0)]
    rows2 = [(1, ts(4000), 1.5), (2, ts(9000), 1.0), (1, ts(9000), 9.0)]
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_events(spark, src, rows1)
        schema = spark.read.parquet(src).schema

        def drain_all(fn, name):
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            _drain(fn(stream, gap_seconds=1800), out, name)

        drain_all(sessionize_tws, "tws_p")
        drain_all(sessionize, "leg_p")
        _write_events(spark, src, rows2)
        drain_all(sessionize_tws, "tws_p")
        drain_all(sessionize, "leg_p")
        key = lambda r: (
            r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], r["value_sum"],
        )
        tws = sorted(key(r) for r in spark.read.parquet(os.path.join(out, "tws_p")).collect())
        leg = sorted(key(r) for r in spark.read.parquet(os.path.join(out, "leg_p")).collect())
        assert tws == leg and len(tws) == 3
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_watermarked_route_counts(spark, tmp_path):
    src = str(tmp_path / "routed_in")
    out = str(tmp_path / "out")

    rows1 = [
        (201, ts(600)),
        (201, ts(1200)),
        (202, ts(1800)),
    ]
    df1 = spark.createDataFrame(rows1, "route int, ts timestamp")
    df1.coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = watermarked_route_counts(
        stream, ts_col="ts", window="1 hour", watermark="2 hours"
    )
    _drain(counts, out, "counts")

    # advance the watermark far past the first window: event at +6h
    # → watermark 4h → the 00:00-01:00 window finalizes and appends
    df2 = spark.createDataFrame([(203, ts(6 * 3600))], "route int, ts timestamp")
    df2.coalesce(1).write.mode("append").parquet(src)
    _drain(counts, out, "counts")

    got = spark.read.parquet(os.path.join(out, "counts")).collect()
    finalized = {(r["route"], r["n"]) for r in got if r["window_start"] == ts(0)}
    assert (201, 2) in finalized, got
    assert (202, 1) in finalized, got
    # the +6h window is not finalized yet → absent
    assert all(r["window_start"] != ts(6 * 3600) for r in got)


def test_fold_out_of_order_straggler_is_separate_session():
    """Review finding (confirmed): an event arriving more than a gap
    BEFORE the running session's start used to MERGE into it (the
    `t - cur.end > gap` test is negative for past events), stretching
    the session over the hole. The interval-merge fold emits it as its
    own closed session instead."""
    import pandas as pd

    from txtlogparser_spark.streaming.stateful import _fold_gap_sessions

    gap_us = 1_000_000  # 1 s
    closed = []
    # batch 1: one event at t=10000 s
    cur = _fold_gap_sessions(
        iter([pd.DataFrame({"ts": pd.to_datetime([10_000], unit="s"), "value": [1.0]})]),
        None,
        gap_us,
        closed.append,
    )
    assert cur == [10_000_000_000, 10_000_000_000, 1, 1.0] and not closed
    # batch 2: ancient stragglers at t=0 and t=0.5 s (within one gap of
    # each other -> ONE session), far beyond the gap before cur
    cur = _fold_gap_sessions(
        iter(
            [
                pd.DataFrame(
                    {"ts": pd.to_datetime([500_000, 0], unit="us"), "value": [2.0, 3.0]}
                )
            ]
        ),
        cur,
        gap_us,
        closed.append,
    )
    assert closed == [(0, 500_000, 2, 5.0)], "stragglers form their own closed session"
    assert cur == [10_000_000_000, 10_000_000_000, 1, 1.0], (
        "running session boundaries must be untouched"
    )


def test_fold_bridging_event_coalesces_sessions():
    """An event landing between two in-batch sessions within one gap of
    both must produce ONE merged session, counted once."""
    import pandas as pd

    from txtlogparser_spark.streaming.stateful import _fold_gap_sessions

    gap_us = 1_000_000
    closed = []
    # cur session at [0, 0]; batch delivers t=2.0s (new session: 2.0s is
    # beyond gap of 0) then t=1.0s arrives in the SAME batch sorted
    # between them, within one gap of both -> all three coalesce
    cur = _fold_gap_sessions(
        iter(
            [
                pd.DataFrame(
                    {
                        "ts": pd.to_datetime([2_000_000, 1_000_000], unit="us"),
                        "value": [1.0, 1.0],
                    }
                )
            ]
        ),
        [0, 0, 1, 1.0],
        gap_us,
        closed.append,
    )
    assert not closed
    assert cur == [0, 2_000_000, 3, 3.0]
