"""Custom stateful streaming operators (applyInPandasWithState) +
watermarked event-time aggregation.

The reference has no streaming analog — its refresh model is batch
recompute (OutputData.cpp:98-110). These operators cover the streaming
surface a log/telemetry pipeline needs at scale:

- `watermarked_route_counts`: per-window per-route counts with late-data
  tolerance — the streaming form of the A1 metrics table. State is
  bounded by the watermark; output appends finalized windows only.
- `sessionize`: gap-based session windows per key via
  `applyInPandasWithState` — the custom-stateful-operator pattern
  (arbitrary per-key state the built-in window functions can't express).
  State carries across micro-batches; a session closes when an event
  arrives more than `gap` after the session's last event, or on state
  timeout.

Both are Arrow-batched (pandas iterators); no per-row Python outside the
vectorized batch loop.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

# state tuple: (start_epoch_us, end_epoch_us, n_events, value_sum)
_STATE_SCHEMA = "start long, end long, n long, vsum double"


def watermarked_route_counts(
    routed_stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming A1: tumbling-window route metrics with a watermark so
    state for closed windows is dropped (bounded memory at 10^12 scale).
    Append mode emits each window once, when the watermark passes it."""
    return (
        routed_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "route")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "route",
            "n",
        )
    )


def sessionize_native(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap sessionization via Spark's BUILT-IN session_window — the most
    Catalyst-native shape: state is managed by the streaming aggregation
    operator (no Python in the loop), merged incrementally, and bounded
    by the watermark. Idle sessions are CLOSED AND EMITTED when the
    event-time watermark passes session_end + gap — the event-time
    analog of processing-time session timeout, and the path this build
    actually supports for timeout-closed sessions (the legacy state-API
    timeout crashes, see `sessionize`; transformWithState needs protobuf
    this container lacks, see `sessionize_tws`).

    Same output schema as `sessionize`. Semantics delta: session_start/
    session_end are the window BOUNDS only when derived from min/max
    event times — we aggregate min(ts)/max(ts) explicitly so the output
    matches the custom operators row-for-row on in-gap data."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(ts_col, f"{gap_seconds} seconds"), "user_id"
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "value_sum"
        )
    )


def _fold_gap_sessions(pdfs, cur, gap_us, on_close):
    """Shared gap-session fold used by BOTH state-API sessionizers
    (legacy applyInPandasWithState and the transformWithState port),
    extracted so the semantics cannot diverge: materialize+sort the
    micro-batch ONCE per key (chunk order is not time order), convert
    pandas datetime64[ns] to epoch-us, then INTERVAL-MERGE the batch's
    events with the running [start, end, n, value_sum] session.

    The merge handles arbitrary cross-batch disorder: events are folded
    into gap-separated sessions (linear — the batch is sorted), the
    running session is merged into that list wherever it belongs (two
    sessions within `gap_us` coalesce, so a bridging event joins its
    neighbors), and every session EXCEPT the chronologically last is
    closed via on_close. A naive `t - cur.end > gap` running fold would
    instead MERGE an event arriving more than a gap BEFORE the session
    start (the test is negative) and silently stretch the session over
    the hole. The one-open-session state bound is kept, so a straggler
    older than the running session gets exactly one batch of merge
    tolerance before its session closes — the documented trade of the
    watermark-less state API (sessionize_native + watermark is the path
    with full event-time lateness semantics). Returns the updated
    running session (or None)."""
    parts = [pdf for pdf in pdfs if not pdf.empty]
    if not parts:
        return cur
    pdf = parts[0] if len(parts) == 1 else pd.concat(parts)
    pdf = pdf.sort_values("ts", kind="mergesort")
    ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
    vals = pdf["value"].to_numpy()
    # one sorted gap-merge pass over event singletons + the running
    # session IS the full transitive interval merge (fuzz-verified
    # against a brute-force reference in review)
    sessions = [[int(t), int(t), 1, float(v)] for t, v in zip(ts_us, vals)]
    if cur is not None:
        sessions.append(list(cur))
    sessions.sort(key=lambda s: s[0])
    merged = []
    for s in sessions:
        if merged and s[0] - merged[-1][1] <= gap_us:
            merged[-1][1] = max(merged[-1][1], s[1])
            merged[-1][2] += s[2]
            merged[-1][3] += s[3]
        else:
            merged.append(s)
    for s in merged[:-1]:
        on_close(tuple(s))
    return merged[-1] if merged else None



def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Gap-based sessionization per user via applyInPandasWithState.

    Input schema: (user_id long, ts timestamp, value double[, ...]).
    Emits one row per CLOSED session (closed by a later event beyond the
    gap, or — when `timeout_ms` is set — by processing-time state
    timeout). Still-open sessions remain in the state store across
    micro-batches.

    `timeout_ms=None` (default) uses NoTimeout: this pyspark build's
    legacy-API timeout path is broken — minimal repro (pinned while
    diagnosing, Spark 4.1.2): ProcessingTimeTimeout + setTimeoutDuration
    fails on the batch where a state times out, flakily as either
    "Python worker exited unexpectedly (crashed)" or a planning-phase
    [INTERNAL_ERROR] NullPointerException (SparkPlan.session() null) —
    both before user code in the hasTimedOut branch runs. Timeout-based
    expiry is therefore served by `sessionize_tws` (the Spark 4
    transformWithStateInPandas API with per-key timers), which is tested
    end-to-end; this legacy entry point keeps timeout_ms opt-in for
    builds where the old path works.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        user_id = key[0]
        closed = []

        if state.hasTimedOut:
            if state.exists:
                s, e, n, vs = state.get
                closed.append((user_id, s, e, n, vs))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            # One key's micro-batch data may arrive as SEVERAL Arrow
            # chunks (groups larger than the Arrow batch size); sorting
            # per-chunk would process events out of time order and move
            # session boundaries wrongly — the shared fold sorts ONCE
            # per key (per-key data is session-scale, stays bounded)
            cur = _fold_gap_sessions(
                pdfs, cur, gap_us, lambda c: closed.append((user_id,) + c)
            )
            if cur is not None:
                state.update(tuple(cur))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                    "value_sum": [c[4] for c in closed],
                }
            )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def sessionize_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Gap sessionization on the Spark 4 stateful API
    (transformWithStateInPandas): per-key ValueState + processing-time
    TIMERS close idle sessions — the timeout semantics the legacy
    applyInPandasWithState path cannot run on this build (see `sessionize`
    docstring for the pinned repro). Same output schema and gap semantics
    as `sessionize`; parity pinned by tests/test_streaming_stateful.py.

    Requires the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider), a transformWithState constraint —
    and `google.protobuf` (the transformWithState Python client speaks a
    protobuf protocol; raise early with a clear message instead of a
    worker-side ImportError when the container lacks it).
    """
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "sessionize_tws needs google.protobuf (transformWithState "
            "client protocol); not installed in this environment — use "
            "sessionize_native (event-time session_window + watermark "
            "closure) or legacy sessionize instead"
        ) from e

    import pandas as pd  # local import keeps worker pickling lean

    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_us = gap_seconds * 1_000_000

    def _emit(rows):
        return pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "session_start": pd.to_datetime([r[1] for r in rows], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in rows], unit="us"),
                "n_events": [r[3] for r in rows],
                "value_sum": [r[4] for r in rows],
            }
        )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("session", _STATE_SCHEMA)

        def _reset_timer(self, timerValues: "TimerValues") -> None:
            if timeout_ms is None:
                return
            for t in list(self.handle.listTimers()):
                self.handle.deleteTimer(t)
            self.handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            user_id = key[0]
            cur = list(self.state.get()) if self.state.exists() else None
            closed = []
            cur = _fold_gap_sessions(
                rows, cur, gap_us, lambda c: closed.append((user_id,) + c)
            )
            if cur is not None:
                self.state.update(tuple(cur))
                self._reset_timer(timerValues)
            if closed:
                yield _emit(closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo: "ExpiredTimerInfo"):
            if self.state.exists():
                s, e, n, vs = self.state.get()
                self.state.clear()
                yield _emit([(key[0], s, e, n, vs)])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=SESSION_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def dedup_stream(
    docs: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup across micro-batches: emit each content
    digest ONCE, the first time it is seen, with the smallest key of
    that first batch as the keeper. The ingest-side half of the dedup
    family (operators/dedup.py::exact_dedup is the batch/backfill half):
    as crawl shards stream in, only never-before-seen documents pass.

    State = one empty marker row per seen digest, keyed by the digest —
    the same bounded-per-key shape as the sessionizers; at 10^12 scale
    the digest space IS the distinct-document count, so production runs
    point this at the RocksDB state store and/or put a TTL policy on
    dormant digests (both Spark-config-level knobs, not plan changes).

    Semantics delta vs batch exact_dedup, by design: the batch keeper is
    the GLOBAL min key per digest; the streaming keeper is the min key
    of the digest's FIRST micro-batch (later batches cannot retract an
    already-emitted row in append mode). Digest SETS are identical —
    pinned by tests/test_streaming_curation.py.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"digest string, keeper_{key} long"
    state_schema = "seen int"

    def fn(key_, pdf_iter, state: GroupState):
        if state.exists:
            return
        best = None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            col = pdf[key].dropna()
            if col.empty:
                continue
            m = col.min()
            best = m if best is None else min(best, m)
        if best is None:
            # nothing usable in this batch — leave the digest unseen
            return
        state.update((1,))
        import pandas as pd

        yield pd.DataFrame({"digest": [key_[0]], f"keeper_{key}": [int(best)]})

    # null text has no digest; null keys cannot be keepers — drop both
    # up front so a poisoned row cannot fail the whole micro-batch
    keyed = (
        docs.where(F.col(text_col).isNotNull() & F.col(key).isNotNull())
        .select(
            F.md5(F.col(text_col)).alias("digest"),
            F.col(key).cast("long").alias(key),
        )
        .groupBy("digest")
    )
    return keyed.applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
