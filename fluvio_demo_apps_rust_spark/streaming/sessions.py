"""Streaming sessionization with explicit keyed state + eviction.

``sessionize_stream`` maintains ONE open session per user inside
``applyInPandasWithState`` (r5 verdict #6 — the arbitrary-state
operator beyond the fixed-size sketches): each microbatch folds the
user's rows in (ts, event_id) order into (start, last, n_events,
cents) state; an inactivity gap ≥ ``gap`` CLOSES the session — the
closed row is emitted exactly once and the state is overwritten by
the new session (the old session's state is gone: eviction by
replacement). With ``evict=True`` the operator additionally arms an
EVENT-TIME TIMEOUT at ``last + gap``: when the watermark passes it,
the group is called with ``hasTimedOut``, the trailing session is
emitted and ``state.remove()`` drops the key entirely — so idle users
hold NO state, the property that makes per-user state bounded by the
ACTIVE population, not the all-time population, at 100 TB.

The oracle-gated query (plans/mining.q94_sessionization) runs
``evict=False``: with event-time timeouts, Spark's no-data microbatch
(noDataMicroBatches, on by default) fires timeouts for sessions idle
at END-OF-STREAM as a function of the final watermark — correct
streaming behavior, but data-dependent output for a finite replay.
Closed-by-gap-only is deterministic: the output is exactly the batch
gaps-and-islands sessions minus each user's trailing (still-open)
session, which is what the DuckDB oracle computes. The eviction path
is pinned by tests/test_streaming_sessions.py (two-batch restart:
state survives the checkpoint, timed-out keys are removed).

Reference parity: the reference's only keyed streaming state is the
producer resume counter (cdc-mysql binlog_resume.rs:30-64); this is
the analytics generalization the task brief requires.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 300_000_000  # 5 minutes, matching q32's batch session_window
OUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_last bigint, "
    "n_events bigint, session_cents bigint"
)
_STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint, cents bigint"
_OUT_COLS = ["user_id", "session_start", "session_last", "n_events", "session_cents"]


def _emit(key: int, s: list[int]) -> dict[str, int]:
    return {
        "user_id": key,
        "session_start": s[0] // 1_000_000,  # epoch seconds (never raw ts)
        "session_last": s[1] // 1_000_000,
        "n_events": s[2],
        "session_cents": s[3],
    }


def _frame(rows: list[dict[str, int]]) -> pd.DataFrame:
    if rows:
        return pd.DataFrame(rows, columns=_OUT_COLS)
    return pd.DataFrame({c: np.array([], dtype=np.int64) for c in _OUT_COLS})


def _make_update(evict: bool):
    def _update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        rows: list[dict[str, int]] = []
        if evict and state.hasTimedOut:
            # watermark passed last + gap: the session can never extend
            # — close it and EVICT the key (idle users hold no state)
            cur = list(state.get)
            rows.append(_emit(uid, cur))
            state.remove()
            yield _frame(rows)
            return
        cur = list(state.get) if state.exists else None
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            pdf = pd.concat(parts).sort_values(["ts", "event_id"], kind="mergesort")
            ts_us = pdf["ts"].to_numpy("datetime64[us]").astype("int64")
            cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
            for t, c in zip(ts_us.tolist(), cents.tolist()):
                if cur is None:
                    cur = [t, t, 1, c]
                elif t - cur[1] >= GAP_US:
                    rows.append(_emit(uid, cur))  # closed by gap
                    cur = [t, t, 1, c]
                else:
                    cur[1] = t
                    cur[2] += 1
                    cur[3] += c
        if cur is not None:
            state.update(tuple(cur))
            if evict:
                # arm the flush point; a later event re-arms further
                # out. Spark rejects an arm at/below the watermark
                # (possible with late data) — clamp to wm+1 so the
                # group still times out in the next batch.
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                    max(cur[1] // 1000 + GAP_US // 1000, wm + 1)
                )
        yield _frame(rows)

    return _update


def sessionize_stream(events: DataFrame, evict: bool = True) -> DataFrame:
    """Per-user 5-minute-gap sessionization over a streaming events
    frame (columns ``user_id``, ``event_id``, ``ts``, ``value``).
    Emits each CLOSED session exactly once — use outputMode("update").
    ``evict=True`` arms event-time timeouts (requires a watermark on
    ``ts``) so idle keys are flushed and removed from the state store;
    ``evict=False`` is the deterministic finite-replay face (trailing
    sessions stay open, matching the batch oracle)."""
    e = events.select("user_id", "event_id", "ts", "value")
    if evict:
        # EventTimeWatermark requires TimestampType (not NTZ); the
        # session tz is pinned UTC repo-wide (session.ensure_utc), so
        # the cast preserves epoch values.
        from pyspark.sql import functions as F

        e = e.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", "0 seconds"
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return e.groupBy("user_id").applyInPandasWithState(
        _make_update(evict),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
