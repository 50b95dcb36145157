"""Mergeable sketch state inside a custom stateful streaming operator.

``hll_distinct_stream`` maintains the SAME HyperLogLog the batch query
``q89_hll_distinct`` computes (m=256 registers, 60-bit md5 hash,
linear-counting small-range branch) as per-key state in
``applyInPandasWithState``: each microbatch folds its rows into the
256-byte register array, the state store checkpoints it, and the
operator emits the running distinct estimate per key per batch.

This is the streaming face of the sketch-family scale posture: the
state is FIXED-SIZE (256 bytes per key) no matter how many events
stream through, registers merge by element-wise max (so shard/restart
order cannot change the result), and the estimate after the last
microbatch is bit-for-bit the batch q89 estimate over the same rows —
pinned by ``tests/test_streaming_sketch.py`` (modulo ±1 on the
linear-counting branch, whose single ``ln`` is libm-vs-JVM 1-ulp
territory; the register STATE itself is exactly integer-deterministic).

Reference parity: the reference (cdc-mysql) keeps one resume counter as
producer state (binlog_resume.rs:30-64); this generalizes the same
keyed-state machinery (see streaming/stateful.py) to an analytics
sketch, the shape a 100 TB curation pipeline uses for streaming corpus
cardinality.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_M = 256
# alpha_256 * m^2 * 2^53 — the identical constant (same repr) the batch
# query embeds in both its Spark literal and its DuckDB oracle.
_C = 0.7213 / (1.0 + 1.079 / _M) * 65536.0 * 9007199254740992.0

OUT_SCHEMA = "event_type string, n_events bigint, hll_estimate bigint"
_STATE_SCHEMA = "regs binary, n_events bigint"


def _hash60(value: Any) -> int:
    """60-bit md5 hash, identical to the batch/oracle formulation:
    first 15 hex chars of md5 of the value's decimal string."""
    return int(hashlib.md5(str(value).encode()).hexdigest()[:15], 16)


def _fold(regs: bytearray, ids: np.ndarray) -> None:
    """Fold ids into the register array: regs[hv % m] = max(, rho)."""
    for uid in np.unique(ids):
        hv = _hash60(int(uid))
        idx = hv % _M
        w = hv >> 8
        rho = 53 - w.bit_length() if w else 53
        if rho > regs[idx]:
            regs[idx] = rho


def estimate_from_regs(regs: bytes) -> int:
    """Registers → estimate, mirroring q89 exactly: exact-BIGINT
    harmonic denominator, raw HLL, linear-counting when raw ≤ 2.5m
    with empty registers present (rho==0 marks an empty register)."""
    s = 0
    v = 0
    for r in regs:
        if r == 0:
            v += 1
            s += 1 << 53
        else:
            s += 1 << (53 - r)
    raw_e = _C / s
    if raw_e <= 2.5 * _M and v > 0:
        return math.floor(_M * math.log(_M / float(v)) + 0.5)
    return math.floor(raw_e + 0.5)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        blob, n_events = state.get
        regs = bytearray(blob)
    else:
        regs, n_events = bytearray(_M), 0
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            _fold(regs, pdf["user_id"].to_numpy())
    state.update((bytes(regs), n_events))
    yield pd.DataFrame(
        [
            {
                "event_type": key[0],
                "n_events": n_events,
                "hll_estimate": estimate_from_regs(regs),
            }
        ]
    )


def hll_distinct_stream(events: DataFrame) -> DataFrame:
    """Running distinct-user estimate per event type over a streaming
    events frame (columns ``event_type``, ``user_id``). Emits one
    updated row per key per microbatch — use ``outputMode("update")``.
    State: 256 registers + a row counter per key, checkpoint-restored
    across restarts."""
    return events.select("event_type", "user_id").groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming count-min: the frequency-sketch twin of the HLL stream above.

_CM_DEPTH = 4
_CM_WIDTH = 256

CM_OUT_SCHEMA = (
    "event_type string, n_events bigint, sketch_digest string, est_user1 bigint"
)
_CM_STATE_SCHEMA = "counters binary, n_events bigint"


def _cm_bucket(seed: int, value) -> int:
    """Bucket hash, identical to the batch count-min / DuckDB oracle
    text: first 15 hex chars of md5('seed:value') mod width."""
    h = hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:15]
    return int(h, 16) % _CM_WIDTH

_CM_PROBE_BUCKETS = [_cm_bucket(s, 1) for s in range(_CM_DEPTH)]


def _cm_fold(counters: np.ndarray, ids: np.ndarray) -> None:
    """Add this batch's occurrence counts into the (depth, width) grid.
    Additive, so shard/batch order cannot change the final state."""
    uids, cnts = np.unique(ids, return_counts=True)
    for uid, c in zip(uids, cnts):
        for s in range(_CM_DEPTH):
            counters[s, _cm_bucket(s, int(uid))] += int(c)


def cm_digest(counters: np.ndarray) -> str:
    """Order-canonical digest of the full grid (zeros included), the
    same md5-over-'c0,c1,...' string the oracle builds with
    string_agg(cnt, ',' ORDER BY seed, bucket)."""
    return hashlib.md5(
        ",".join(str(int(x)) for x in counters.reshape(-1)).encode()
    ).hexdigest()


def _cm_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        blob, n_events = state.get
        counters = np.frombuffer(blob, dtype="<i8").reshape(_CM_DEPTH, _CM_WIDTH).copy()
    else:
        counters = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype="<i8")
        n_events = 0
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            _cm_fold(counters, pdf["user_id"].to_numpy())
    state.update((counters.astype("<i8").tobytes(), n_events))
    est1 = min(int(counters[s, _CM_PROBE_BUCKETS[s]]) for s in range(_CM_DEPTH))
    yield pd.DataFrame(
        [
            {
                "event_type": key[0],
                "n_events": n_events,
                "sketch_digest": cm_digest(counters),
                "est_user1": est1,
            }
        ]
    )


def countmin_stream(events: DataFrame) -> DataFrame:
    """Running count-min frequency sketch per event type over a
    streaming events frame (columns ``event_type``, ``user_id``): a
    4x256 exact-BIGINT counter grid per key as applyInPandasWithState
    state. Counter updates are SUMS — fully mergeable/order-
    insensitive, so streaming state after the last microbatch is
    bit-identical to a batch fold (the q91 argument, additively).
    Emits the grid digest plus the probe estimate for user_id 1 each
    batch — use ``outputMode("update")``. State: 8 KiB + a BIGINT per
    key, forever, no matter the stream length."""
    return events.select("event_type", "user_id").groupBy("event_type").applyInPandasWithState(
        _cm_update,
        outputStructType=CM_OUT_SCHEMA,
        stateStructType=_CM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
