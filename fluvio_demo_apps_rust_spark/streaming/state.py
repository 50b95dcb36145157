"""Stream state-store partition sizing (README finding #18)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def stream_state_partitions(
    spark: SparkSession,
    approx_keys: int,
    approx_rows_per_batch: int | None = None,
) -> int:
    """Partition count for a stream's state stores, derived from the
    stream's own properties instead of a fixture literal (VERDICT r13
    item 6).

    README finding #18: state stores cost ``shuffle.partitions ×
    stateful-ops × microbatches`` tasks per run REGARDLESS of data
    size, so a fixture-scale stream must not inherit the batch shuffle
    width (32-way stores on a 200-row stream are pure scheduling
    overhead — q99 measured 12.6 s → 3.7 s in r12). Conversely a
    stateful operator's useful parallelism is bounded by its distinct
    KEY count and by the rows actually arriving per microbatch::

        p = clamp(next_pow2(min(approx_keys, rows_per_batch // 25)),
                  4, defaultParallelism)

    ``SPARK_STREAM_STATE_PARTITIONS`` overrides everything — the
    cluster posture: size to measured state volume/throughput with an
    env knob, never a code edit. Callers pass APPROXIMATIONS read off
    the stream's semantics (|market segments|, |event types|, wire
    events per admitted file); the power-of-two rounding and the
    [4, defaultParallelism] clamp absorb the imprecision, and the
    semantics of every caller are partition-count independent (their
    oracle gates pin identical output at any width).
    """
    env = os.environ.get("SPARK_STREAM_STATE_PARTITIONS")
    if env:
        return max(1, int(env))
    cap = approx_keys
    if approx_rows_per_batch is not None:
        cap = min(cap, approx_rows_per_batch // 25)
    p = 1
    while p < cap:
        p *= 2
    return max(4, min(spark.sparkContext.defaultParallelism, p))
