"""Streaming analytics over event streams: watermarked windowed
aggregation, streaming dedup, sessionization.

The reference has no event-time semantics (a binlog is already totally
ordered — SURVEY §2.6); these are the declared streaming extensions of
the new engine, built directly on Structured Streaming's incremental
engine: watermarks bound state, append mode emits only finalized
windows, and checkpoints make every query restartable.

Scale posture: windowed aggregates keep state per (window, key) —
bounded by the watermark horizon; dedup state is bounded by the
watermark too (expired keys are dropped). State lives in the
checkpointed state store, partitioned by key — executors scale it
horizontally.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of JSON-lines analytics events.

    ``max_files_per_trigger`` splits the backlog into one-file
    microbatches (oldest file first), which is how the late-data tests
    drive the watermark across batch boundaries."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(str(path))


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data drop:
    events older than (max event time - watermark) are discarded, and
    append mode emits a window only once it can no longer change."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # exact-cents: per-row quantize before the sum so the result is
            # independent of summation order AND engine round() semantics
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key event stream: duplicates of an event_id
    arriving within the watermark horizon are dropped; state for ids
    older than the horizon is evicted (bounded memory).

    dropDuplicatesWithinWatermark, NOT dropDuplicates: with a key
    subset that excludes the event-time column, plain dropDuplicates
    keeps one state entry per key FOREVER (the watermark only bounds
    state when the time column is part of the keys) — unbounded state
    on a stream of mostly-unique ids."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionized(events: DataFrame, gap: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Per-user session windows (inactivity gap); append mode emits a
    session once the watermark passes its close."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join within a time interval (the ad-attribution
    shape: a right-stream event joins every left-stream event of the
    same user it follows within ``horizon``).

    Both sides are watermarked and the join carries a two-sided
    event-time range constraint — the combination Structured Streaming
    REQUIRES to bound join state: each side buffers only rows younger
    than (watermark + horizon); older state is evicted. Without the
    range condition the state store grows forever.

    ``how='leftOuter'`` adds the attribution NEGATIVE space: a left
    row that found no match is emitted with NULL right columns — but
    only once the watermark passes ``l.ts + horizon`` (until then a
    match could still arrive), i.e. outer results trail the stream by
    watermark delay + horizon and surface on a LATER microbatch's
    state eviction, not at end-of-input.

    Scale posture: state is partitioned by the equi-join key (user),
    scaling horizontally with executors; per-key buffered state is
    bounded by the rate × horizon, independent of stream length.
    """
    l = left.withWatermark("ts", watermark).alias("l")
    r = right.withWatermark("ts", watermark).alias("r")
    return l.join(
        r,
        F.expr(
            "l.user_id = r.user_id "
            "AND r.ts >= l.ts "
            f"AND r.ts <= l.ts + interval {horizon}"
        ),
        how,
    )


def run_to_parquet(
    df: DataFrame, out_dir: str, checkpoint_dir: str, mode: str = "append"
) -> None:
    """Drain all available input into a parquet sink, then stop
    (availableNow). Restartable: the checkpoint carries source offsets,
    watermark, and operator state across runs."""
    q = (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
