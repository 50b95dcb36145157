"""Event-time queries over the ``events`` table.

These are the batch-checkable faces of the engine's streaming surface:
the same tumbling / sliding / session windowing and dedup semantics run
under Structured Streaming in ``streaming/`` (with watermarks); here
they run on the bounded events table so the DuckDB oracle can check
them. Window starts are emitted as epoch BIGINT (never raw timestamps)
for byte-identical comparison; the session is pinned UTC so Spark's
``window()``/``session_window()`` boundaries match DuckDB's naive
timestamp arithmetic.

Scale posture: windowed aggregation shuffles on (window, key) with
map-side partial aggregation; session windows shuffle on user_id once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators.intervals import merge_intervals
from ..session import ensure_utc
from .base import fround, load, qavg, qsum, register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    # events.parquet has shipped with two layouts: TIMESTAMP(NANOS) (which
    # Spark's reader only accepts as raw int64 via nanosAsLong) and plain
    # timestamp[us] (read as TIMESTAMP_NTZ). Branch on the dtype actually
    # loaded so either layout yields the same UTC-pinned TIMESTAMP column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load(spark, sf_dir, "events")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        # int64 nanos -> truncate to micros (what DuckDB's reader does).
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # timestamp / timestamp_ntz: session is UTC, so the cast is a no-op
    # reinterpretation that matches DuckDB's naive timestamp arithmetic.
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


@register(
    "q30_events_tumbling",
    headline=True,
    tags=("events", "window", "tumbling"),
    oracle="""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
       event_type,
       count(*)                 AS cnt,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY window_start, event_type
""",
)
def q30_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), qsum(F.col("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


@register(
    "q31_events_sliding",
    tags=("events", "window", "sliding"),
    oracle="""
-- 1h windows sliding by 30min: each event lands in exactly two windows,
-- starting at the two 30-min boundaries in (ts-1h, ts].
SELECT b - s AS window_start, count(*) AS cnt, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM (SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS b, value FROM events)
CROSS JOIN (SELECT unnest([0, 1800]) AS s)
GROUP BY window_start
""",
)
def q31_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour, 30 min slide) via ``window()``."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), qsum(F.col("value"), 2).alias("total_value"))
        .select(F.col("w.start").cast("long").alias("window_start"), "cnt", "total_value")
    )


@register(
    "q32_events_session",
    tags=("events", "window", "session"),
    oracle="""
-- Session windows, 5-minute gap, per user: gaps-and-islands. A new
-- session starts when the previous event is >= 5 minutes older
-- (matches Spark's session_window half-open [start, last+gap)).
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 300000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) // 1000000 AS session_start,
       count(*)                     AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS session_value
FROM numbered
GROUP BY user_id, session_id
""",
)
def q32_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user via
    ``session_window`` — the batch face of the streaming operator."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), qsum(F.col("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "q33_events_dedup",
    tags=("events", "dedup"),
    oracle="""
SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS dup_cnt
FROM events
GROUP BY user_id, event_type
""",
)
def q33_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: keep the lowest event_id per (user, type).

    (``dropDuplicates`` keeps an arbitrary row — fine for streaming
    at-most-once-per-key semantics, not for an oracle check — so the
    declared form is the deterministic min_by aggregate.)
    """
    e = _events(spark, sf_dir)
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("dup_cnt")
    )


@register(
    "q34_events_json_props",
    tags=("events", "json"),
    oracle="""
SELECT CAST(props->>'$.k' AS INT) // 10 AS k_bucket,
       count(*)             AS cnt,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / (count(value) * 100.0) AS avg_value
FROM events
GROUP BY k_bucket
""",
)
def q34_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: extract a JSON property and bucket it."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy(F.floor(k / 10).cast("long").alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"), qavg(F.col("value"), 2).alias("avg_value"))
    )


@register(
    "q35_events_rate",
    tags=("events", "window", "lag"),
    oracle="""
-- Per-type daily counts with previous-day delta (lag over aggregates).
WITH daily AS (
  SELECT event_type, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_start, count(*) AS cnt
  FROM events GROUP BY event_type, day_start
)
SELECT event_type, day_start, cnt,
       cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY day_start) AS delta
FROM daily
""",
)
def q35_events_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-window composition: daily counts + day-over-day
    delta per event type."""
    e = _events(spark, sf_dir)
    daily = e.groupBy(
        "event_type", F.window("ts", "1 day").alias("w")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.select(
        "event_type", F.col("w.start").cast("long").alias("day_start"), "cnt"
    )
    w = Window.partitionBy("event_type").orderBy("day_start")
    return daily.withColumn("delta", F.col("cnt") - F.lag("cnt").over(w))


@register(
    "q36_events_gapfill",
    tags=("events", "timeseries", "gapfill"),
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS c,
         floor(sum(CAST(round(value * 10000) AS BIGINT))
               / (count(*) * 10000.0) * 10000 + 0.5) / 10000.0 AS av
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events),
grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
slots AS (SELECT h, event_type
          FROM grid CROSS JOIN (SELECT DISTINCT event_type FROM events)),
j AS (SELECT s.h, s.event_type, c, av FROM slots s
      LEFT JOIN hourly USING (h, event_type))
SELECT CAST(epoch(h) AS BIGINT) AS hour_start, event_type,
       coalesce(c, 0) AS cnt,
       last_value(av IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_avg
FROM j
""",
)
def q36_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense 1-hour grid per event type (empty
    slots count 0) with forward-filled hourly averages — the
    hypertable-rollup / downsample-and-interpolate primitive. The grid
    is generated from the bounds (two tiny rows crossed with the
    distinct keys), never materialized wider than slots × keys.

    The hourly average sums exact scaled integers (round(value·10⁴) as
    BIGINT — identity-safe on the raw 4-dp source column) so
    partial-aggregation order can't move the result, and the 4-dp
    presentation uses the repo's binary floor form (fround: the
    scale-0 round() this query used through r3 is NOT half-boundary
    immune either — README finding #5, q86's 43973.5 — so it was
    migrated like everything else; same fix in q60). Rounding happens
    per hourly value BEFORE the forward-fill window, which only
    copies it."""
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("c"),
        fround(
            F.sum(F.round(F.col("value") * 10000).cast("long"))
            / (F.count(F.lit(1)) * 10000.0),
            4,
        ).alias("av"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    slots = grid.crossJoin(e.select("event_type").distinct())
    j = slots.join(hourly, ["h", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("h").cast("long").alias("hour_start"),
        "event_type",
        F.coalesce("c", F.lit(0)).alias("cnt"),
        F.last("av", ignorenulls=True).over(w).alias("filled_avg"),
    )


@register(
    "q37_stream_windowed",
    tags=("events", "streaming", "watermark"),
    # The streaming fixture is deterministic (generated inline, no sf
    # dependence), so append-mode emission is expressible as a batch
    # query: a window is emitted iff its END is <= the final watermark
    # (max event time - 30 min). The oracle regenerates the same 200
    # events and applies that cutoff.
    oracle="""
WITH raw AS (SELECT unnest(generate_series(0, 199)) AS i),
e AS (SELECT TIMESTAMP '2024-01-01 00:00:00'
             + (i // 50) * INTERVAL '1 hour'
             + (i % 50) * INTERVAL '1 minute' AS ts,
             't' || CAST(i % 3 AS VARCHAR) AS event_type,
             CAST(i % 5 AS DOUBLE) AS value
      FROM raw),
wm AS (SELECT max(ts) - INTERVAL '30 minutes' AS w FROM e)
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM e, wm
WHERE date_trunc('hour', ts) + INTERVAL '1 hour' <= w
GROUP BY 1, 2
""",
)
def q37_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming run: watermarked tumbling windows over
    a deterministic event file driven availableNow — append mode emits
    only watermark-finalized windows (the oracle mirrors the cutoff as
    a batch GROUP BY + max-ts filter)."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import read_event_stream, windowed_counts

    src = Path(tempfile.mkdtemp(prefix="q37_stream_"))
    lines = []
    for i in range(200):
        # hours 0..4; the hour-4 tail holds the watermark open so hours
        # 0..2 finalize (watermark = max_ts - 30min)
        h, m = divmod(i, 50)
        lines.append(
            f'{{"event_id": {i}, "ts": "2024-01-01 0{h}:{m % 60:02d}:00", '
            f'"user_id": {i % 7}, "event_type": "t{i % 3}", "value": {i % 5}.0}}'
        )
    (src / "events.jsonl").write_text("\n".join(lines) + "\n")
    name = "q37_stream_" + uuid.uuid4().hex[:8]
    q = (
        windowed_counts(read_event_stream(spark, str(src)), "1 hour", "30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT CAST(window_start AS STRING) AS window_start, event_type, cnt, "
        f"total_value FROM {name}"
    )


@register(
    "q38_stream_dedup",
    tags=("events", "streaming", "watermark", "dedup"),
    # Deterministic fixture, single file → single microbatch, so every
    # duplicate arrives while its key's state is live: the surviving
    # row per event_id is the first occurrence = min-ts row. The oracle
    # regenerates the 120 events and takes row_number()=1 per key.
    oracle="""
WITH raw AS (SELECT unnest(generate_series(0, 119)) AS i),
e AS (SELECT i, CAST(i % 60 AS BIGINT) AS event_id,
             TIMESTAMP '2024-01-01 00:00:00'
             + (i // 40) * INTERVAL '1 hour'
             + (i % 40) * INTERVAL '1 minute' AS ts,
             CAST(i % 5 AS BIGINT) AS user_id,
             't' || CAST(i % 2 AS VARCHAR) AS event_type
      FROM raw)
SELECT event_id, CAST(ts AS VARCHAR) AS ts, user_id, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY i) AS rn FROM e)
WHERE rn = 1
ORDER BY event_id, ts
""",
)
def q38_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming run: watermark-bounded streaming dedup
    — duplicate event_ids injected inside the horizon are dropped,
    state for expired keys is reclaimed (dropDuplicatesWithinWatermark,
    not dropDuplicates: a key subset without the event-time column
    would otherwise grow state forever)."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import read_event_stream, streaming_dedup

    src = Path(tempfile.mkdtemp(prefix="q38_stream_"))
    lines = []
    for i in range(120):
        h, m = divmod(i, 40)
        lines.append(
            f'{{"event_id": {i % 60}, "ts": "2024-01-01 0{h}:{m % 60:02d}:00", '
            f'"user_id": {i % 5}, "event_type": "t{i % 2}", "value": 1.0}}'
        )
    (src / "events.jsonl").write_text("\n".join(lines) + "\n")
    name = "q38_stream_" + uuid.uuid4().hex[:8]
    q = (
        streaming_dedup(read_event_stream(spark, str(src)), watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT event_id, CAST(ts AS STRING) AS ts, user_id, event_type "
        f"FROM {name} ORDER BY event_id, ts"
    )


@register(
    "q39_stream_late_data",
    tags=("events", "streaming", "watermark", "late-data"),
    # Three deterministic microbatches (maxFilesPerTrigger=1,
    # mtime-ordered files). Spark's late-input filter uses the
    # watermark recorded at batch PLANNING time (one batch stale), so
    # the fixture puts the stragglers TWO batches after their window
    # closed: batch 1 (hours 0-1 + an 02:1x tail) advances the
    # watermark to 01:49, which finalizes+evicts the hour-0 window at
    # the end of batch 2; batch 3's hour-0 stragglers then hit evicted
    # state and are DROPPED (their window end 01:00 is below even the
    # stale watermark), while its hour-1 stragglers (window end 02:00,
    # still live) are counted. The final watermark (03:04-30min=02:34)
    # finalizes hours 0 and 1 only. The oracle regenerates the batches
    # and applies exactly those rules.
    oracle="""
WITH b1 AS (SELECT CASE WHEN i < 80 THEN TIMESTAMP '2024-01-01 00:00:00'
                        + (i // 40) * INTERVAL '1 hour' + (i % 40) * INTERVAL '1 minute'
                   ELSE TIMESTAMP '2024-01-01 02:10:00' + (i - 80) * INTERVAL '1 minute' END AS ts,
                   't' || CAST(i % 3 AS VARCHAR) AS event_type,
                   CAST(i % 5 AS DOUBLE) AS value
            FROM (SELECT unnest(generate_series(0, 89)) AS i)),
b2 AS (SELECT TIMESTAMP '2024-01-01 02:20:00' + j * INTERVAL '1 minute' AS ts,
              't' || CAST(j % 3 AS VARCHAR) AS event_type,
              CAST(j % 5 AS DOUBLE) AS value
       FROM (SELECT unnest(generate_series(0, 9)) AS j)),
b3 AS (SELECT CASE WHEN k < 5 THEN TIMESTAMP '2024-01-01 00:50:00' + k * INTERVAL '1 minute'
                   WHEN k < 10 THEN TIMESTAMP '2024-01-01 01:50:00' + (k - 5) * INTERVAL '1 minute'
                   ELSE TIMESTAMP '2024-01-01 03:00:00' + (k - 10) * INTERVAL '1 minute' END AS ts,
              't' || CAST(k % 3 AS VARCHAR) AS event_type,
              CAST(k % 5 AS DOUBLE) AS value
       FROM (SELECT unnest(generate_series(0, 14)) AS k)),
wm1 AS (SELECT max(ts) - INTERVAL '30 minutes' AS w FROM b1),
surviving AS (
  SELECT * FROM b1
  UNION ALL SELECT * FROM b2
  UNION ALL
  SELECT b3.* FROM b3, wm1
  WHERE date_trunc('hour', b3.ts) + INTERVAL '1 hour' > wm1.w),
wmf AS (SELECT max(ts) - INTERVAL '30 minutes' AS w
        FROM (SELECT ts FROM b1 UNION ALL SELECT ts FROM b2 UNION ALL SELECT ts FROM b3))
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM surviving, wmf
WHERE date_trunc('hour', ts) + INTERVAL '1 hour' <= wmf.w
GROUP BY 1, 2
""",
)
def q39_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real three-microbatch Structured Streaming run: stragglers for a
    window the watermark already finalized are dropped (and surface in
    numRowsDroppedByWatermark), stragglers for a still-open window are
    counted — the late-data semantics a single-batch run cannot show."""
    import os
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import read_event_stream, windowed_counts

    src = Path(tempfile.mkdtemp(prefix="q39_stream_"))
    b1 = []
    for i in range(90):
        if i < 80:
            h, m = divmod(i, 40)
        else:
            h, m = 2, 10 + (i - 80)
        b1.append(
            f'{{"event_id": {i}, "ts": "2024-01-01 0{h}:{m:02d}:00", '
            f'"user_id": {i % 7}, "event_type": "t{i % 3}", "value": {i % 5}.0}}'
        )
    b2 = [
        f'{{"event_id": {100 + j}, "ts": "2024-01-01 02:{20 + j}:00", '
        f'"user_id": {j % 7}, "event_type": "t{j % 3}", "value": {j % 5}.0}}'
        for j in range(10)
    ]
    b3 = []
    for k in range(15):
        if k < 5:
            h, m = 0, 50 + k
        elif k < 10:
            h, m = 1, 50 + (k - 5)
        else:
            h, m = 3, k - 10
        b3.append(
            f'{{"event_id": {1000 + k}, "ts": "2024-01-01 0{h}:{m:02d}:00", '
            f'"user_id": {k % 7}, "event_type": "t{k % 3}", "value": {k % 5}.0}}'
        )
    f1, f2, f3 = src / "a_b1.jsonl", src / "b_b2.jsonl", src / "c_b3.jsonl"
    f1.write_text("\n".join(b1) + "\n")
    f2.write_text("\n".join(b2) + "\n")
    f3.write_text("\n".join(b3) + "\n")
    # file source processes oldest-mtime first: pin the order explicitly
    os.utime(f1, (1_700_000_000, 1_700_000_000))
    os.utime(f2, (1_700_000_100, 1_700_000_100))
    os.utime(f3, (1_700_000_200, 1_700_000_200))
    name = "q39_stream_" + uuid.uuid4().hex[:8]
    q = (
        windowed_counts(
            read_event_stream(spark, str(src), max_files_per_trigger=1),
            "1 hour",
            "30 minutes",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT CAST(window_start AS STRING) AS window_start, event_type, cnt, "
        f"total_value FROM {name}"
    )


@register(
    "q70_stream_interval_join",
    tags=("events", "streaming", "join", "watermark"),
    # Deterministic two-stream fixture: impression i at minute i (user
    # i % 5, value i % 7); click i at minute i + (i % 15) for the same
    # user. A click joins every impression of its user that precedes it
    # by at most 10 minutes. Single availableNow batch -> all matches
    # emit; the oracle regenerates both streams and applies the same
    # interval condition.
    oracle="""
WITH i AS (SELECT unnest(generate_series(0, 99)) AS n),
imp AS (SELECT n AS imp_id,
               TIMESTAMP '2024-01-01 00:00:00' + n * INTERVAL '1 minute' AS ts,
               CAST(n % 5 AS BIGINT) AS user_id
        FROM i),
clk AS (SELECT 1000 + n AS click_id,
               TIMESTAMP '2024-01-01 00:00:00'
               + (n + (n % 15)) * INTERVAL '1 minute' AS ts,
               CAST(n % 5 AS BIGINT) AS user_id
        FROM i)
SELECT imp.imp_id, clk.click_id, imp.user_id,
       CAST((epoch(clk.ts) - epoch(imp.ts)) / 60 AS BIGINT) AS delta_min
FROM imp JOIN clk
  ON imp.user_id = clk.user_id
 AND clk.ts >= imp.ts
 AND clk.ts <= imp.ts + INTERVAL '10 minutes'
""",
)
def q70_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real stream-stream inner join run: two watermarked file streams
    joined on user within a 10-minute event-time interval (state
    bounded by watermark + horizon — the attribution-join operator);
    driven availableNow into a memory sink."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import interval_join

    base = Path(tempfile.mkdtemp(prefix="q70_stream_"))
    imp_dir, clk_dir = base / "imp", base / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    imps, clks = [], []
    for n in range(100):
        h, m = divmod(n, 60)
        imps.append(
            f'{{"imp_id": {n}, "ts": "2024-01-01 0{h}:{m:02d}:00", "user_id": {n % 5}}}'
        )
        cm = n + (n % 15)
        ch, cmm = divmod(cm, 60)
        clks.append(
            f'{{"click_id": {1000 + n}, "ts": "2024-01-01 0{ch}:{cmm:02d}:00", '
            f'"user_id": {n % 5}}}'
        )
    (imp_dir / "imp.jsonl").write_text("\n".join(imps) + "\n")
    (clk_dir / "clk.jsonl").write_text("\n".join(clks) + "\n")
    left = spark.readStream.schema("imp_id long, ts timestamp, user_id long").json(
        str(imp_dir)
    )
    right = spark.readStream.schema(
        "click_id long, ts timestamp, user_id long"
    ).json(str(clk_dir))
    joined = interval_join(left, right, horizon="10 minutes").select(
        F.col("imp_id"),
        F.col("click_id"),
        F.col("l.user_id").alias("user_id"),
        ((F.col("r.ts").cast("long") - F.col("l.ts").cast("long")) / 60)
        .cast("long")
        .alias("delta_min"),
    )
    name = "q70_stream_" + uuid.uuid4().hex[:8]
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    return spark.sql(
        f"SELECT imp_id, click_id, user_id, delta_min FROM {name}"
    )


@register(
    "q75_events_anomaly",
    tags=("events", "anomaly", "timeseries"),
    # z-scores from explicit integer sums (s1, s2, n are exact BIGINTs;
    # the float expression is written identically on both engines) so
    # rounding never hits an engine-specific stddev algorithm.
    oracle="""
WITH hourly AS (
  SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS s1,
         CAST(sum(cnt * cnt) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS n
  FROM hourly GROUP BY event_type)
SELECT h.event_type, hour_start, cnt,
       floor(((cnt - s1 / n::DOUBLE)
             / sqrt(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE))) * 10000 + 0.5) / 10000.0 AS z,
       abs((cnt - s1 / n::DOUBLE)
           / sqrt(s2 / n::DOUBLE - (s1 / n::DOUBLE) * (s1 / n::DOUBLE))) > 2 AS is_anomaly
FROM hourly h JOIN stats s ON h.event_type = s.event_type
""",
)
def q75_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-count anomaly detection per event type: population
    z-score of each hour's count against the type's mean/stddev,
    computed from exact integer sums (one tiny per-type stats
    aggregate broadcast back over the hourly table). The monitoring /
    alerting primitive; both aggregates are map-side partial, no
    window over the event stream."""
    e = _events(spark, sf_dir)
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").cast("long").alias("hour_start"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s1") / F.col("n").cast("double")
    std = F.sqrt(F.col("s2") / F.col("n").cast("double") - mean * mean)
    z = (F.col("cnt") - mean) / std
    return hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour_start",
        "cnt",
        fround(z, 4).alias("z"),
        (F.abs(z) > 2).alias("is_anomaly"),
    )


@register(
    "q76_events_transitions",
    tags=("events", "sequence", "path"),
    oracle="""
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
""",
)
def q76_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User path analysis: counts of consecutive event-type transitions
    per user (the Markov-chain / sankey primitive). ONE window over the
    user key (tie-broken on event_id for determinism) then a tiny
    (type, type)-keyed aggregate — the sort is per-user-partition,
    never global."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q73_stream_session",
    tags=("events", "streaming", "window", "session", "watermark"),
    # Deterministic fixture: per user u (0..2), 40 events in clusters of
    # 5 consecutive minutes starting every 20 minutes (intra-cluster gap
    # 1 min < 5-min session gap; inter-cluster gap 16 min > gap), plus a
    # tail event at minute 200. Single availableNow batch: the final
    # watermark is max_ts - 30 min = minute 170; append mode emits a
    # session iff its END (last event + 5 min) <= watermark — all 8
    # clusters per user qualify (last ends minute 149), the 3 tail
    # singletons (end 205) stay open. The oracle regenerates the events,
    # runs the same gaps-and-islands sessionization, and applies the
    # same cutoff.
    oracle="""
WITH raw AS (SELECT unnest(generate_series(0, 119)) AS i),
e AS (SELECT CAST(i % 3 AS BIGINT) AS user_id,
             TIMESTAMP '2024-01-01 00:00:00'
             + (((i // 3) // 5) * 20 + ((i // 3) % 5)) * INTERVAL '1 minute' AS ts,
             CAST(i % 7 AS DOUBLE) AS value
      FROM raw
      UNION ALL
      SELECT CAST(u AS BIGINT), TIMESTAMP '2024-01-01 03:20:00', 1.0
      FROM (SELECT unnest(generate_series(0, 2)) AS u)),
wm AS (SELECT max(ts) - INTERVAL '30 minutes' AS w FROM e),
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts) >= 300
              THEN 1 ELSE 0 END AS new_session
  FROM e),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT CAST(min(ts) AS VARCHAR) AS session_start,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS session_value
FROM numbered, wm
GROUP BY user_id, sid, w
HAVING max(ts) + INTERVAL '5 minutes' <= w
""",
)
def q73_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming session-window run: per-user 5-minute
    inactivity-gap sessions under a 30-minute watermark, driven
    availableNow into a memory sink — append mode emits only sessions
    the watermark has closed (state for merged windows is evicted on
    emission). The streaming face of the q32 batch operator."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import read_event_stream, sessionized

    src = Path(tempfile.mkdtemp(prefix="q73_stream_"))
    lines = []
    eid = 0
    for u in range(3):
        for k in range(40):
            m = (k // 5) * 20 + (k % 5)
            h, mm = divmod(m, 60)
            lines.append(
                f'{{"event_id": {eid}, "ts": "2024-01-01 {h:02d}:{mm:02d}:00", '
                f'"user_id": {u}, "event_type": "t{k % 2}", "value": {(u + 3 * k) % 7}.0}}'
            )
            eid += 1
    for u in range(3):
        lines.append(
            f'{{"event_id": {eid}, "ts": "2024-01-01 03:20:00", '
            f'"user_id": {u}, "event_type": "t0", "value": 1.0}}'
        )
        eid += 1
    (src / "events.jsonl").write_text("\n".join(lines) + "\n")
    name = "q73_stream_" + uuid.uuid4().hex[:8]
    q = (
        sessionized(read_event_stream(spark, str(src)), gap="5 minutes", watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT CAST(session_start AS STRING) AS session_start, user_id, "
        f"n_events, session_value FROM {name}"
    )


@register(
    "q74_stream_stateful",
    tags=("events", "streaming", "stateful", "cdc"),
    # Two-microbatch run (maxFilesPerTrigger=1): 60 wire Add events
    # across 2 tables, 1 + i%3 rows each, split 0-29 / 30-59. The
    # stateful operator emits one updated row per key per batch; the
    # final state per key (row with the max n_events) must equal the
    # batch totals the oracle computes directly.
    oracle="""
WITH raw AS (SELECT unnest(generate_series(0, 59)) AS i)
SELECT 'cdcdb' AS db,
       't' || CAST(i % 2 AS VARCHAR) AS "table",
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(1 + i % 3) AS BIGINT) AS n_rows,
       CAST(max(i) AS BIGINT) AS max_sequence
FROM raw GROUP BY 1, 2
""",
)
def q74_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real arbitrary-stateful streaming run (applyInPandasWithState):
    per-(db, table) running CDC stats accumulated ACROSS two
    microbatches in the checkpointed state store — the custom-operator
    path for semantics windows can't express (reference analog:
    producer bookkeeping, fluvio_manager.rs:43-52). The final per-key
    state must equal the direct batch totals."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..codec import parse_events
    from ..streaming.stateful import table_stats_stream

    src = Path(tempfile.mkdtemp(prefix="q74_stream_"))
    batches: list[list[str]] = [[], []]
    for i in range(60):
        rows = ",".join(
            f'{{"cols":[{{"SignedInteger":{i * 10 + r}}}]}}' for r in range(1 + i % 3)
        )
        batches[i // 30].append(
            f'{{"uri":"flv://mysql-srv1/cdcdb/t{i % 2}","sequence":{i},'
            f'"bn_file":{{"fileName":"binlog.000001","offset":{i}}},'
            f'"columns":["c0"],"operation":{{"Add":{{"rows":[{rows}]}}}}}}'
        )
    import os

    f0, f1 = src / "a_b0.jsonl", src / "b_b1.jsonl"
    f0.write_text("\n".join(batches[0]) + "\n")
    f1.write_text("\n".join(batches[1]) + "\n")
    os.utime(f0, (1_700_000_000, 1_700_000_000))
    os.utime(f1, (1_700_000_100, 1_700_000_100))
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    stats = table_stats_stream(parse_events(raw))
    name = "q74_stream_" + uuid.uuid4().hex[:8]
    q = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # the memory sink holds the materialized rows; the source dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    # update mode emits one row per key per microbatch; the final state
    # per key is the row with the largest (monotone) n_events.
    return spark.sql(
        f"SELECT db, `table`, n_events, n_rows, max_sequence FROM ("
        f"  SELECT *, row_number() OVER (PARTITION BY db, `table` "
        f"    ORDER BY n_events DESC) AS rn FROM {name}) WHERE rn = 1"
    )


@register(
    "q71_events_funnel",
    tags=("events", "funnel"),
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS v0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(ts) AS c1 FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts >= v0 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(ts) AS p2 FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts >= c1 GROUP BY e.user_id)
SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM v
UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
""",
)
def q71_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase): each stage
    is a user-keyed min-timestamp aggregate over the previous stage's
    survivors — three reusable user_id-keyed shuffles and tiny count
    aggregates, never a per-user event-sequence sort. The standard
    product-analytics operator (sequence matching over event streams).
    """
    e = _events(spark, sf_dir)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v0"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p2"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("stage"), F.count(F.lit(1)).alias("users")
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
    )


@register(
    "q72_events_cohort",
    tags=("events", "cohort", "retention"),
    oracle="""
WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
           FROM events GROUP BY user_id)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort, date_trunc('day', e.ts)) AS BIGINT) AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
""",
)
def q72_events_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity day,
    distinct actives per (cohort, day-offset) cell. One user-keyed
    first-touch aggregate, a user-keyed join back (AQE broadcasts the
    per-user table when small), one (cohort, offset)-keyed distinct
    aggregate — linear, no windows. Cohort days emit as strings (never
    raw timestamps)."""
    e = _events(spark, sf_dir)
    f = e.groupBy("user_id").agg(F.min(F.date_trunc("day", "ts")).alias("cohort"))
    return (
        e.join(f, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
    )


@register(
    "q77_ts_similarity",
    tags=("events", "timeseries", "similarity", "topk"),
    oracle="""
WITH s AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         sum(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2),
norms AS (SELECT user_id, CAST(sum(v * v) AS BIGINT) AS s2 FROM s GROUP BY user_id),
probes AS (SELECT user_id AS q FROM norms WHERE user_id < 5),
cross_t AS (
  SELECT a.user_id AS q, b.user_id AS u, CAST(sum(a.v * b.v) AS BIGINT) AS cx
  FROM s a JOIN s b USING (h)
  WHERE a.user_id < 5 AND b.user_id <> a.user_id
  GROUP BY 1, 2),
d AS (
  SELECT p.q, n.user_id AS u,
         CAST(nq.s2 + n.s2 - 2 * coalesce(c.cx, 0) AS BIGINT) AS d2_cents
  FROM probes p
  JOIN norms nq ON nq.user_id = p.q
  CROSS JOIN norms n
  LEFT JOIN cross_t c ON c.q = p.q AND c.u = n.user_id
  WHERE n.user_id <> p.q)
SELECT q AS probe_user, u AS user_id, d2_cents, rank FROM (
  SELECT q, u, d2_cents,
         row_number() OVER (PARTITION BY q ORDER BY d2_cents, u) AS rank
  FROM d)
WHERE rank <= 5
""",
)
def q77_ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search over per-user hourly activity
    series: top-5 nearest users (squared Euclidean over the hourly
    value series, zeros at missing hours) for each probe user
    (user_id < 5). The EDBT'19 streaming-similarity shape, done the
    sparse way: series never densify — ||a-b||² = Σa² + Σb² - 2a·b
    with the cross term from an hour-keyed equi-join against the
    bounded probe set (linear in probe activity, never users²·hours).
    Hourly values are exact integer cents, so every distance is exact
    BIGINT arithmetic — no float rounding anywhere."""
    e = _events(spark, sf_dir)
    s = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
    norms = s.groupBy("user_id").agg(F.sum(F.col("v") * F.col("v")).alias("s2"))
    probes_s = s.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("q"), "h", F.col("v").alias("qv")
    )
    cross_t = (
        s.join(F.broadcast(probes_s), "h")
        .filter(F.col("user_id") != F.col("q"))
        .groupBy("q", "user_id")
        .agg(F.sum(F.col("v") * F.col("qv")).alias("cx"))
    )
    qn = norms.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("q"), F.col("s2").alias("q_s2")
    )
    d = (
        norms.crossJoin(F.broadcast(qn))
        .filter(F.col("user_id") != F.col("q"))
        .join(cross_t, ["q", "user_id"], "left")
        .select(
            "q",
            "user_id",
            (
                F.col("q_s2") + F.col("s2") - 2 * F.coalesce("cx", F.lit(0))
            ).alias("d2_cents"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.asc("d2_cents"), F.asc("user_id"))
    return (
        d.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("q").alias("probe_user"), "user_id", "d2_cents", "rank"
        )
    )


@register(
    "q78_trajectory_similarity",
    tags=("events", "trajectory", "similarity", "topk"),
    oracle="""
WITH t AS (
  SELECT user_id,
         substr(string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id), 1, 50) AS traj
  FROM events GROUP BY user_id),
probes AS (SELECT user_id AS q, traj AS qtraj FROM t WHERE user_id < 5),
d AS (
  SELECT p.q, t.user_id AS u, levenshtein(p.qtraj, t.traj) AS edit_dist
  FROM probes p CROSS JOIN t
  WHERE t.user_id <> p.q)
SELECT q AS probe_user, u AS user_id, edit_dist, rank FROM (
  SELECT q, u, edit_dist,
         row_number() OVER (PARTITION BY q ORDER BY edit_dist, u) AS rank
  FROM d)
WHERE rank <= 5
""",
)
def q78_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity search (the REPOSE/ICDE'21 problem shape
    on behavioral trajectories): each user's path is the ordered
    sequence of event-type initials (first 50 steps); top-5 nearest
    users per probe (user_id < 5) by edit distance. One user-keyed
    aggregate builds trajectories; the probe set broadcasts, so the
    distance pass is linear in users, and levenshtein runs JVM-side
    over ≤50-char strings — per-pair cost is bounded by construction."""
    e = _events(spark, sf_dir)
    t = (
        e.select("user_id", F.struct("ts", "event_id").alias("o"),
                 F.substring("event_type", 1, 1).alias("c"))
        .groupBy("user_id")
        .agg(
            F.substring(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("o", "c"))),
                        lambda s: s["c"],
                    ),
                    "",
                ),
                1,
                50,
            ).alias("traj")
        )
    )
    probes = t.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("q"), F.col("traj").alias("qtraj")
    )
    d = (
        t.crossJoin(F.broadcast(probes))
        .filter(F.col("user_id") != F.col("q"))
        .select(
            "q",
            "user_id",
            F.levenshtein("qtraj", "traj").cast("long").alias("edit_dist"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.asc("edit_dist"), F.asc("user_id"))
    return (
        d.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select(F.col("q").alias("probe_user"), "user_id", "edit_dist", "rank")
    )


@register(
    "q97_rolling_distinct",
    tags=("events", "window", "distinct", "rolling"),
    oracle="""
-- Trailing-7-day distinct users per observed day. COUNT(DISTINCT) over
-- a sliding window has no streaming-agg form; the scalable shape is
-- contribution fan-out: each (user, day) pair contributes to the 7
-- target days it is visible in, then one exact distinct-agg per day.
WITH ud AS (
  SELECT DISTINCT
         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day_num,
         user_id
  FROM events),
days AS (SELECT DISTINCT day_num FROM ud),
contrib AS (SELECT user_id, day_num + r.range AS tday FROM ud, range(7) r),
w7 AS (
  SELECT d.day_num, CAST(count(DISTINCT c.user_id) AS BIGINT) AS users_7d
  FROM days d JOIN contrib c ON c.tday = d.day_num
  GROUP BY d.day_num),
w1 AS (
  SELECT day_num, CAST(count(DISTINCT user_id) AS BIGINT) AS users_1d
  FROM ud GROUP BY day_num)
SELECT CAST(w7.day_num * 86400 AS BIGINT) AS day_start, w1.users_1d, w7.users_7d
FROM w7 JOIN w1 ON w1.day_num = w7.day_num
""",
)
def q97_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window COUNT DISTINCT — the retention/active-users query
    (trailing-7-day distinct users per day) that naive plans turn into
    a per-day range self-join over raw events. Scale shape here:
    (1) reduce raw events to DISTINCT (user, day) pairs first (one
    exact-distinct shuffle, linear); (2) fan each pair out to the <= 7
    trailing days it remains visible in (explode of a 7-element
    sequence — linear x7, NO inequality join, so no BNL/cartesian);
    (3) one distinct-agg per target day, inner-joined to observed days
    to discard fan-out past the horizon. Day arithmetic is pure
    integer (epoch DIV 86400) — no timestamps emitted."""
    e = _events(spark, sf_dir)
    ud = e.select(
        F.date_trunc("day", "ts").cast("long").alias("day_sec"), "user_id"
    ).select(
        # exact integer FLOOR-div (DuckDB `//` floors; Spark DIV
        # truncates toward zero — they'd diverge on pre-1970 epochs,
        # and date_trunc already makes day_sec an exact multiple of
        # 86400, but the correction keeps the semantics identical for
        # ANY input instead of relying on that): subtract 1 when the
        # truncating DIV had a negative remainder. The double `/` then
        # cast is avoided — it could round across an integer boundary
        # at large epochs.
        F.expr(
            "day_sec DIV 86400 - CASE WHEN day_sec % 86400 < 0 THEN 1 ELSE 0 END"
        ).alias("day_num"),
        "user_id",
    ).distinct()
    days = ud.select("day_num").distinct()
    contrib = (
        ud.select("user_id", "day_num", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"))
        .select("user_id", (F.col("day_num") + F.col("i")).alias("tday"))
    )
    w7 = (
        days.join(contrib, days.day_num == contrib.tday)
        .groupBy("day_num")
        .agg(F.countDistinct("user_id").cast("long").alias("users_7d"))
    )
    w1 = ud.groupBy("day_num").agg(
        F.countDistinct("user_id").cast("long").alias("users_1d")
    )
    return (
        w7.join(w1, "day_num")
        .select(
            (F.col("day_num") * 86400).cast("long").alias("day_start"),
            "users_1d",
            "users_7d",
        )
    )


@register(
    "q99_stream_outer_join",
    tags=("events", "streaming", "join", "watermark", "outer"),
    # Same deterministic two-stream fixture as q70 plus the NEGATIVE
    # space: impressions with no click inside the horizon emit with
    # NULL click once the watermark passes l.ts + horizon. Two flush
    # files (minutes 600 / 1200, sentinel users >= 9000) drive the
    # watermark forward across microbatches so every REAL impression's
    # outer verdict is decided before the stream drains; the sentinels
    # themselves are filtered from the output so the result is
    # identical whether or not the engine runs a final no-data batch.
    oracle="""
WITH i AS (SELECT unnest(generate_series(0, 99)) AS n),
imp AS (SELECT n AS imp_id,
               TIMESTAMP '2024-01-01 00:00:00' + n * INTERVAL '1 minute' AS ts,
               CAST(n % 5 AS BIGINT) AS user_id
        FROM i),
clk AS (SELECT 1000 + n AS click_id,
               TIMESTAMP '2024-01-01 00:00:00'
               + (n + (n % 15)) * INTERVAL '1 minute' AS ts,
               CAST(n % 5 AS BIGINT) AS user_id
        FROM i)
SELECT imp.imp_id, clk.click_id, imp.user_id,
       CAST((epoch(clk.ts) - epoch(imp.ts)) / 60 AS BIGINT) AS delta_min
FROM imp LEFT JOIN clk
  ON imp.user_id = clk.user_id
 AND clk.ts >= imp.ts
 AND clk.ts <= imp.ts + INTERVAL '10 minutes'
""",
)
def q99_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real stream-stream LEFT OUTER interval join: q70's attribution
    join plus its negative space — un-clicked impressions emit with
    NULL click columns when the watermark passes their horizon (state
    EVICTION produces rows here, not just frees memory; outer results
    surface on later microbatches, never at end-of-input). Flush
    events on both streams advance the min-of-sources watermark so
    every real impression is decided in-stream; driven availableNow
    across two DATA microbatches so eviction demonstrably crosses a
    microbatch boundary (batch 1 admits the base events plus the
    first flush file; batch 2's flush file evicts and emits every
    real impression's verdict under the batch-1 watermark).

    Microbatch budget (r14, VERDICT item 3): the wall here is
    microbatch count x per-batch floor (source listing + JSON scan +
    four state-store commits per partition for the stream-stream
    join + driver re-planning, per batch), so the fixture runs the
    MINIMUM batches the semantics need — maxFilesPerTrigger=2 and
    no-data microbatches OFF for the stream's lifetime (restored in
    finally; the only rows a trailing no-data batch could still emit
    are the filtered sentinels, and the oracle gate pins the output
    identical). Measured r14: 4 batches -> 2, 4.09 -> 2.27 s min
    (-45%). State partitioning derived from the stream (README
    finding #18, shared helper, env-overridable; resolves to 4 here —
    r12 measured 12.6 -> 3.7 s vs 32-way). The join/watermark
    semantics under test are partition-count independent."""
    import os
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import interval_join

    base = Path(tempfile.mkdtemp(prefix="q99_stream_"))
    imp_dir, clk_dir = base / "imp", base / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    imps, clks = [], []
    for n in range(100):
        h, m = divmod(n, 60)
        imps.append(
            f'{{"imp_id": {n}, "ts": "2024-01-01 {h:02d}:{m:02d}:00", '
            f'"user_id": {n % 5}}}'
        )
        cm = n + (n % 15)
        ch, cmm = divmod(cm, 60)
        clks.append(
            f'{{"click_id": {1000 + n}, "ts": "2024-01-01 {ch:02d}:{cmm:02d}:00", '
            f'"user_id": {n % 5}}}'
        )
    files = []
    for d, name, lines in ((imp_dir, "f1.jsonl", imps), (clk_dir, "f1.jsonl", clks)):
        p = d / name
        p.write_text("\n".join(lines) + "\n")
        files.append((p, 1_700_000_000))
    for k, minute in ((2, 600), (3, 1200)):
        h, m = divmod(minute, 60)
        pi = imp_dir / f"f{k}.jsonl"
        pi.write_text(
            f'{{"imp_id": {9000 + k}, "ts": "2024-01-01 {h:02d}:{m:02d}:00", '
            f'"user_id": {9000 + k}}}\n'
        )
        pc = clk_dir / f"f{k}.jsonl"
        pc.write_text(
            f'{{"click_id": {9900 + k}, "ts": "2024-01-01 {h:02d}:{m:02d}:00", '
            f'"user_id": {9500 + k}}}\n'
        )
        files += [(pi, 1_700_000_000 + 100 * k), (pc, 1_700_000_000 + 100 * k)]
    for p, ts in files:
        os.utime(p, (ts, ts))
    left = spark.readStream.schema("imp_id long, ts timestamp, user_id long").option(
        "maxFilesPerTrigger", 2
    ).json(str(imp_dir))
    right = spark.readStream.schema(
        "click_id long, ts timestamp, user_id long"
    ).option("maxFilesPerTrigger", 2).json(str(clk_dir))
    joined = interval_join(
        left, right, horizon="10 minutes", watermark="1 minute", how="leftOuter"
    ).select(
        F.col("imp_id"),
        F.col("click_id"),
        F.col("l.user_id").alias("user_id"),
        ((F.col("r.ts").cast("long") - F.col("l.ts").cast("long")) / 60)
        .cast("long")
        .alias("delta_min"),
    )
    name = "q99_stream_" + uuid.uuid4().hex[:8]
    # r14 (VERDICT item 6): state width derived from the stream's own
    # properties (~9 join-key users, ~100 wire events per admitted
    # file) by the shared helper instead of the fixture literal "4";
    # env-overridable. Same resolved width (4) locally.
    from ..streaming.state import stream_state_partitions

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(spark, approx_keys=9, approx_rows_per_batch=100)),
    )
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
        )
        # the memory sink holds the materialized rows; the fixture dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    return spark.sql(
        f"SELECT imp_id, click_id, user_id, delta_min FROM {name} "
        f"WHERE imp_id < 1000"
    )


@register(
    "q100_stream_chained_agg",
    tags=("events", "streaming", "watermark", "chained"),
    # Two CHAINED stateful aggregations in one streaming query
    # (SPARK-40925 multiple-stateful-operator support): per-window
    # per-user counts, then per-window user-distribution stats. The
    # deterministic fixture makes append-mode emission expressible as
    # batch SQL: both stages finalize on the same watermark boundary,
    # so the oracle is the two-level GROUP BY over windows whose end
    # <= max event time - 30 min.
    oracle="""
WITH raw AS (SELECT unnest(generate_series(0, 199)) AS i),
e AS (SELECT TIMESTAMP '2024-01-01 00:00:00'
             + (i // 50) * INTERVAL '1 hour'
             + (i % 50) * INTERVAL '1 minute' AS ts,
             CAST(i % 7 AS BIGINT) AS user_id,
             CAST(i % 5 AS DOUBLE) AS value
      FROM raw),
wm AS (SELECT max(ts) - INTERVAL '30 minutes' AS w FROM e),
lvl1 AS (
  SELECT date_trunc('hour', ts) AS ws, user_id,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM e, wm
  WHERE date_trunc('hour', ts) + INTERVAL '1 hour' <= w
  GROUP BY 1, 2)
SELECT CAST(ws AS VARCHAR) AS window_start,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cnt) AS BIGINT) AS total_events,
       max(cnt) AS max_user_events,
       CAST(sum(cents) AS BIGINT) / 100.0 AS total_value
FROM lvl1
GROUP BY ws
""",
)
def q100_stream_chained_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful streaming aggregations — the multi-stage
    streaming topology (SPARK-40925, Spark 3.4+): stage 1 aggregates
    per (1-hour window, user) counts/cents under a 30-min watermark;
    stage 2 re-aggregates the FINALIZED windows into per-window user
    distribution stats (n_users, total/max events, exact-cents total)
    — all inside ONE streaming query, no intermediate sink. Append
    mode emits a stage-2 row only when the shared watermark finalizes
    the window on both levels; the oracle is the equivalent batch
    two-level GROUP BY with the same max-ts - 30 min cutoff.

    100 TB shape: stage 1 state is (window, user) keyed and evicted on
    watermark; stage 2 state is per-window (|users| smaller). This is
    the pattern that replaces the classic 'stream -> kafka -> second
    job' hop at scale. State partitioning is set to 4 FOR THIS
    200-event FIXTURE (restored after the drain — README finding #18,
    same as q99: two chained stateful operators x 32 partitions x
    multiple microbatches is pure scheduling overhead at fixture
    size; measured 4.3 s -> ~1.4 s, identical output, oracle-pinned).
    Production sizes state partitions to stream volume."""
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import read_event_stream

    src = Path(tempfile.mkdtemp(prefix="q100_stream_"))
    lines = []
    for i in range(200):
        h, m = divmod(i, 50)
        lines.append(
            f'{{"event_id": {i}, "ts": "2024-01-01 0{h}:{m % 60:02d}:00", '
            f'"user_id": {i % 7}, "event_type": "t{i % 3}", "value": {i % 5}.0}}'
        )
    (src / "events.jsonl").write_text("\n".join(lines) + "\n")
    lvl1 = (
        read_event_stream(spark, str(src))
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents"),
        )
    )
    lvl2 = lvl1.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cnt").alias("total_events"),
        F.max("cnt").alias("max_user_events"),
        (F.sum("cents") / 100.0).alias("total_value"),
    )
    name = "q100_stream_" + uuid.uuid4().hex[:8]
    # r14 (VERDICT item 6): state width from the stream's properties
    # (~35 level-1 (window, user) keys, 200 wire events per batch)
    # via the shared helper instead of the fixture literal "4" —
    # resolves to 8 locally (measured flat vs 4; see
    # OPTIMIZATION_r14.md batch 3); env-overridable.
    from ..streaming.state import stream_state_partitions

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(spark, approx_keys=35, approx_rows_per_batch=200)),
    )
    try:
        q = (
            lvl2.select(
                F.col("w.start").cast("string").alias("window_start"),
                "n_users",
                "total_events",
                "max_user_events",
                "total_value",
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        # the memory sink holds the materialized rows; the fixture dir
        # can go as soon as the availableNow run drains (r12 VERDICT)
        import shutil

        shutil.rmtree(src, ignore_errors=True)
    return spark.sql(
        f"SELECT window_start, n_users, total_events, max_user_events, total_value "
        f"FROM {name}"
    )


@register(
    "q103_stream_static_enrich",
    tags=("events", "streaming", "join", "broadcast"),
    # Stream-static joins are stateless per microbatch, and the
    # complete-mode aggregate over the full finite replay equals the
    # batch GROUP BY — so the oracle is the plain join+aggregate.
    oracle="""
SELECT c.c_mktsegment AS mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
""",
)
def q103_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join — the dimension-lookup pattern
    every production stream runs (enrich each event with customer
    attributes, aggregate per segment): the events stream joins a
    STATIC broadcast dimension (no state, no watermark — stream-static
    joins are stateless per microbatch), then a complete-mode
    aggregate keyed by the enriched column. The llm streaming dedup
    uses the anti-join face of stream-static; this registers the
    enrichment face as a first-class gated query.

    100 TB shape: the dim side is broadcast once per microbatch (a
    real deployment caches it or re-broadcasts on a dim-refresh
    cadence); the stream side never shuffles before the join, and the
    aggregate is |segments| rows of state. Exact-cents quantization
    keeps the sum engine- and order-independent."""
    import uuid

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = stream.join(
        F.broadcast(dim), stream.user_id == dim.c_custkey
    )
    agg = enriched.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")) / 100.0).alias(
            "total_value"
        ),
    )
    name = "q103_enrich_" + uuid.uuid4().hex[:8]
    # State partitioning sized to the stream (README finding #18, the
    # q99/q100 pattern, restored in finally): the complete-mode
    # aggregate holds |segments| rows of state, so 32-way state stores
    # are pure task-scheduling overhead (measured r13-opt: 1.73 ->
    # 1.26 s at sf0.1 at 8 partitions, identical output — the oracle
    # gate pins it). r14 (VERDICT item 6): width derived from the
    # stream's key count (the 5 market segments) by the shared helper
    # instead of a fixture literal; env-overridable for cluster runs.
    # Same resolved width (8) locally; the enrichment semantics are
    # partition-count independent.
    from ..streaming.state import stream_state_partitions

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(spark, approx_keys=5)),
    )
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.sql(f"SELECT mktsegment, n_events, total_value FROM {name}")


@register(
    "q110_events_user_drift",
    tags=("events", "drift", "analytics"),
    oracle="""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM events),
g AS (
  SELECT user_id, event_type,
         CAST(count(CASE WHEN rn * 2 <= cnt THEN 1 END) AS BIGINT) AS c1,
         CAST(count(CASE WHEN rn * 2 > cnt THEN 1 END) AS BIGINT) AS c2
  FROM r GROUP BY user_id, event_type),
t AS (
  SELECT user_id, CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
  FROM g GROUP BY user_id)
SELECT g.user_id,
       CAST(t.n1 + t.n2 AS BIGINT) AS n_events,
       CAST((sum(abs(g.c1 * t.n2 - g.c2 * t.n1)) * 1000000) // (t.n1 * t.n2)
            AS BIGINT) AS drift_micro
FROM g JOIN t USING (user_id)
WHERE t.n1 >= 1 AND t.n2 >= 1
GROUP BY g.user_id, t.n1, t.n2
""",
)
def q110_events_user_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user BEHAVIORAL DRIFT — how much a user's event-type mix
    changed between the first and second half of their history (the
    churn-risk / account-takeover signal an events pipeline computes):
    L1 distance between the two halves' normalized type distributions,
    computed EXACTLY as integers — Σ|c1·n2 − c2·n1| is the common-
    denominator numerator, so drift_micro = (Σ|…|·10⁶) DIV (n1·n2)
    involves no floating point at all (0 = identical mix, 2·10⁶ =
    disjoint). The half split is rank-based (rn·2 ≤ cnt), deterministic
    under the (ts, event_id) total order. Single-event users have an
    empty second half and are filtered on both engines (mirrored
    n1/n2 ≥ 1 guards — the ANSI /0 rule).

    100 TB shape: one user-partitioned window (keyed, never global),
    two hash aggregates, one user-keyed join — all shuffles on
    user_id, reusable across the stages."""
    ensure_utc(spark)
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id")
    r = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    g = r.groupBy("user_id", "event_type").agg(
        F.count(F.when(F.col("rn") * 2 <= F.col("cnt"), 1)).alias("c1"),
        F.count(F.when(F.col("rn") * 2 > F.col("cnt"), 1)).alias("c2"),
    )
    t = g.groupBy("user_id").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    j = g.join(t, "user_id").where((F.col("n1") >= 1) & (F.col("n2") >= 1))
    return (
        j.groupBy("user_id", "n1", "n2")
        .agg(
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            ).alias("num")
        )
        .select(
            "user_id",
            (F.col("n1") + F.col("n2")).cast("long").alias("n_events"),
            F.expr("(num * 1000000) DIV (n1 * n2)").alias("drift_micro"),
        )
    )


def _partition_pruned_scan(spark: SparkSession, sf_dir: str):
    """Write events partitioned by event_type into a scratch directory,
    read back with a single-partition filter, and return
    (filtered_df, cleanup_fn). Shared by q113_partition_pruned_scan and
    the plan test that pins the scan as partition-PRUNED (only the
    event_type=click directory is ever listed/read)."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix="q113_part_")
    _events(spark, sf_dir).write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(d)
    back = spark.read.parquet(d).where(F.col("event_type") == "click")

    def cleanup() -> None:
        shutil.rmtree(d, ignore_errors=True)

    return back, cleanup


@register(
    "q113_partition_pruned_scan",
    tags=("events", "layout", "partitioning", "pruning"),
    oracle="""
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
WHERE event_type = 'click'
GROUP BY day
""",
)
def q113_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIVE-PARTITIONED WRITE + PARTITION-PRUNED READ — the other half
    of the physical-layout story next to q112's bucketing and q81's
    z-ordering: events are written partitioned by event_type (the
    directory-per-value layout every data lake uses for its hottest
    filter column), and the read-side predicate prunes to ONE
    directory before any file is opened — PartitionFilters in the
    scan, pinned by tests/test_plan_invariants.py via df.inputFiles()
    (every surviving file lives under event_type=click/). At 100 TB
    partition pruning is the first 10-100× win any query gets: the
    filter never reaches row-level evaluation because non-matching
    data is never LISTED. The oracle aggregates the same slice from
    the source parquet, so the write → partition → prune → read path
    is value-pinned end to end (a row landing in the wrong directory
    shows as a value/count diff, not just a plan diff).

    100 TB shape: one-time partitioned write (amortized, like q112's
    bucketed write), then scans touch only matching directories; the
    day aggregate is one map-side-combinable shuffle."""
    back, cleanup = _partition_pruned_scan(spark, sf_dir)
    try:
        return (
            back.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
                .cast("long")
                .alias("value_cents"),
            )
            .localCheckpoint()
        )
    finally:
        cleanup()


@register(
    "q114_schema_evolution",
    tags=("events", "layout", "schema-evolution"),
    oracle="""
SELECT CASE WHEN event_id % 2 = 1 THEN coalesce(event_type, '__missing__')
            ELSE '__missing__' END
         AS etype,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events
GROUP BY etype
""",
)
def q114_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA-EVOLUTION READ (mergeSchema) — the lake-format reality
    check: a dataset written in two generations, the second adding a
    column (event_type), read back as ONE table with
    ``mergeSchema=true`` — old-generation rows surface the new column
    as NULL, and the aggregate coalesces them into an explicit
    '__missing__' bucket. This is the semantics every long-lived
    100 TB dataset depends on (backfills and producers never upgrade
    atomically); the oracle recomputes the same generations
    arithmetically from the source table, so a reader that dropped
    old-generation rows, mis-aligned columns positionally, or
    defaulted the missing column to anything but NULL breaks the
    value hash.

    100 TB shape: schema merge is a FOOTER-level operation (Spark
    samples file footers; data pages are untouched), then one
    map-side-combinable aggregate. The two-generation write is
    scratch fixture setup, not the measured operator."""
    import shutil
    import tempfile

    ev = _events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="q114_evo_")
    try:
        (
            ev.where(F.col("event_id") % 2 == 0)
            .select("event_id", "value")
            .write.parquet(f"{d}/gen=1")
        )
        (
            ev.where(F.col("event_id") % 2 == 1)
            .select("event_id", "value", "event_type")
            .write.parquet(f"{d}/gen=2")
        )
        back = spark.read.option("mergeSchema", "true").parquet(d)
        return (
            back.groupBy(
                F.coalesce(F.col("event_type"), F.lit("__missing__")).alias(
                    "etype"
                )
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
                .cast("long")
                .alias("value_cents"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


@register(
    "q116_max_concurrency",
    tags=("events", "intervals", "sweep", "window"),
    oracle="""
WITH b AS (
  SELECT event_type, ts AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 300 SECOND, -1 FROM events),
r AS (
  SELECT event_type,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM b)
SELECT event_type, CAST(max(c) AS BIGINT) AS max_concurrent
FROM r GROUP BY event_type
""",
)
def q116_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX-CONCURRENCY INTERVAL SWEEP — each event opens a 5-minute
    visit; the answer is the peak number of simultaneously-open visits
    per event type (the capacity-planning statistic: peak concurrent
    sessions, peak open connections). Classic sweep line: +1/−1
    boundary stream, running sum, max. Ties order (t, d) so closings
    process before openings at a touching boundary — and the running
    MAX is invariant under any further tie permutation, so the result
    is deterministic under any partitioning.

    The ORACLE is the naive formulation — one global-order running
    sum per type — which is exactly the plan that DIES at 100 TB (a
    whale event type becomes one window partition holding its entire
    history). The Spark side is the scalable TWO-PHASE decomposition
    (the llm_sequence_pack prefix-sum pattern applied to a sweep):
    running sums within (type, hour-bucket) partitions — state
    bounded by events-per-hour, a deployment knob, not corpus size —
    then a per-type prefix sum over the BUCKET aggregate supplies
    each bucket's starting offset, and the peak is
    max(bucket_offset + within-bucket running max). Gating the
    decomposition against the naive sweep is the point of the
    oracle."""
    ev = _events(spark, sf_dir)
    starts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("d")
    )
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("t"),
        F.lit(-1).alias("d"),
    )
    b = starts.unionByName(ends).withColumn(
        "bucket",
        F.floor(F.col("t").cast("timestamp_ltz").cast("long") / 3600).cast("long"),
    )
    w_in = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = b.withColumn("rs", F.sum("d").over(w_in))
    per_bucket = run.groupBy("event_type", "bucket").agg(
        F.max("rs").alias("mx_rel"), F.sum("d").alias("bd")
    )
    w_b = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = per_bucket.withColumn(
        "off", F.coalesce(F.sum("bd").over(w_b), F.lit(0))
    )
    return off.groupBy("event_type").agg(
        F.max(F.col("off") + F.col("mx_rel")).cast("long").alias("max_concurrent")
    )


@register(
    "q117_time_weighted_avg",
    tags=("events", "twap", "intervals", "window"),
    oracle="""
WITH w AS (
  SELECT user_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nt
  FROM events),
iv AS (SELECT user_id, cents, nt - t AS dur FROM w WHERE nt IS NOT NULL)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(dur) AS BIGINT) AS total_dur_us,
       CAST(sum(cents * dur) AS BIGINT) AS vwsum,
       CAST((CAST(sum(cents * dur) AS BIGINT) * 100)
            // CAST(sum(dur) AS BIGINT) AS BIGINT) AS twap_centicents
FROM iv GROUP BY user_id
HAVING sum(dur) > 0
""",
)
def q117_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-WEIGHTED AVERAGE (TWAP) per user — each observation holds
    its value until the next one, so the average weights every value
    by how long it was in force (the finance/metering semantics that
    a plain AVG silently gets wrong whenever sampling is irregular).
    Durations are exact epoch-MICROSECOND BIGINTs (never truncated
    seconds), the weighted sum accumulates exact cent·µs integers,
    and the TWAP is one integer division at the end (emitted in
    hundredths of a cent: the ×100 head-room keeps cent·µs × scale
    inside BIGINT even for month-long gaps — ×10⁴ overflowed at
    sf0.001, caught by Spark's ANSI overflow check) — zero floating
    point. The lead() ordering tie-breaks on event_id, so two events
    sharing a timestamp assign the zero-length interval
    deterministically on both engines. Each user's last observation
    has no successor and is excluded (TWAP over the observed span);
    the HAVING > 0 guard mirrors Spark's ANSI division rule for the
    degenerate all-one-instant user.

    100 TB shape: one lead() window partitioned by user_id (state
    bounded per user — the q12 running-total class), then one
    map-side-combinable aggregate. Whale users are a skew concern,
    not a correctness one; AQE skew handling applies."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    base = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        t.alias("t"),
        "ts",
        "event_id",
    )
    iv = (
        base.withColumn("nt", F.lead("t").over(w))
        .where(F.col("nt").isNotNull())
        .select("user_id", "cents", (F.col("nt") - F.col("t")).alias("dur"))
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur").cast("long").alias("total_dur_us"),
            F.sum(F.col("cents") * F.col("dur")).cast("long").alias("vwsum"),
        )
        .where(F.col("total_dur_us") > 0)
        .select(
            "user_id",
            "n_intervals",
            "total_dur_us",
            "vwsum",
            F.expr("(vwsum * 100) DIV total_dur_us").alias("twap_centicents"),
        )
    )


@register(
    "q119_interval_coverage",
    tags=("events", "intervals", "sweep", "window"),
    oracle="""
WITH b AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t, 1 AS d FROM events
  UNION ALL
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) + 300, -1 FROM events),
r AS (
  SELECT event_type, t,
         sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, d) AS nt
  FROM b)
SELECT event_type,
       CAST(sum(CASE WHEN c > 0 AND nt IS NOT NULL THEN nt - t ELSE 0 END)
            AS BIGINT) AS covered_sec
FROM r GROUP BY event_type
""",
)
def q119_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-UNION COVERAGE — each event opens a 5-minute visit; the
    answer is the total number of seconds per event type during which
    AT LEAST ONE visit was open (the utilization/SLA statistic: "how
    long was the system busy", the companion of q116's "how busy did it
    peak"). Same sweep-line boundary stream (+1/-1), but the aggregate
    is the summed length of the count>0 segments, not the running max.
    All arithmetic is exact epoch-second BIGINTs; segment lengths
    between tied boundaries are zero, so any tie permutation yields the
    same sum on both engines.

    The ORACLE is the naive one-global-window-per-type sweep that dies
    on a whale event type at 100 TB. The Spark side is the scalable
    TWO-PHASE decomposition (q116's bucket pattern, extended because
    coverage — unlike max — needs the entry count c0 per row, not per
    bucket): running sums within (type, hour-bucket), a per-bucket
    boundary-sum prefix supplies each bucket's entry count c0, joined
    back (an O(types x hours) relation, AQE-broadcast at runtime), and
    each bucket contributes its interior covered gaps plus a head
    segment [bucket_start, first boundary) when c0 > 0 and a tail
    segment [last boundary, bucket_end) when c0 + bd > 0. A bucket
    with no boundaries at all is never covered: an open 300 s visit
    always closes inside the next hour bucket, so c0 > 0 implies a
    boundary in the bucket — the decomposition is exact, not
    approximate.

    100 TB shape: state per window partition is bounded by boundaries
    per (type, hour) — a deployment knob — and the cross-bucket pass
    runs over the bucket AGGREGATE (types x hours rows), never the
    events."""
    ev = _events(spark, sf_dir)
    t = F.col("ts").cast("timestamp_ltz").cast("long")
    return interval_coverage(
        ev.select("event_type", t.alias("t")), duration=300, bucket=3600
    )


@register(
    "q120_visit_spans",
    tags=("events", "intervals", "sessionize", "window"),
    oracle="""
WITH iv AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e
  FROM events),
m AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER wp IS NULL OR s > max(e) OVER wp
              THEN 1 ELSE 0 END AS ns
  FROM iv
  WINDOW wp AS (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
sp AS (
  SELECT user_id, s, e,
         sum(ns) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS g
  FROM m),
v AS (SELECT user_id, g, min(s) AS s, max(e) AS e
      FROM sp GROUP BY user_id, g)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_visits,
       CAST(sum(e - s) AS BIGINT) AS busy_sec,
       CAST(max(e - s) AS BIGINT) AS longest_sec,
       CAST(min(s) AS BIGINT) AS first_start,
       CAST(max(e) AS BIGINT) AS last_end
FROM v GROUP BY user_id
""",
)
def q120_visit_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGED VISIT SPANS per user — overlap-sessionization: each event
    opens a 5-minute visit; overlapping-or-touching visits merge into
    one span, and the per-user report is the span count, total busy
    seconds, longest span, and observed range. The per-user twin of
    q119's per-type coverage (which only needs the union LENGTH) and
    the overlap-based complement of q94/q32's GAP-based sessionization
    (sessions split on inactivity > threshold; spans split exactly
    when coverage drops to zero — the semantics differ whenever two
    events sit closer than the gap but their visit windows disjoint).
    Exercises operators/intervals.merge_intervals (llm_substring_trim's
    kernel) in the events domain: the spans are MATERIALIZED, then
    aggregated.

    All arithmetic is exact epoch-second BIGINTs (floor(epoch) on the
    oracle side per the repo sub-second rule); duplicate timestamps
    produce identical intervals whose tie order cannot change the
    running max, so both engines agree under any tie permutation.

    100 TB shape: one window pass partitioned by user_id (running-max
    state is O(1) per row; a whale user serializes into one task — the
    q117 lead()-window class: a skew concern handled by AQE/salting at
    deployment, not a correctness one; if only union LENGTH is needed
    at whale scale, q119's bucketed two-phase decomposition is the
    escape hatch), then one map-side-combinable per-user aggregate."""
    ev = _events(spark, sf_dir)
    t = F.col("ts").cast("timestamp_ltz").cast("long")
    iv = ev.select("user_id", t.alias("s")).select(
        "user_id", "s", (F.col("s") + 300).alias("e")
    )
    spans = merge_intervals(iv, ["user_id"])
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_visits"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("busy_sec"),
        F.max(F.col("e") - F.col("s")).cast("long").alias("longest_sec"),
        F.min("s").cast("long").alias("first_start"),
        F.max("e").cast("long").alias("last_end"),
    )


def interval_coverage(
    starts_df: DataFrame, duration: int, bucket: int
) -> DataFrame:
    """Two-phase interval-union coverage kernel over (event_type,
    t BIGINT seconds) start rows; each start opens [t, t+duration).
    Requires duration <= bucket (the q119 docstring's exactness
    argument — an open interval always produces a boundary in the next
    bucket, so a bucket with no boundaries is never covered). Unit
    tests pin boundary-aligned edge cases (tests/test_interval_ops.py);
    the q119 oracle gates it against the naive global sweep at all
    three SFs."""
    if duration > bucket:
        raise ValueError("interval_coverage requires duration <= bucket")
    starts = starts_df.select("event_type", "t", F.lit(1).alias("d"))
    ends = starts_df.select(
        "event_type", (F.col("t") + duration).alias("t"), F.lit(-1).alias("d")
    )
    b = starts.unionByName(ends).withColumn(
        "bucket", F.floor(F.col("t") / bucket).cast("long")
    )
    w_in = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_lead = Window.partitionBy("event_type", "bucket").orderBy("t", "d")
    rows = b.withColumn("rs", F.sum("d").over(w_in)).withColumn(
        "nt", F.lead("t").over(w_lead)
    )
    per_bucket = b.groupBy("event_type", "bucket").agg(F.sum("d").alias("bd"))
    w_b = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c0 = per_bucket.withColumn(
        "c0", F.coalesce(F.sum("bd").over(w_b), F.lit(0))
    ).select("event_type", "bucket", "bd", "c0")
    seg = rows.join(c0, ["event_type", "bucket"])
    bucket_cov = seg.groupBy("event_type", "bucket").agg(
        F.sum(
            F.when(
                (F.col("rs") + F.col("c0") > 0) & F.col("nt").isNotNull(),
                F.col("nt") - F.col("t"),
            ).otherwise(F.lit(0))
        ).alias("interior"),
        F.min("t").alias("t_first"),
        F.max("t").alias("t_last"),
        F.first("bd").alias("bd"),
        F.first("c0").alias("c0"),
    )
    cov = bucket_cov.select(
        "event_type",
        (
            F.col("interior")
            + F.when(
                F.col("c0") > 0, F.col("t_first") - F.col("bucket") * bucket
            ).otherwise(F.lit(0))
            + F.when(
                F.col("bd") + F.col("c0") > 0,
                (F.col("bucket") + 1) * bucket - F.col("t_last"),
            ).otherwise(F.lit(0))
        ).alias("cv"),
    )
    return cov.groupBy("event_type").agg(
        F.sum("cv").cast("long").alias("covered_sec")
    )


@register(
    "q122_attribution",
    tags=("events", "attribution", "join", "window"),
    oracle="""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS cts
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT event_id AS touch_id, user_id, ts AS tts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')),
j AS (
  SELECT c.conv_id, t.touch_id, t.touch_type, t.tts,
         count(*) OVER (PARTITION BY c.conv_id) AS n,
         row_number() OVER (PARTITION BY c.conv_id ORDER BY t.tts, t.touch_id) AS rn_asc,
         row_number() OVER (PARTITION BY c.conv_id ORDER BY t.tts DESC, t.touch_id DESC) AS rn_desc
  FROM conv c JOIN touch t
    ON t.user_id = c.user_id
   AND t.tts <= c.cts
   AND t.tts > c.cts - INTERVAL '1 hour')
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(1000000 // n) AS BIGINT) AS linear_credit_ppm,
       CAST(sum(CASE WHEN rn_asc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       CAST(sum(CASE WHEN rn_desc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last
FROM j
GROUP BY touch_type
""",
)
def q122_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TOUCH ATTRIBUTION — the marketing-analytics join every
    event warehouse runs: for each conversion (purchase), find the
    user's preceding view/click touches inside a 1-hour lookback and
    split credit three ways at once: LINEAR (each touch gets 1/n of
    the conversion, exact integer ppm — 1000000 DIV n, so engines
    can't diverge on fractional credit), FIRST-touch and LAST-touch
    (per-conversion rank endpoints, (ts, event_id) tiebreak).
    Aggregated per touch type: touch volume, summed linear credit,
    first/last counts.

    100 TB shape: the conversion-touch pairing is a per-user equi-join
    with a bounded time-range predicate — state per user is rate x
    lookback, never corpus-sized; the credit windows partition by
    conversion id (group size = touches per conversion, bounded by
    per-user event rate x 1 hour); the final rollup is a 2-row
    aggregate. No timestamps are emitted (rank/count/ppm integers
    only), so TIMESTAMP_NTZ comparison semantics match DuckDB naive
    timestamps exactly."""
    e = load(spark, sf_dir, "events")
    conv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    touch = e.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_type").alias("touch_type"),
    )
    j = conv.join(
        touch,
        (F.col("tu") == F.col("cu"))
        & (F.col("tts") <= F.col("cts"))
        & (F.col("tts") > F.col("cts") - F.expr("INTERVAL 1 HOUR")),
    )
    w_n = Window.partitionBy("conv_id")
    w_asc = Window.partitionBy("conv_id").orderBy(F.asc("tts"), F.asc("touch_id"))
    w_desc = Window.partitionBy("conv_id").orderBy(F.desc("tts"), F.desc("touch_id"))
    r = (
        j.withColumn("n", F.count(F.lit(1)).over(w_n))
        .withColumn("rn_asc", F.row_number().over(w_asc))
        .withColumn("rn_desc", F.row_number().over(w_desc))
    )
    return r.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum(F.expr("1000000 DIV n")).cast("long").alias("linear_credit_ppm"),
        F.sum(F.when(F.col("rn_asc") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_first"),
        F.sum(F.when(F.col("rn_desc") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_last"),
    )


@register(
    "q121_stream_full_outer",
    tags=("events", "streaming", "join", "watermark", "outer"),
    # q99's two-stream fixture plus BOTH negative spaces: un-clicked
    # impressions (left outer rows) AND orphan clicks from a user with
    # no impressions at all (right outer rows) — the full-outer
    # attribution ledger. Same flush-sentinel construction drives the
    # min-of-sources watermark so every outer verdict is decided
    # in-stream; sentinels are filtered from the output.
    oracle="""
WITH i AS (SELECT unnest(generate_series(0, 99)) AS n),
imp AS (SELECT n AS imp_id,
               TIMESTAMP '2024-01-01 00:00:00' + n * INTERVAL '1 minute' AS ts,
               CAST(n % 5 AS BIGINT) AS user_id
        FROM i),
o AS (SELECT unnest(generate_series(0, 9)) AS j),
clk AS (SELECT 1000 + n AS click_id,
               TIMESTAMP '2024-01-01 00:00:00'
               + (n + (n % 15)) * INTERVAL '1 minute' AS ts,
               CAST(n % 5 AS BIGINT) AS user_id
        FROM i
        UNION ALL
        SELECT 1500 + j,
               TIMESTAMP '2024-01-01 00:00:00' + (30 + 6 * j) * INTERVAL '1 minute',
               CAST(7 AS BIGINT)
        FROM o)
SELECT imp.imp_id, clk.click_id,
       COALESCE(imp.user_id, clk.user_id) AS user_id,
       CAST((epoch(clk.ts) - epoch(imp.ts)) / 60 AS BIGINT) AS delta_min
FROM imp FULL JOIN clk
  ON imp.user_id = clk.user_id
 AND clk.ts >= imp.ts
 AND clk.ts <= imp.ts + INTERVAL '10 minutes'
""",
)
def q121_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — q99's left-outer
    attribution ledger completed with the RIGHT outer space: clicks
    that never found an impression (here a user with no impressions at
    all — bot traffic, lost exposure logs) emit with NULL impression
    columns once the watermark passes their match horizon. Both outer
    directions are watermark-eviction products crossing microbatch
    boundaries, not end-of-input flushes: Structured Streaming emits a
    left-outer row when the watermark passes l.ts + horizon and a
    right-outer row when no future left row could match r.ts. The
    deterministic fixture makes the drained stream equal the batch
    FULL JOIN the oracle runs.

    Microbatch budget + state sizing (r14, VERDICT items 3/6 — same
    treatment as q99): two data microbatches (maxFilesPerTrigger=2;
    both outer directions still emit on batch 2's eviction under the
    batch-1 watermark, crossing a real batch boundary), no-data
    microbatches off for the stream's lifetime (restored in finally;
    only the filtered sentinels could ride a trailing no-data batch),
    and state partitions derived from the stream by the shared helper
    (resolves to 4). The join semantics under test are partition-
    count independent; the oracle gate pins the output."""
    import os
    import tempfile
    import uuid
    from pathlib import Path

    from ..streaming.analytics import interval_join

    base = Path(tempfile.mkdtemp(prefix="q121_stream_"))
    imp_dir, clk_dir = base / "imp", base / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    imps, clks = [], []
    for n in range(100):
        h, m = divmod(n, 60)
        imps.append(
            f'{{"imp_id": {n}, "ts": "2024-01-01 {h:02d}:{m:02d}:00", '
            f'"user_id": {n % 5}}}'
        )
        cm = n + (n % 15)
        ch, cmm = divmod(cm, 60)
        clks.append(
            f'{{"click_id": {1000 + n}, "ts": "2024-01-01 {ch:02d}:{cmm:02d}:00", '
            f'"user_id": {n % 5}}}'
        )
    for j in range(10):  # orphan clicks: user 7 has no impressions
        om = 30 + 6 * j
        oh, omm = divmod(om, 60)
        clks.append(
            f'{{"click_id": {1500 + j}, "ts": "2024-01-01 {oh:02d}:{omm:02d}:00", '
            f'"user_id": 7}}'
        )
    files = []
    for d, name, lines in ((imp_dir, "f1.jsonl", imps), (clk_dir, "f1.jsonl", clks)):
        p = d / name
        p.write_text("\n".join(lines) + "\n")
        files.append((p, 1_700_000_000))
    for k, minute in ((2, 600), (3, 1200)):
        h, m = divmod(minute, 60)
        pi = imp_dir / f"f{k}.jsonl"
        pi.write_text(
            f'{{"imp_id": {9000 + k}, "ts": "2024-01-01 {h:02d}:{m:02d}:00", '
            f'"user_id": {9000 + k}}}\n'
        )
        pc = clk_dir / f"f{k}.jsonl"
        pc.write_text(
            f'{{"click_id": {9900 + k}, "ts": "2024-01-01 {h:02d}:{m:02d}:00", '
            f'"user_id": {9500 + k}}}\n'
        )
        files += [(pi, 1_700_000_000 + 100 * k), (pc, 1_700_000_000 + 100 * k)]
    for p, ts in files:
        os.utime(p, (ts, ts))
    left = spark.readStream.schema("imp_id long, ts timestamp, user_id long").option(
        "maxFilesPerTrigger", 2
    ).json(str(imp_dir))
    right = spark.readStream.schema(
        "click_id long, ts timestamp, user_id long"
    ).option("maxFilesPerTrigger", 2).json(str(clk_dir))
    joined = interval_join(
        left, right, horizon="10 minutes", watermark="1 minute", how="fullOuter"
    ).select(
        F.col("imp_id"),
        F.col("click_id"),
        F.coalesce(F.col("l.user_id"), F.col("r.user_id")).alias("user_id"),
        ((F.col("r.ts").cast("long") - F.col("l.ts").cast("long")) / 60)
        .cast("long")
        .alias("delta_min"),
    )
    name = "q121_stream_" + uuid.uuid4().hex[:8]
    # r14 (VERDICT item 6): same derivation as q99 (shared helper,
    # env-overridable); resolves to 4 locally.
    from ..streaming.state import stream_state_partitions

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(spark, approx_keys=10, approx_rows_per_batch=110)),
    )
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)
        # the memory sink holds the materialized rows; the fixture dir
        # can go as soon as the availableNow run drains
        import shutil

        shutil.rmtree(base, ignore_errors=True)
    return spark.sql(
        f"SELECT imp_id, click_id, user_id, delta_min FROM {name} "
        f"WHERE (imp_id < 1000 OR imp_id IS NULL) "
        f"AND (click_id < 9000 OR click_id IS NULL)"
    )


@register(
    "q123_retention_triangle",
    tags=("events", "retention", "cohort", "agg"),
    oracle="""
WITH w AS (SELECT user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
           FROM events),
c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY user_id),
sz AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_n
       FROM c GROUP BY cohort_wk),
act AS (SELECT DISTINCT c.cohort_wk, w.wk - c.cohort_wk AS offset_wk,
                        w.user_id
        FROM w JOIN c USING (user_id)),
r AS (SELECT cohort_wk, offset_wk, CAST(count(*) AS BIGINT) AS active
      FROM act GROUP BY cohort_wk, offset_wk)
SELECT r.cohort_wk, r.offset_wk, r.active, sz.cohort_n,
       CAST((r.active * 1000) // sz.cohort_n AS BIGINT) AS retained_permille
FROM r JOIN sz USING (cohort_wk)
""",
)
def q123_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION TRIANGLE — the cohort-retention matrix every product
    warehouse computes: assign each user to the epoch-week of their
    FIRST event (the cohort), then for every (cohort week, week offset)
    count the distinct users still active and express it as integer
    permille of the cohort's size. Offset 0 is 1000 by construction;
    the triangle's decay profile per cohort is the headline product
    metric. Weeks are integer epoch-week numbers (epoch DIV 604800) —
    Spark's timestamp->long cast truncates and DuckDB's
    CAST(floor(epoch(ts)) AS BIGINT) floors, identical for positive
    epochs (README; the q119 off-by-one-second lesson).

    100 TB shape: one per-user min aggregate (map-side combinable, one
    shuffle on user_id), the activity relation reuses the same user_id
    partitioning for its join + distinct (cohort_wk, offset_wk,
    user_id) aggregate, and the final permille join is against the
    cohort-count relation whose size is the number of WEEKS in the
    corpus — constant for any fixed retention horizon. No windows, no
    timestamps emitted."""
    e = _events(spark, sf_dir)
    w = e.select(
        "user_id",
        F.expr("CAST(ts AS TIMESTAMP_LTZ)").cast("long").alias("sec"),
    ).select("user_id", F.expr("sec DIV 604800").alias("wk"))
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    sz = c.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_n")
    )
    act = (
        w.join(c, "user_id")
        .select("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"), "user_id")
        .distinct()
    )
    r = act.groupBy("cohort_wk", "offset_wk").agg(
        F.count(F.lit(1)).cast("long").alias("active")
    )
    return r.join(sz, "cohort_wk").select(
        "cohort_wk",
        "offset_wk",
        "active",
        "cohort_n",
        F.expr("(active * 1000) DIV cohort_n").cast("long").alias("retained_permille"),
    )
