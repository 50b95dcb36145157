"""Streaming analytics: watermark late-data drop, streaming dedup,
sessionization, SQL sink — all driven through real Structured
Streaming queries with restarts (availableNow + shared checkpoint)."""

from __future__ import annotations

import json
from pathlib import Path

import pyspark.sql.functions as F

from fluvio_demo_apps_rust_spark.streaming.analytics import (
    read_event_stream,
    run_to_parquet,
    streaming_dedup,
    windowed_counts,
)


def _write(d: Path, name: str, events: list[dict]) -> None:
    d.mkdir(parents=True, exist_ok=True)
    (d / name).write_text("\n".join(json.dumps(e) for e in events) + "\n")


def _ev(eid: int, ts: str, etype: str = "click", uid: int = 1, value: float = 1.0) -> dict:
    return {"event_id": eid, "ts": ts, "user_id": uid, "event_type": etype, "value": value}


def test_windowed_counts_with_late_drop(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"

    # batch 1: events in hours 10 and 12 → watermark = 12:30-0:30 = 12:00,
    # so the hour-10 and hour-11 windows finalize and are emitted.
    _write(src, "b1.jsonl", [
        _ev(1, "2024-01-01 10:05:00"),
        _ev(2, "2024-01-01 10:20:00"),
        _ev(3, "2024-01-01 12:30:00"),
    ])
    run_to_parquet(windowed_counts(read_event_stream(spark, str(src))), str(out), str(ckpt))
    got = {
        (str(r.window_start), r.cnt)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert ("2024-01-01 10:00:00", 2) in got
    finalized_windows = {w for w, _ in got}
    assert "2024-01-01 12:00:00" not in finalized_windows  # still open

    # batch 2: one LATE event (hour 10, behind the 12:00 watermark → must
    # be dropped) and one fresh event advancing the watermark past 12:00.
    _write(src, "b2.jsonl", [
        _ev(4, "2024-01-01 10:40:00"),   # late → dropped
        _ev(5, "2024-01-01 14:00:00"),   # advances watermark to 13:30
    ])
    run_to_parquet(windowed_counts(read_event_stream(spark, str(src))), str(out), str(ckpt))
    rows = spark.read.parquet(str(out)).collect()
    by_window = {}
    for r in rows:
        by_window[str(r.window_start)] = by_window.get(str(r.window_start), 0) + r.cnt
    # hour-10 window was finalized at cnt=2; the late event did NOT reopen it
    assert by_window["2024-01-01 10:00:00"] == 2
    # hour-12 window now finalized with only the on-time event
    assert by_window["2024-01-01 12:00:00"] == 1


def test_streaming_dedup_across_batches(spark, tmp_path):
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write(src, "b1.jsonl", [
        _ev(1, "2024-01-01 10:00:00"),
        _ev(1, "2024-01-01 10:00:30"),   # same id, same batch → dropped
        _ev(2, "2024-01-01 10:01:00"),
    ])
    run_to_parquet(streaming_dedup(read_event_stream(spark, str(src))), str(out), str(ckpt))
    # duplicate arrives again in a LATER batch within the watermark → dropped
    _write(src, "b2.jsonl", [
        _ev(2, "2024-01-01 10:02:00"),   # dup of id 2 across batches
        _ev(3, "2024-01-01 10:03:00"),
    ])
    run_to_parquet(streaming_dedup(read_event_stream(spark, str(src))), str(out), str(ckpt))
    ids = sorted(r.event_id for r in spark.read.parquet(str(out)).collect())
    assert ids == [1, 2, 3]


def test_frontier_watermarked_restart_evicts_state(spark, tmp_path):
    """The bounded-state crawl frontier (q106_stream_frontier_watermarked)
    across a CHECKPOINT RESTART: run 1 seeds dedup state; run 2 (same
    checkpoint, new files) must (a) still dedup a re-crawl whose state
    entry survived the restart and is inside the horizon, and (b)
    RE-ADMIT a re-crawl whose entry the resumed run evicted on
    watermark advance — state persistence and state eviction pinned in
    one stream."""
    import pyspark.sql.functions as F2

    from fluvio_demo_apps_rust_spark.functions import web as W

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"

    def frontier():
        return (
            spark.readStream.schema("url_id long, url string, crawl_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .withWatermark("crawl_ts", "1 hour")
            .select(
                "url_id",
                "crawl_ts",
                W.canonicalize_url(F2.col("url")).alias("canonical_url"),
            )
            .dropDuplicatesWithinWatermark(["canonical_url"])
            .select("url_id", "canonical_url")
        )

    def jline(uid: int, url: str, ts: str) -> str:
        return f'{{"url_id": {uid}, "url": "{url}", "crawl_ts": "{ts}"}}'

    import os

    src.mkdir(parents=True)
    # RUN 1: two pages admitted at 10:00/10:05
    (src / "b0.jsonl").write_text(
        jline(1, "https://ex.com/a", "2024-01-01 10:00:00")
        + "\n"
        + jline(2, "https://ex.com/b", "2024-01-01 10:05:00")
        + "\n"
    )
    # every fixture file gets an mtime in the same pinned window: the
    # file source ignores files more than maxFileAge (7 days) older
    # than the newest file it has seen
    os.utime(src / "b0.jsonl", (1_700_000_000,) * 2)
    run_to_parquet(frontier(), str(out), str(ckpt))
    assert sorted(r.url_id for r in spark.read.parquet(str(out)).collect()) == [1, 2]

    # RUN 2, resumed from the checkpoint, three one-file batches:
    #  b1: /a re-crawled at 10:30 — state entry RESTORED from the
    #      checkpoint and inside the horizon → dropped; /c admitted at
    #      13:00 (advances the watermark to 12:00 for the next batch)
    #  b2: any row — at its commit the operator evicts entries expiring
    #      before 12:00 (both run-1 entries; eviction runs AFTER the
    #      batch's dedup lookup, so the probe comes one batch later)
    #  b3: /b re-crawled → RE-ADMITTED only if the resumed run evicted
    (src / "b1.jsonl").write_text(
        jline(11, "https://ex.com/a#re", "2024-01-01 10:30:00")
        + "\n"
        + jline(12, "https://ex.com/c", "2024-01-01 13:00:00")
        + "\n"
    )
    (src / "b2.jsonl").write_text(
        jline(13, "https://ex.com/d", "2024-01-01 13:10:00") + "\n"
    )
    (src / "b3.jsonl").write_text(
        jline(14, "https://ex.com:443/b", "2024-01-01 13:30:00") + "\n"
    )
    for i, name in enumerate(("b1.jsonl", "b2.jsonl", "b3.jsonl"), start=1):
        os.utime(src / name, (1_700_000_000 + i * 100,) * 2)
    run_to_parquet(frontier(), str(out), str(ckpt))
    rows = spark.read.parquet(str(out)).collect()
    ids = sorted(r.url_id for r in rows)
    # 11 (dup within horizon, state survived restart) absent;
    # 14 (/b re-crawl after eviction) present
    assert ids == [1, 2, 12, 13, 14]
    by_id = {r.url_id: r.canonical_url for r in rows}
    assert by_id[2] == by_id[14] == "https://ex.com/b"  # same URL admitted twice


def test_token_pack_restart_continues_offsets(spark, tmp_path):
    """Streaming sample packing across a CHECKPOINT RESTART: the
    per-shard running offset must resume from the state store, so a
    doc ingested after the restart lands exactly where the batch
    layout puts it — an offset reset to 0 (lost state) or a re-emit of
    run-1 rows (replayed source) would both break the assertion."""
    import json as _json

    from fluvio_demo_apps_rust_spark.streaming.packing import pack_stream

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir(parents=True)

    def write(name: str, rows: list[tuple], mtime: int) -> None:
        import os

        f = src / name
        f.write_text(
            "\n".join(
                _json.dumps({"shard": s, "doc_id": d, "n_tokens": n})
                for s, d, n in rows
            )
            + "\n"
        )
        os.utime(f, (mtime, mtime))

    def run():
        # update-mode sink via foreachBatch (parquet rejects update
        # mode; the operator emits each row exactly once, so append
        # writes are correct) — the test_streaming_sessions pattern
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out))

        (
            pack_stream(
                spark.readStream.schema("shard string, doc_id long, n_tokens long")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    write("b0.jsonl", [("a", 1, 300), ("a", 2, 250)], 1_700_000_000)
    run()
    got1 = {r.doc_id: r.start_offset for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {1: 0, 2: 300}

    # RUN 2 resumes from the checkpoint: doc 3 must start at 550
    # (state carried), not 0 (state lost)
    write("b1.jsonl", [("a", 3, 400)], 1_700_000_100)
    run()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3  # no re-emits of run-1 rows
    got2 = {r.doc_id: (r.start_offset, r.pack_id, r.crosses) for r in rows}
    assert got2[3] == (550, 1, False)


def test_stream_manifest_restart_continues_chain(spark, tmp_path):
    """The chained manifest digest must continue from the checkpointed
    state across a restart: refolding the full sequence in one process
    and folding it split across two runs must produce the SAME digest —
    a reset chain or a replayed row would both diverge."""
    import hashlib
    import json as _json
    import os

    from fluvio_demo_apps_rust_spark.streaming.packing import manifest_stream

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir(parents=True)

    def run():
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(out))

        (
            manifest_stream(
                spark.readStream.schema("shard string, doc_id long, content string")
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(180)
        )

    docs = ["first doc", "second doc", "third doc"]
    f0 = src / "b0.jsonl"
    f0.write_text(
        "\n".join(
            _json.dumps({"shard": "a", "doc_id": i + 1, "content": c})
            for i, c in enumerate(docs[:2])
        )
        + "\n"
    )
    os.utime(f0, (1_700_000_000,) * 2)
    run()

    f1 = src / "b1.jsonl"
    f1.write_text(
        _json.dumps({"shard": "a", "doc_id": 3, "content": docs[2]}) + "\n"
    )
    os.utime(f1, (1_700_000_100,) * 2)
    run()

    rows = spark.read.parquet(str(out)).collect()
    final = max(rows, key=lambda r: r.n_docs)
    dg = hashlib.md5(b"").hexdigest()
    for c in docs:
        dg = hashlib.md5((dg + hashlib.md5(c.encode()).hexdigest()).encode()).hexdigest()
    assert (final.n_docs, final.manifest_digest) == (3, dg)


def test_sql_sink_renders_pet_statements(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import (
        append_statements_batch,
        read_statements_log,
    )

    events = read_events_from_strings(spark, PET_EVENTS)
    log = tmp_path / "stmt_log"
    n = append_statements_batch(events, log)
    lines = read_statements_log(log)
    assert n == len(lines) == 9
    # global replay order (across range-partitioned part files)
    assert [line["sequence"] for line in lines] == list(range(9))
    assert lines[0]["stmt"].startswith("CREATE DATABASE")
    assert lines[2]["stmt"].startswith("INSERT INTO pet (name, owner, species, sex, birth)")
    assert lines[4]["stmt"].startswith("UPDATE pet SET")
    assert "is NULL" in lines[6]["stmt"] or lines[6]["stmt"].startswith("DELETE FROM pet")
    assert lines[8]["stmt"].startswith("UPDATE pet SET last_vaccine=")


def test_sql_sink_replay_is_idempotent(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import (
        append_statements_batch,
        read_statements_log,
    )

    events = read_events_from_strings(spark, PET_EVENTS)
    log = tmp_path / "stmt_log"
    assert append_statements_batch(events, log) == 9
    # at-least-once replay of the SAME batch appends nothing
    assert append_statements_batch(events, log) == 0
    assert len(read_statements_log(log)) == 9


def test_sql_sink_drops_null_sequences(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.fixtures import PET_EVENTS
    from fluvio_demo_apps_rust_spark.sources.event_source import read_events_from_strings
    from fluvio_demo_apps_rust_spark.streaming.sql_sink import (
        append_statements_batch,
        read_statements_log,
    )
    import pyspark.sql.functions as F

    events = read_events_from_strings(spark, PET_EVENTS).withColumn(
        "sequence",
        F.when(F.col("sequence") == 3, F.lit(None).cast("long")).otherwise(
            F.col("sequence")
        ),
    )
    log = tmp_path / "stmt_log"
    # null-sequence statements have no replay identity: dropped, and a
    # redelivered batch cannot duplicate them
    assert append_statements_batch(events, log) == 8
    assert append_statements_batch(events, log) == 0
    seqs = [r["sequence"] for r in read_statements_log(log)]
    assert seqs == [0, 1, 2, 4, 5, 6, 7, 8]


def test_sessionized_gap_split(spark, tmp_path):
    from fluvio_demo_apps_rust_spark.streaming.analytics import sessionized

    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"
    _write(src, "b1.jsonl", [
        _ev(1, "2024-01-01 10:00:00", uid=1, value=1.0),
        _ev(2, "2024-01-01 10:02:00", uid=1, value=2.0),   # same session (gap < 5m)
        _ev(3, "2024-01-01 10:30:00", uid=1, value=4.0),   # new session (gap > 5m)
        _ev(4, "2024-01-01 13:00:00", uid=2, value=8.0),   # watermark advancer
    ])
    run_to_parquet(
        sessionized(read_event_stream(spark, str(src))), str(out), str(ckpt)
    )
    rows = {
        (str(r.session_start), r.user_id): (r.n_events, r.session_value)
        for r in spark.read.parquet(str(out)).collect()
    }
    # user 1's two sessions finalized (watermark far past); counts/sums split
    assert rows[("2024-01-01 10:00:00", 1)] == (2, 3.0)
    assert rows[("2024-01-01 10:30:00", 1)] == (1, 4.0)


def test_late_data_dropped_across_microbatches(spark, tmp_path):
    """Stragglers for an already-finalized window must be dropped (and
    counted in numRowsDroppedByWatermark); stragglers for a still-open
    window must merge into its state. Mirrors q39_stream_late_data."""
    import json
    import os
    import uuid

    from fluvio_demo_apps_rust_spark.streaming.analytics import windowed_counts

    src = tmp_path / "src"
    src.mkdir()

    def dump(path, events):
        path.write_text("\n".join(json.dumps(e) for e in events) + "\n")

    dump(src / "a.jsonl", [
        _ev(i, f"2024-01-01 0{h}:{m:02d}:00")
        for i, (h, m) in enumerate(
            [(0, mm) for mm in range(40)]
            + [(1, mm) for mm in range(40)]
            + [(2, 10 + mm) for mm in range(10)]
        )
    ])
    dump(src / "b.jsonl", [
        _ev(100 + j, f"2024-01-01 02:{20 + j}:00") for j in range(10)
    ])
    dump(src / "c.jsonl", [
        _ev(1000, "2024-01-01 00:50:00"),   # dead window -> drop
        _ev(1001, "2024-01-01 01:50:00"),   # open window -> count
        _ev(1002, "2024-01-01 03:00:00"),   # fresh
    ])
    os.utime(src / "a.jsonl", (1_700_000_000,) * 2)
    os.utime(src / "b.jsonl", (1_700_000_100,) * 2)
    os.utime(src / "c.jsonl", (1_700_000_200,) * 2)
    name = "late_" + uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        windowed_counts(stream, "1 hour", "30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1, "the dead-window straggler must be watermark-dropped"
    rows = {
        str(r.window_start): r.cnt
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # hour-0 finalized WITHOUT the straggler; hour-1 WITH its straggler
    assert rows == {"2024-01-01 00:00:00": 40, "2024-01-01 01:00:00": 41}


def test_interval_join_matches_within_horizon_only(spark, tmp_path):
    import uuid

    from fluvio_demo_apps_rust_spark.streaming.analytics import interval_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    (imp_dir / "i.jsonl").write_text(
        '{"imp_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7}\n'
        '{"imp_id": 2, "ts": "2024-01-01 00:30:00", "user_id": 7}\n'
    )
    (clk_dir / "c.jsonl").write_text(
        # 5 min after imp 1 -> match; 20 min after -> outside horizon;
        # wrong user -> no match even in-horizon
        '{"click_id": 10, "ts": "2024-01-01 00:05:00", "user_id": 7}\n'
        '{"click_id": 11, "ts": "2024-01-01 00:20:00", "user_id": 7}\n'
        '{"click_id": 12, "ts": "2024-01-01 00:06:00", "user_id": 8}\n'
    )
    left = spark.readStream.schema("imp_id long, ts timestamp, user_id long").json(
        str(imp_dir)
    )
    right = spark.readStream.schema("click_id long, ts timestamp, user_id long").json(
        str(clk_dir)
    )
    name = "t_ij_" + uuid.uuid4().hex[:8]
    q = (
        interval_join(left, right, horizon="10 minutes")
        .select("imp_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r.imp_id, r.click_id) for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got == {(1, 10)}


def test_interval_join_full_outer_emits_both_negative_spaces(spark, tmp_path):
    """fullOuter (the q121 mode): an un-clicked impression emits with
    NULL click columns AND an orphan click from a user with no
    impressions emits with NULL impression columns — both produced by
    watermark EVICTION (sentinel files advance the min-of-sources
    watermark past the match horizons), not by end-of-input flush."""
    import os
    import uuid

    from fluvio_demo_apps_rust_spark.streaming.analytics import interval_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    (imp_dir / "i.jsonl").write_text(
        '{"imp_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 7}\n'
        '{"imp_id": 2, "ts": "2024-01-01 00:30:00", "user_id": 9}\n'  # never clicked
    )
    (clk_dir / "c.jsonl").write_text(
        '{"click_id": 10, "ts": "2024-01-01 00:05:00", "user_id": 7}\n'
        '{"click_id": 11, "ts": "2024-01-01 00:06:00", "user_id": 8}\n'  # orphan user
    )
    # flush sentinels: both sources must advance for the min watermark
    (imp_dir / "z.jsonl").write_text(
        '{"imp_id": 900, "ts": "2024-01-01 06:00:00", "user_id": 900}\n'
    )
    (clk_dir / "z.jsonl").write_text(
        '{"click_id": 990, "ts": "2024-01-01 06:00:00", "user_id": 990}\n'
    )
    for d in (imp_dir, clk_dir):
        os.utime(d / ("i.jsonl" if d is imp_dir else "c.jsonl"), (1_700_000_000,) * 2)
        os.utime(d / "z.jsonl", (1_700_000_100,) * 2)
    left = spark.readStream.schema("imp_id long, ts timestamp, user_id long").option(
        "maxFilesPerTrigger", 1
    ).json(str(imp_dir))
    right = spark.readStream.schema("click_id long, ts timestamp, user_id long").option(
        "maxFilesPerTrigger", 1
    ).json(str(clk_dir))
    name = "t_ijfo_" + uuid.uuid4().hex[:8]
    q = (
        interval_join(left, right, horizon="10 minutes", watermark="1 minute",
                      how="fullOuter")
        .select("imp_id", "click_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.imp_id, r.click_id)
        for r in spark.sql(
            f"SELECT * FROM {name} WHERE (imp_id IS NULL OR imp_id < 900) "
            f"AND (click_id IS NULL OR click_id < 900)"
        ).collect()
    }
    assert got == {(1, 10), (2, None), (None, 11)}


def _chained_user_stats(events):
    """The q100 topology: two chained stateful aggregations (window x
    user counts, then per-window user-distribution stats) in ONE
    streaming query — SPARK-40925 multiple stateful operators."""
    lvl1 = (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents"),
        )
    )
    return (
        lvl1.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cnt").alias("total_events"),
            F.max("cnt").alias("max_user_events"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "n_users",
            "total_events",
            "max_user_events",
        )
    )


def test_chained_agg_restart_checkpoint(spark, tmp_path):
    """Chained stateful aggs survive a checkpoint restart: both levels'
    state recovers, finalized windows are emitted exactly once, and a
    late event can neither reopen a finalized window nor leak into
    level-2 state."""
    src, out, ckpt = tmp_path / "src", tmp_path / "out", tmp_path / "ckpt"

    # batch 1: hour-10 activity from two users + a 12:30 event that
    # pushes the watermark to 12:00, finalizing hour 10 at BOTH levels
    _write(src, "b1.jsonl", [
        _ev(1, "2024-01-01 10:05:00", uid=1),
        _ev(2, "2024-01-01 10:20:00", uid=1),
        _ev(3, "2024-01-01 10:25:00", uid=2),
        _ev(4, "2024-01-01 12:30:00", uid=3),
    ])
    run_to_parquet(_chained_user_stats(read_event_stream(spark, str(src))), str(out), str(ckpt))
    rows = {str(r.window_start): r for r in spark.read.parquet(str(out)).collect()}
    assert rows["2024-01-01 10:00:00"].n_users == 2
    assert rows["2024-01-01 10:00:00"].total_events == 3
    assert rows["2024-01-01 10:00:00"].max_user_events == 2
    assert "2024-01-01 12:00:00" not in rows  # still open at level 1

    # RESTART (same checkpoint): a late hour-10 event (behind the 12:00
    # watermark -> dropped at level 1, so level 2 must not re-emit) and
    # a 14:00 event advancing the watermark past 13:00, finalizing the
    # hour-12 window through both levels.
    _write(src, "b2.jsonl", [
        _ev(5, "2024-01-01 10:40:00", uid=9),   # late -> dropped
        _ev(6, "2024-01-01 14:00:00", uid=4),
    ])
    run_to_parquet(_chained_user_stats(read_event_stream(spark, str(src))), str(out), str(ckpt))
    all_rows = spark.read.parquet(str(out)).collect()
    per_window = {}
    for r in all_rows:
        per_window.setdefault(str(r.window_start), []).append(r)
    # exactly-once: the finalized hour-10 row was not re-emitted/changed
    assert len(per_window["2024-01-01 10:00:00"]) == 1
    assert per_window["2024-01-01 10:00:00"][0].n_users == 2
    # hour-12 finalized across the restart with only its on-time event
    assert len(per_window["2024-01-01 12:00:00"]) == 1
    assert per_window["2024-01-01 12:00:00"][0].n_users == 1
    assert per_window["2024-01-01 12:00:00"][0].total_events == 1
