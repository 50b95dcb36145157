"""Streaming sessionization pins (r5 verdict #6): arbitrary keyed
state beyond mergeable sketches.

- Parity: closed-by-gap sessions equal the batch gaps-and-islands
  sessions (exact tuples — start/last/count/cents).
- Restart: a session spanning the two input files is merged correctly,
  so its state crossed the checkpoint.
- Eviction: with event-time timeouts armed, idle keys are flushed
  (their trailing sessions emitted) and removed — and no session is
  ever emitted twice (the removed key cannot re-fire).
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

from fluvio_demo_apps_rust_spark.streaming.sessions import GAP_US, sessionize_stream

from .conftest import SF_SMOKE


def _batch_sessions() -> pd.DataFrame:
    """Gaps-and-islands oracle over the full events table, in-process."""
    df = pq.read_table(f"{SF_SMOKE}/events.parquet").to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    ts_us = df["ts"].to_numpy("datetime64[us]").astype("int64")
    df = df.assign(ts_us=ts_us, cents=(df["value"] * 100 + 0.5).apply(int))
    out = []
    for uid, g in df.groupby("user_id"):
        t = g["ts_us"].to_numpy()
        new = [True] + [t[i] - t[i - 1] >= GAP_US for i in range(1, len(t))]
        sid = pd.Series(new, index=g.index).cumsum()
        for _, s in g.groupby(sid):
            out.append(
                (
                    int(uid),
                    int(s["ts_us"].min() // 1_000_000),
                    int(s["ts_us"].max() // 1_000_000),
                    len(s),
                    int(s["cents"].sum()),
                )
            )
    return pd.DataFrame(
        out, columns=["user_id", "session_start", "session_last", "n_events", "session_cents"]
    )


def _run(spark, src: Path, ckpt: Path, out: Path):
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(src))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    (
        sessionize_stream(stream, evict=True)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(180)
    )


def test_sessions_match_batch_restart_and_evict(spark, tmp_path):
    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet")
    half = tbl.num_rows // 2
    src = tmp_path / "src"
    src.mkdir()
    tbl.slice(0, half).to_pandas().to_parquet(src / "part1.parquet")

    ckpt = tmp_path / "ckpt"
    out = tmp_path / "out"
    _run(spark, src, ckpt, out)
    tbl.slice(half).to_pandas().to_parquet(src / "part2.parquet")
    _run(spark, src, ckpt, out)

    got = spark.read.parquet(str(out)).toPandas()
    got_tuples = [tuple(r) for r in got[
        ["user_id", "session_start", "session_last", "n_events", "session_cents"]
    ].itertuples(index=False)]

    batch = _batch_sessions()
    all_tuples = {tuple(r) for r in batch.itertuples(index=False)}
    trailing = {
        tuple(g.iloc[g["session_last"].argmax()])
        for _, g in batch.groupby("user_id")
    }
    closed = all_tuples - trailing

    # exactly-once: eviction removes the key, so nothing re-fires
    assert len(got_tuples) == len(set(got_tuples)), "a session was emitted twice"
    got_set = set(got_tuples)
    # soundness: everything emitted is a REAL batch session (exact tuple)
    assert got_set <= all_tuples, f"phantom sessions: {got_set - all_tuples}"
    # completeness: every gap-closed session was emitted
    assert closed <= got_set, f"missing closed sessions: {closed - got_set}"
    # eviction fired: at least one TRAILING session was flushed by the
    # event-time timeout (idle key removed) — only the user(s) active at
    # the very end of the stream may legitimately still hold state
    assert got_set & trailing, "no event-time-timeout eviction observed"


def test_session_state_merges_across_restart(spark, tmp_path):
    """A session whose events straddle the two runs must come out as
    ONE merged session — its open state crossed the checkpoint. (The
    parquet test data's gaps are mostly >= 5 min, so natural sessions
    are near-singletons; controlled timestamps pin the merge.)"""
    t0 = pd.Timestamp("2024-06-01 12:00:00")

    def mk(rows):
        return pd.DataFrame(
            {
                "event_id": pd.array([r[0] for r in rows], dtype="int64"),
                "ts": pd.Series(
                    [t0 + pd.Timedelta(seconds=r[1]) for r in rows]
                ).astype("datetime64[us]"),  # parquet NTZ micros, like the testdata
                "user_id": pd.array([r[2] for r in rows], dtype="int64"),
                "event_type": "click",
                "value": 1.0,
                "props": "{}",
            }
        )

    src = tmp_path / "src"
    src.mkdir()
    # run 1: user 1 opens a session with two events 60 s apart
    mk([(1, 0, 1), (2, 60, 1)]).to_parquet(src / "part1.parquet")
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"
    _run(spark, src, ckpt, out)
    # run 2: +60 s extends the SAME session (within gap — only works if
    # the open state survived the restart); +15 min gap-closes it
    mk([(3, 120, 1), (4, 1020, 1)]).to_parquet(src / "part2.parquet")
    _run(spark, src, ckpt, out)

    got = {
        (r.user_id, r.session_start, r.session_last, r.n_events, r.session_cents)
        for r in spark.read.parquet(str(out)).collect()
    }
    base = int(t0.timestamp())
    assert (1, base, base + 120, 3, 300) in got, got
