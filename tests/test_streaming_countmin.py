"""Streaming count-min (applyInPandasWithState) pins: the grid after
the final microbatch is bit-identical to a one-shot batch fold (counter
updates are sums — fully mergeable), the digest/probe survive a query
restart (second run sees only the second half of the data yet reports
the whole stream), and the sketch never undercounts."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow.parquet as pq

from fluvio_demo_apps_rust_spark.streaming.sketches import (
    _CM_DEPTH,
    _CM_PROBE_BUCKETS,
    _CM_WIDTH,
    _cm_fold,
    cm_digest,
    countmin_stream,
)

from .conftest import SF_SMOKE


def _run(spark, src: Path, ckpt: Path, out: Path):
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(src))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    (
        countmin_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def test_streaming_countmin_matches_batch_fold_and_survives_restart(spark, tmp_path):
    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet")
    half = tbl.num_rows // 2
    src = tmp_path / "src"
    src.mkdir()
    tbl.slice(0, half).to_pandas().to_parquet(src / "part1.parquet")

    ckpt = tmp_path / "ckpt"
    out1 = tmp_path / "out1"
    _run(spark, src, ckpt, out1)

    tbl.slice(half).to_pandas().to_parquet(src / "part2.parquet")
    out2 = tmp_path / "out2"
    _run(spark, src, ckpt, out2)

    got = {r.event_type: r for r in spark.read.parquet(str(out2)).collect()}
    full = tbl.to_pandas()
    assert set(got) == set(full["event_type"].unique())
    for et, row in got.items():
        sub = full[full["event_type"] == et]
        # restart pin: totals cover BOTH halves though run 2 saw one
        assert row.n_events == len(sub)
        # parity pin: streaming state == one-shot batch fold, exactly
        grid = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype="<i8")
        _cm_fold(grid, sub["user_id"].to_numpy())
        assert row.sketch_digest == cm_digest(grid)
        est1 = min(int(grid[s, _CM_PROBE_BUCKETS[s]]) for s in range(_CM_DEPTH))
        assert row.est_user1 == est1
        # count-min never undercounts the probe's true frequency
        assert row.est_user1 >= int((sub["user_id"] == 1).sum())


# -- pure-Python property pins (no Spark) ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
    cut=st.integers(min_value=0, max_value=200),
)
def test_cm_fold_is_shard_invariant(ids, cut):
    """Mergeability contract: folding any sharding of the stream and
    summing the grids equals one whole-stream fold."""
    cut = min(cut, len(ids))
    whole = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype="<i8")
    _cm_fold(whole, np.array(ids, dtype=np.int64))
    a = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype="<i8")
    b = np.zeros((_CM_DEPTH, _CM_WIDTH), dtype="<i8")
    _cm_fold(a, np.array(ids[:cut], dtype=np.int64))
    _cm_fold(b, np.array(ids[cut:], dtype=np.int64))
    assert (a + b == whole).all()
    assert cm_digest(a + b) == cm_digest(whole)
    # row sums all equal the stream length (every row counts every item)
    assert (whole.sum(axis=1) == len(ids)).all()
