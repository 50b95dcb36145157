"""Streaming HLL (applyInPandasWithState) parity pins: the running
estimate after the final microbatch equals the batch q89 estimate over
the same rows (the register state is exactly integer-deterministic;
the linear-counting branch gets ±1 for the libm-vs-JVM ln), and the
256-byte register state survives a query restart (second run sees only
the second half of the data yet reports totals for all of it)."""

from __future__ import annotations

from pathlib import Path

import pandas as pd
import pyarrow.parquet as pq

from fluvio_demo_apps_rust_spark.streaming.sketches import hll_distinct_stream

from .conftest import SF_SMOKE


def _run(spark, src: Path, ckpt: Path, out: Path):
    schema = spark.read.parquet(f"{SF_SMOKE}/events.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(src))

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    (
        hll_distinct_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )


def test_streaming_hll_matches_batch_and_survives_restart(spark, tmp_path):
    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet")
    half = tbl.num_rows // 2
    src = tmp_path / "src"
    src.mkdir()
    tbl.slice(0, half).to_pandas().to_parquet(src / "part1.parquet")

    ckpt = tmp_path / "ckpt"
    out1 = tmp_path / "out1"
    _run(spark, src, ckpt, out1)

    # second half arrives; restart from the checkpoint — only the new
    # file is processed, prior state must come from the state store
    tbl.slice(half).to_pandas().to_parquet(src / "part2.parquet")
    out2 = tmp_path / "out2"
    _run(spark, src, ckpt, out2)

    got = {
        r.event_type: r
        for r in spark.read.parquet(str(out2)).collect()
    }
    full = tbl.to_pandas()
    per_type = full.groupby("event_type")["user_id"]
    from fluvio_demo_apps_rust_spark.plans import REGISTRY

    batch = {
        r.event_type: r
        for r in REGISTRY["q89_hll_distinct"].fn(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(batch)
    for et, row in got.items():
        # restart pin: totals cover BOTH halves though run 2 saw one
        assert row.n_events == int((full["event_type"] == et).sum())
        # parity pin: streaming estimate == batch q89 estimate (±1 for
        # the single ln in the linear-counting branch)
        assert abs(row.hll_estimate - batch[et].hll_estimate) <= 1
        # and it actually estimates the true cardinality sanely
        exact = per_type.get_group(et).nunique()
        assert abs(row.hll_estimate - exact) <= 2 + 0.2 * exact


# -- pure-Python property pins (no Spark) ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from fluvio_demo_apps_rust_spark.streaming.sketches import (
    _M,
    _fold,
    estimate_from_regs,
)
import numpy as np


@settings(max_examples=50, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), max_size=200),
    cut=st.integers(min_value=0, max_value=200),
)
def test_hll_fold_is_merge_invariant(ids, cut):
    """The mergeability contract the streaming operator relies on:
    folding a stream in any sharding and merging by element-wise max
    yields the registers (hence the estimate) of one whole-stream
    fold. Duplicated ids are absorbed (max is idempotent)."""
    cut = min(cut, len(ids))
    whole = bytearray(_M)
    _fold(whole, np.array(ids + ids, dtype=np.int64))  # dup absorption
    a, b = bytearray(_M), bytearray(_M)
    _fold(a, np.array(ids[:cut], dtype=np.int64))
    _fold(b, np.array(ids[cut:], dtype=np.int64))
    merged = bytes(max(x, y) for x, y in zip(a, b))
    assert merged == bytes(whole)
    assert estimate_from_regs(merged) == estimate_from_regs(bytes(whole))


def test_hll_empty_stream_estimates_zero():
    regs = bytes(_M)
    # all registers empty -> raw estimate tiny -> LC branch with v=m:
    # 256 * ln(256/256) = 0
    assert estimate_from_regs(regs) == 0
