"""Pin the streaming-throughput harness semantics (tools/bench_stream):
every variant — including the paced one, whose correctness depends on
the topic fixture being sequence-monotone in file mtime (the F4
watermark drops out-of-order files, CLAUDE.md r11 rule) — must apply
the full orders row count. A regression in the fixture ordering, the
file-source admission, or the foreachBatch apply path shows up as a
short replica table here, not as a silently-low throughput number."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF_SMOKE = "/root/testdata/sf0.001"


def test_all_variants_apply_every_event(spark):
    from bench_stream import measure

    result = measure(spark, SF_SMOKE)
    n_orders = result["events"] - 1  # minus the DDL event
    assert n_orders > 0
    assert set(result["variants"]) == {
        "python_codec",
        "jvm_codec",
        "paced_8_files",
    }
    for name, v in result["variants"].items():
        assert v["applied_rows"] == n_orders, name
        assert v["events_per_sec"] > 0, name
