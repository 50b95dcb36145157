#!/usr/bin/env python
"""Fresh-seed apply soak (per-round standing discipline): run the
K3/K4 apply property (distributed kernel vs naive in-memory replay,
tests/test_apply_property.py strategies) for 220 random hypothesis
examples under a seed drawn fresh at invocation, so every round
explores a different region of the event-stream space than the
committed 12-example suite run.

Usage: python tools/apply_soak.py [seed] >> docs/bench_evidence/rN_apply_soak.log
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hypothesis import HealthCheck, given, seed as hseed, settings

from fluvio_demo_apps_rust_spark.operators.apply import apply_changes
from fluvio_demo_apps_rust_spark.session import get_spark
from fluvio_demo_apps_rust_spark.sources.event_source import (
    read_events_from_strings,
)
from tests.test_apply_property import event_stream


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else random.randrange(2**32)
    print(f"seed: {seed}", flush=True)
    spark = get_spark("apply_soak")
    spark.sparkContext.setLogLevel("ERROR")

    @settings(
        max_examples=220,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @hseed(seed)
    @given(event_stream())
    def soak(data):
        events_json, expected = data
        events = read_events_from_strings(spark, events_json)
        state = apply_changes(spark, events)
        got = sorted(
            ((r.k, r.v) for r in state.table("propdb", "t").collect()),
            key=lambda t: (t[0] is None, t[0], t[1] is None, t[1]),
        )
        state.release()
        assert got == expected

    soak()
    print("SOAK OK: 220 random examples green", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
